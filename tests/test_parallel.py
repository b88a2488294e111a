"""Parallelism tests: 1-D data-parallel and 2-D data x model meshes
(virtual 8-device CPU mesh)."""

import jax
import numpy as np
import pytest

from cape_tpu.parallel.mesh import DATA_AXIS, DataParallel, make_mesh
from cape_tpu.parallel.mesh2d import MODEL_AXIS, MeshParallel, make_mesh_2d


def test_make_mesh_sizes():
    m_all = make_mesh()
    assert m_all.devices.size == len(jax.devices())
    m2 = make_mesh(2)
    assert m2.devices.size == 2
    assert m2.axis_names == (DATA_AXIS,)
    # over-requesting must error, not silently run on fewer devices
    with pytest.raises(ValueError, match="only"):
        make_mesh(len(jax.devices()) + 1)


def test_shard_batch_splits_leading_axis():
    dp = DataParallel(8)
    batch = {"a": np.arange(16 * 3, dtype=np.float32).reshape(16, 3)}
    sharded = dp.shard_batch(batch)
    arr = sharded["a"]
    assert arr.shape == (16, 3)
    # 8 shards of 2 rows each
    assert len(arr.addressable_shards) == 8
    assert arr.addressable_shards[0].data.shape == (2, 3)
    np.testing.assert_array_equal(np.asarray(arr), batch["a"])


def test_replicate_places_on_all_devices():
    dp = DataParallel(4)
    x = dp.replicate(np.ones((3, 3), np.float32))
    assert len(x.addressable_shards) == 4
    for s in x.addressable_shards:
        assert s.data.shape == (3, 3)


def test_pad_batch_size():
    dp = DataParallel(8)
    assert dp.pad_batch_size(16) == 16
    assert dp.pad_batch_size(17) == 24
    assert dp.pad_batch_size(1) == 8


def test_mesh2d_shapes_and_rules():
    m = make_mesh_2d(4, 2)
    assert m.devices.shape == (4, 2)
    assert m.axis_names == (DATA_AXIS, MODEL_AXIS)
    mp = MeshParallel(2, 4)
    # conv weight [K, fin, fout]: fout divisible -> column parallel
    assert mp._leaf_spec(np.zeros((2, 3, 8))) == jax.sharding.PartitionSpec(
        None, None, MODEL_AXIS
    )
    # fout not divisible, fin divisible -> row parallel
    assert mp._leaf_spec(np.zeros((2, 8, 3))) == jax.sharding.PartitionSpec(
        None, MODEL_AXIS, None
    )
    # nothing divisible -> replicated
    assert mp._leaf_spec(np.zeros((2, 3, 3))) == jax.sharding.PartitionSpec()
    assert mp._leaf_spec(np.zeros(())) == jax.sharding.PartitionSpec()
    # dense [in, out] and bias [out]
    assert mp._leaf_spec(np.zeros((6, 4))) == jax.sharding.PartitionSpec(None, MODEL_AXIS)
    assert mp._leaf_spec(np.zeros((4, 3))) == jax.sharding.PartitionSpec(MODEL_AXIS, None)
    assert mp._leaf_spec(np.zeros((8,))) == jax.sharding.PartitionSpec(MODEL_AXIS)


@pytest.mark.slow
def test_dp_tp_mesh_equivalence(tiny_train_setup):
    """One full GAN train step on 4x2 and 2x4 (data x model) meshes must
    match the single-device result: GSPMD partitioning is semantics-
    preserving, so any rule choice may only change performance."""
    from cape_tpu.models.cape import CAPE
    from cape_tpu.train.optim import build_optimizer, create_train_state
    from cape_tpu.train.step import build_train_step

    cfg, ctx, batch = tiny_train_setup
    model = CAPE(cfg)
    params_host = jax.device_get(model.init_params(jax.random.PRNGKey(0), ctx))
    tx, _, _ = build_optimizer(cfg, steps_per_epoch=10)

    def one_step(mp):
        params = jax.tree_util.tree_map(np.array, params_host)
        state = create_train_state(params, tx)
        if mp is None:
            step = jax.jit(build_train_step(model, cfg, tx))
            new_state, metrics = step(state, ctx, batch, jax.random.PRNGKey(3))
        else:
            step = mp.compile_train_step(build_train_step(model, cfg, tx), state)
            new_state, metrics = step(
                mp.shard_state(state), mp.replicate(ctx),
                mp.shard_batch(batch), jax.random.PRNGKey(3),
            )
        return jax.device_get(new_state.params), jax.device_get(metrics)

    p_ref, m_ref = one_step(None)
    for dp, tp in ((4, 2), (2, 4)):
        p, m = one_step(MeshParallel(dp, tp))
        for k in m_ref:
            np.testing.assert_allclose(
                float(m[k]), float(m_ref[k]), rtol=1e-4, atol=1e-5,
                err_msg=f"{dp}x{tp} {k}",
            )
        for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(p)[0],
            jax.tree_util.tree_flatten_with_path(p_ref)[0],
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
                err_msg=f"{dp}x{tp} {jax.tree_util.keystr(pa)}",
            )


@pytest.fixture(scope="module")
def tiny_train_setup(small_mesh):
    from cape_tpu.core.config import CAPEConfig
    from cape_tpu.data.loader import BatchStream, make_gan_batch
    from cape_tpu.data.synthetic import synthetic_bodydata
    from cape_tpu.meshops.pyramid import build_pyramid
    from cape_tpu.meshops.topology import vertices_per_edge
    from cape_tpu.ops.sparse import build_graph_context

    verts, faces = small_mesh
    nv = len(verts)
    cfg = CAPEConfig(
        name="tp_test", nf=4, nz=8, nz_cond=8, nz_cond2=4,
        use_res_block=False, use_res_block_dec=True, affine=True,
        reduce_dim=8, batch_size=8, lambda_edge=1.0, data_parallel=1,
    )
    pyr = build_pyramid(verts, faces, cfg.ds_factors)
    pyr_d = build_pyramid(verts, faces, [2, 2, 2, 2])
    ctx = build_graph_context(pyr, pyr_d, vertices_per_edge(faces, nv), verts)
    data = synthetic_bodydata(n_train=48, n_test=8, num_verts=nv, seed=0, n_val=8)
    sg = BatchStream(len(data.disp_train), cfg.batch_size, 0)
    sd = BatchStream(len(data.disp_train), cfg.batch_size, 1)
    batch = {k: np.asarray(v) for k, v in make_gan_batch(data, sg, sd).items()}
    return cfg, ctx, batch


@pytest.mark.slow
def test_trainer_fit_on_8_device_mesh_with_resume(tmp_path):
    """Full Trainer integration on the virtual 8-device mesh: fit via the
    device-resident step, checkpoints, and exact resume-equivalence —
    train 2 epochs in one go vs 1 epoch + resume + 1 epoch must produce
    identical params (streams fast-forward, per-step rng is step-keyed)."""
    from cape_tpu.core.config import CAPEConfig
    from cape_tpu.data.synthetic import synthetic_bodydata
    from cape_tpu.meshops.pyramid import build_pyramid
    from cape_tpu.meshops.topology import vertices_per_edge
    from cape_tpu.meshops.toy import icosphere
    from cape_tpu.models.cape import CAPE
    from cape_tpu.ops.sparse import build_graph_context
    from cape_tpu.train.loop import Trainer

    verts, faces = icosphere(3)
    nv = len(verts)
    base = CAPEConfig(
        name="dp8", nf=4, nz=8, nz_cond=8, nz_cond2=4,
        use_res_block=False, use_res_block_dec=True, affine=True,
        reduce_dim=8, batch_size=8, num_epochs=2, data_parallel=8,
    )
    pyr = build_pyramid(verts, faces, base.ds_factors)
    pyr_d = build_pyramid(verts, faces, [2, 2, 2, 2])
    ctx = build_graph_context(pyr, pyr_d, vertices_per_edge(faces, nv), verts)
    data = synthetic_bodydata(n_train=40, n_test=8, num_verts=nv, seed=0, n_val=8)
    model = CAPE(base)

    # run A: 2 epochs in one go
    ta = Trainer(base, model, ctx, data, workdir=str(tmp_path / "a"))
    val_a, _ = ta.fit()
    assert ta.dp.num_devices == 8
    assert val_a[-1] < val_a[0], f"no improvement on 8-dev mesh: {val_a}"
    params_a = jax.device_get(ta.state.params)

    # run B: 1 epoch, then resume for 1 more
    cfg1 = base.replace(num_epochs=1)
    tb1 = Trainer(cfg1, model, ctx, data, workdir=str(tmp_path / "b"))
    tb1.fit()
    cfg2 = cfg1.replace(restart=False)
    tb2 = Trainer(cfg2, model, ctx, data, workdir=str(tmp_path / "b"))
    tb2.fit()
    assert int(jax.device_get(tb2.state.step)) == ta.num_steps
    params_b = jax.device_get(tb2.state.params)

    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(params_a)[0],
        jax.tree_util.tree_flatten_with_path(params_b)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
            err_msg=jax.tree_util.keystr(pa),
        )


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["step", "trainer"])
def test_multihost_two_process(mode):
    """Multi-host seam: two OS processes x 4 virtual CPU devices run the
    parallel.multihost selftest — one global train step ("step") or a
    short 2-epoch Trainer.fit through the production scanned-dispatch
    path ("trainer"). Every process feeds only its local batch rows; the
    psum'd results must agree across ranks (same global reduction on
    both controllers)."""
    import json
    import os
    import re
    import socket
    import subprocess
    import sys

    with socket.socket() as s:                      # free TCP port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "cape_tpu.parallel.multihost",
             str(rank), "2", str(port), mode],
            env=env, cwd=repo, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for rank in range(2)
    ]
    try:
        outs = [p.communicate(timeout=600) for p in procs]
    finally:
        for p in procs:                 # don't leak ranks on timeout/assert
            if p.poll() is None:
                p.kill()
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"rank failed:\n{out}\n{err[-2000:]}"

    recs = {}
    for out, _ in outs:
        m = re.search(r"SELFTEST (\{.*\})", out)
        assert m, out
        rec = json.loads(m.group(1))
        recs[rec.pop("rank")] = rec
    assert set(recs) == {0, 1}
    assert recs[0] == recs[1], recs
    if mode == "trainer":
        assert len(recs[0]["val_recon"]) == 2       # one per epoch
        # 3 steps/epoch (48 train rows / global batch 16): phase 1 trains
        # 2 epochs to step 6, phase 2 resumes from the lead-broadcast
        # checkpoint and adds 1 epoch -> step 9
        assert recs[0]["resume_end_step"] == 9, recs[0]


@pytest.mark.slow
def test_trainer_fit_on_2d_mesh(tmp_path):
    """Trainer drives a 4x2 (data x model) MeshParallel end-to-end: fit
    with tensor-parallel param shardings, per-epoch eval, checkpointing,
    and resume. Must match the same schedule under plain DataParallel
    (GSPMD partitioning is semantics-preserving)."""
    from cape_tpu.core.config import CAPEConfig
    from cape_tpu.data.synthetic import synthetic_bodydata
    from cape_tpu.meshops.pyramid import build_pyramid
    from cape_tpu.meshops.topology import vertices_per_edge
    from cape_tpu.meshops.toy import icosphere
    from cape_tpu.models.cape import CAPE
    from cape_tpu.ops.sparse import build_graph_context
    from cape_tpu.train.loop import Trainer

    verts, faces = icosphere(3)
    nv = len(verts)
    base = CAPEConfig(
        name="tp_trainer", nf=4, nz=8, nz_cond=8, nz_cond2=4,
        use_res_block=False, use_res_block_dec=True, affine=True,
        reduce_dim=8, batch_size=8, num_epochs=2, steps_per_dispatch=3,
    )
    pyr = build_pyramid(verts, faces, base.ds_factors)
    pyr_d = build_pyramid(verts, faces, [2, 2, 2, 2])
    ctx = build_graph_context(pyr, pyr_d, vertices_per_edge(faces, nv), verts)
    data = synthetic_bodydata(n_train=40, n_test=8, num_verts=nv, seed=0, n_val=8)
    model = CAPE(base)

    mp = MeshParallel(4, 2)
    t_tp = Trainer(base, model, ctx, data, workdir=str(tmp_path / "tp"), dp=mp)
    val_tp, _ = t_tp.fit()
    assert val_tp[-1] < val_tp[0], f"no improvement on 2-D mesh: {val_tp}"
    # device_get of the tensor-parallel-sharded state must reassemble the
    # full host tree (checkpointing relies on this)
    params_tp = jax.device_get(t_tp.state.params)

    t_dp = Trainer(base, model, ctx, data, workdir=str(tmp_path / "dp"),
                   dp=DataParallel(8))
    val_dp, _ = t_dp.fit()
    params_dp = jax.device_get(t_dp.state.params)

    np.testing.assert_allclose(val_tp, val_dp, rtol=1e-4, atol=1e-5)
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(params_tp)[0],
        jax.tree_util.tree_flatten_with_path(params_dp)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(pa),
        )

    # resume continues on the 2-D mesh from the checkpoint
    cfg2 = base.replace(restart=False, num_epochs=1)
    t_tp2 = Trainer(cfg2, model, ctx, data, workdir=str(tmp_path / "tp"),
                    dp=MeshParallel(4, 2))
    t_tp2.fit()
    assert int(jax.device_get(t_tp2.state.step)) == t_tp.num_steps + t_tp2.num_steps
