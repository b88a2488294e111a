"""Data-parallel module tests (virtual 8-device CPU mesh)."""

import jax
import numpy as np
import pytest

from cape_tpu.parallel.mesh import DATA_AXIS, DataParallel, make_mesh


def test_make_mesh_sizes():
    m_all = make_mesh()
    assert m_all.devices.size == len(jax.devices())
    m2 = make_mesh(2)
    assert m2.devices.size == 2
    assert m2.axis_names == (DATA_AXIS,)


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
