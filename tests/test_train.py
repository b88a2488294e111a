"""Training-stack tests: step mechanics, convergence on synthetic data,
data-parallel equivalence, checkpoint roundtrip, schedules (SURVEY §4
implications 4 and 5)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cape_tpu.core.config import CAPEConfig
from cape_tpu.data.loader import BatchStream, make_gan_batch
from cape_tpu.data.synthetic import synthetic_bodydata
from cape_tpu.meshops.pyramid import build_pyramid
from cape_tpu.meshops.topology import vertices_per_edge
from cape_tpu.models.cape import CAPE
from cape_tpu.ops.sparse import build_graph_context
from cape_tpu.parallel.mesh import DataParallel
from cape_tpu.train import checkpoint as ckpt
from cape_tpu.train.loop import Trainer
from cape_tpu.train.optim import build_optimizer, create_train_state
from cape_tpu.train.schedules import cape_schedule
from cape_tpu.train.step import build_train_step


@pytest.fixture(scope="module")
def tiny(small_mesh):
    """Tiny end-to-end setup: icosphere pyramid + synthetic data."""
    verts, faces = small_mesh
    nv = len(verts)
    # 4 conv layers, not the production 8: Trainer mechanics (scan
    # dispatch, checkpoint/resume, DP equivalence, TB events) are
    # architecture-agnostic, and the fused G+D step's CPU jit compile is
    # the single biggest fast-tier cost (8-layer: 85s, 4-layer: 52s cold;
    # the 4-layer val curve also falls with a wider margin)
    cfg = CAPEConfig(
        name="tiny_test", num_conv_layers=4, nf=8, nz=8, nz_cond=8,
        nz_cond2=4, use_res_block=False, use_res_block_dec=True,
        affine=True, reduce_dim=4, batch_size=8, num_epochs=4,
        lambda_edge=1.0, lr=2e-3, optimizer="adam", data_parallel=1,
    )
    pyr = build_pyramid(verts, faces, cfg.ds_factors)
    pyr_d = build_pyramid(verts, faces, [2, 2, 2, 2])
    edges = vertices_per_edge(faces, nv)
    ctx = build_graph_context(pyr, pyr_d, edges, verts)
    data = synthetic_bodydata(
        n_train=96, n_test=16, num_verts=nv, seed=0, n_val=16
    )
    return cfg, ctx, data


@pytest.mark.slow
def test_train_step_updates_params(tiny):
    cfg, ctx, data = tiny
    model = CAPE(cfg)
    params = model.init_params(jax.random.PRNGKey(0), ctx)
    tx, _, _ = build_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(params, tx)
    step_fn = jax.jit(build_train_step(model, cfg, tx))

    sg, sd = BatchStream(96 - 16, cfg.batch_size, 0), BatchStream(96 - 16, cfg.batch_size, 1)
    batch = {k: jnp.asarray(v) for k, v in make_gan_batch(data, sg, sd).items()}
    new_state, metrics = step_fn(state, ctx, batch, jax.random.PRNGKey(2))

    assert int(new_state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    # generator, condition nets and discriminator all moved
    for group in ("generator", "cond_pose", "cond_clo", "discriminator"):
        before = jax.tree_util.tree_leaves(state.params[group])
        after = jax.tree_util.tree_leaves(new_state.params[group])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(after, before)
        ), f"{group} params did not change"


@pytest.mark.slow
def test_optim_condnet_flag_freezes_condition_nets(tiny):
    cfg, ctx, data = tiny
    cfg = cfg.replace(optim_condnet=False)
    model = CAPE(cfg)
    params = model.init_params(jax.random.PRNGKey(0), ctx)
    tx, _, _ = build_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(params, tx)
    step_fn = jax.jit(build_train_step(model, cfg, tx))
    sg, sd = BatchStream(80, cfg.batch_size, 0), BatchStream(80, cfg.batch_size, 1)
    batch = {k: jnp.asarray(v) for k, v in make_gan_batch(data, sg, sd).items()}
    new_state, _ = step_fn(state, ctx, batch, jax.random.PRNGKey(2))
    for group in ("cond_pose", "cond_clo"):
        before = jax.tree_util.tree_leaves(state.params[group])
        after = jax.tree_util.tree_leaves(new_state.params[group])
        for a, b in zip(after, before):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.fixture(scope="module")
def fitted(tiny, tmp_path_factory):
    """ONE shared end-to-end fit on the tiny setup. Every fast-tier
    Trainer-mechanics check (loss falls, checkpointing, resume counter,
    input immutability) reads from this instead of paying its own ~60s
    fit+compile — the single biggest cost in the fast tier on a 1-CPU box."""
    cfg, ctx, data = tiny
    before = {
        k: getattr(data, k).copy() for k in ("disp_train", "disp_val", "disp_test")
    }
    workdir = str(tmp_path_factory.mktemp("fitted"))
    trainer = Trainer(cfg, CAPE(cfg), ctx, data, workdir=workdir)
    val_losses, t_step = trainer.fit()
    return trainer, val_losses, t_step, before


def test_training_reduces_loss(fitted):
    trainer, val_losses, t_step, _ = fitted
    assert len(val_losses) >= 2
    assert val_losses[-1] < val_losses[0], f"no improvement: {val_losses}"
    assert t_step > 0
    # checkpoints written
    assert ckpt.latest_checkpoint(trainer.ckpt_dir) is not None


def test_fit_writes_tensorboard_events(fitted):
    """The run dir gains a real TensorBoard event file whose scalars agree
    with metrics.jsonl (reference lib/models.py:399-414, :917-922; writer
    is first-party, train/tb_events.py)."""
    import glob
    import json

    from cape_tpu.train.tb_events import read_events, tb_tag

    trainer, _, _, _ = fitted
    files = glob.glob(os.path.join(trainer.run_dir, "events.out.tfevents.*"))
    assert len(files) == 1
    events = read_events(files[0])
    assert events[0]["file_version"] == "brain.Event:2"

    with open(os.path.join(trainer.run_dir, "metrics.jsonl")) as fh:
        records = [json.loads(line) for line in fh]
    scalars = {(ev["step"], t): v for ev in events for t, v in ev["scalars"].items()}
    assert scalars, "no scalar events written"
    for rec in records:
        for k, v in rec.items():
            if k in ("step", "t") or not isinstance(v, float):
                continue
            assert scalars[(rec["step"], tb_tag(k))] == pytest.approx(v, rel=1e-6)
    # per-weight histograms ride the async-checkpoint host fetch
    histo_tags = {t for ev in events for t in ev["histograms"]}
    assert any(t.startswith("params/generator") for t in histo_tags)
    assert any(t.startswith("params/discriminator") for t in histo_tags)


def test_resume_continues_step_counter(tiny, fitted):
    cfg, ctx, data = tiny
    t1, _, _, _ = fitted
    cfg2 = cfg.replace(restart=False, num_epochs=1)
    t2 = Trainer(cfg2, CAPE(cfg2), ctx, data, workdir=t1.workdir)
    state = t2.init_or_restore(jax.random.PRNGKey(0))
    assert int(jax.device_get(state.step)) == t1.num_steps


@pytest.mark.slow
def test_dp_equivalence_1_vs_8(tiny):
    """Same batch, same rng: one device == eight virtual devices (SURVEY §4
    implication 5)."""
    cfg, ctx, data = tiny
    model = CAPE(cfg)
    params_host = jax.device_get(model.init_params(jax.random.PRNGKey(0), ctx))
    tx, _, _ = build_optimizer(cfg, steps_per_epoch=10)

    sg, sd = BatchStream(80, cfg.batch_size, 0), BatchStream(80, cfg.batch_size, 1)
    batch = make_gan_batch(data, sg, sd)

    results = []
    for ndev in (1, 8):
        dp = DataParallel(ndev)
        step_fn = dp.compile_train_step(build_train_step(model, cfg, tx))
        # fresh buffers per mesh: the jitted step donates its input state
        params = jax.tree_util.tree_map(np.array, params_host)
        state = dp.replicate(create_train_state(params, tx))
        b = dp.shard_batch(batch)
        new_state, metrics = step_fn(state, dp.replicate(ctx), b, jax.random.PRNGKey(3))
        results.append(
            (jax.device_get(new_state.params), jax.device_get(metrics))
        )
    p1, m1 = results[0]
    p8, m8 = results[1]
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m8[k]), rtol=1e-4, atol=1e-5)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat8 = jax.tree_util.tree_leaves(p8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_multi_step_chunking_matches_single_steps(tiny):
    """The scanned K-steps-per-dispatch path must consume the same batch
    and RNG streams as single-step dispatches: 6 steps run as chunks of
    [4, 2] produce the same params as 6 single steps."""
    from cape_tpu.train.step import build_multi_train_step, build_resident_train_step

    cfg, ctx, data = tiny
    model = CAPE(cfg)
    params_host = jax.device_get(model.init_params(jax.random.PRNGKey(0), ctx))
    tx, _, _ = build_optimizer(cfg, steps_per_epoch=10)
    rng = jax.random.PRNGKey(11)
    dev_data = {
        "disp": jnp.asarray(data.disp_train),
        "pose": jnp.asarray(data.pose_train),
        "clo": jnp.asarray(data.clo_train),
    }

    def fresh_streams():
        return (
            BatchStream(len(data.disp_train), cfg.batch_size, 0),
            BatchStream(len(data.disp_train), cfg.batch_size, 1),
        )

    # reference: 6 single-step dispatches, rng folded by global step
    single = jax.jit(build_resident_train_step(model, cfg, tx))
    params = jax.tree_util.tree_map(np.array, params_host)
    state = create_train_state(params, tx)
    sg, sd = fresh_streams()
    for step in range(6):
        ig = jnp.asarray(sg.next_indices().astype(np.int32))
        idd = jnp.asarray(sd.next_indices().astype(np.int32))
        state, _ = single(state, ctx, dev_data, ig, idd, jax.random.fold_in(rng, step))
    ref_params = jax.device_get(state.params)

    # chunked: the same 6 steps as scans of 4 then 2
    multi = jax.jit(build_multi_train_step(model, cfg, tx))
    params = jax.tree_util.tree_map(np.array, params_host)
    state = create_train_state(params, tx)
    sg, sd = fresh_streams()
    metrics_rows = []
    for k in (4, 2):
        ig = jnp.asarray(np.stack([sg.next_indices() for _ in range(k)]).astype(np.int32))
        idd = jnp.asarray(np.stack([sd.next_indices() for _ in range(k)]).astype(np.int32))
        state, ms = multi(state, ctx, dev_data, ig, idd, rng)
        metrics_rows.append(jax.device_get(ms))
    assert int(jax.device_get(state.step)) == 6
    assert all(np.asarray(m["loss_g"]).shape == (k,) for m, k in zip(metrics_rows, (4, 2)))
    got_params = jax.device_get(state.params)

    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(ref_params)[0],
        jax.tree_util.tree_flatten_with_path(got_params)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(pa),
        )


def test_checkpoint_roundtrip(tiny, tmp_path):
    cfg, ctx, data = tiny
    model = CAPE(cfg)
    params = model.init_params(jax.random.PRNGKey(0), ctx)
    tx, _, _ = build_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(params, tx)
    path = ckpt.save_checkpoint(str(tmp_path), jax.device_get(state), step=7, keep=5)
    restored = ckpt.restore_checkpoint(path, jax.device_get(state))
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state)),
        jax.tree_util.tree_leaves(restored),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_opt_state_dtype_bfloat16(tiny, tmp_path):
    """opt_state_dtype=bfloat16 (PERF.md round-5 optimizer-traffic lever):
    momentum buffers are stored bf16 while params stay f32, a short sgd
    trajectory tracks the f32-state run, the state survives the npz
    checkpoint (np.savez writes ml_dtypes bfloat16 as raw '|V2', so
    flatten_tree upcasts to f32 — exact — and restore casts back), and a
    bad value fails loudly at build time."""
    import optax

    cfg, _, _ = tiny
    params = {
        "generator": {"w": jnp.linspace(-1.0, 1.0, 64).reshape(8, 8)},
        "cond_pose": {"w": jnp.full((8,), 0.3)},
        "discriminator": {"w": jnp.linspace(0.5, -0.5, 32).reshape(4, 8)},
    }
    grads = jax.tree_util.tree_map(lambda p: jnp.cos(p) * 0.1, params)

    runs = {}
    for dt in ("float32", "bfloat16"):
        c = cfg.replace(opt_state_dtype=dt, optimizer="sgd")
        tx, _, _ = build_optimizer(c, steps_per_epoch=10)
        state = create_train_state(params, tx)
        for _ in range(5):
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            state = state.replace(
                params=optax.apply_updates(state.params, updates),
                opt_state=opt_state,
                step=state.step + 1,
            )
        runs[dt] = jax.device_get(state)

    bf = runs["bfloat16"]
    state_dtypes = {
        str(leaf.dtype)
        for leaf in jax.tree_util.tree_leaves(bf.opt_state)
        if hasattr(leaf, "dtype") and getattr(leaf, "ndim", 0) > 0
    }
    assert "bfloat16" in state_dtypes, state_dtypes
    for leaf in jax.tree_util.tree_leaves(bf.params):
        assert leaf.dtype == np.float32
    for a, b in zip(
        jax.tree_util.tree_leaves(runs["float32"].params),
        jax.tree_util.tree_leaves(bf.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-2, atol=1e-4)

    # npz checkpoint roundtrip preserves the bf16 state exactly
    path = ckpt.save_checkpoint(str(tmp_path), bf, step=5, keep=5)
    restored = ckpt.restore_checkpoint(path, bf)
    for a, b in zip(
        jax.tree_util.tree_leaves(bf), jax.tree_util.tree_leaves(restored)
    ):
        assert np.asarray(a).dtype == np.asarray(b).dtype
        np.testing.assert_array_equal(
            np.asarray(a, dtype=np.float32), np.asarray(b, dtype=np.float32)
        )

    # adam: first moment honors the dtype too (optax keeps nu f32)
    tx_adam, _, _ = build_optimizer(
        cfg.replace(opt_state_dtype="bfloat16", optimizer="adam"), steps_per_epoch=10
    )
    adam_state = tx_adam.init(params)
    adam_dtypes = {
        str(leaf.dtype)
        for leaf in jax.tree_util.tree_leaves(adam_state)
        if hasattr(leaf, "dtype") and getattr(leaf, "ndim", 0) > 0
    }
    assert "bfloat16" in adam_dtypes, adam_dtypes

    with pytest.raises(ValueError, match="opt_state_dtype"):
        build_optimizer(cfg.replace(opt_state_dtype="fp8"), steps_per_epoch=10)


def test_checkpoint_keep_prunes(tmp_path):
    tree = {"w": np.arange(3.0)}
    for s in range(8):
        ckpt.save_checkpoint(str(tmp_path), tree, step=s, keep=3)
    files = sorted(os.listdir(tmp_path))
    assert len(files) == 3
    assert ckpt.checkpoint_step(ckpt.latest_checkpoint(str(tmp_path))) == 7


def test_restore_latest_falls_back_past_corrupt_file(tmp_path):
    """Crash robustness (reference restart/resume, lib/models.py:851-866):
    a half-written newest checkpoint must not kill the resume — restore
    falls back to the previous intact file with a logged warning."""
    tree = {"w": np.arange(6.0), "step": np.asarray(3)}
    ckpt.save_checkpoint(str(tmp_path), tree, step=3)
    good = ckpt.save_checkpoint(str(tmp_path), {**tree, "step": np.asarray(4)}, step=4)
    newest = ckpt.save_checkpoint(str(tmp_path), {**tree, "step": np.asarray(5)}, step=5)
    # torn write: keep only the first half of the newest file's bytes
    blob = open(newest, "rb").read()
    with open(newest, "wb") as fh:
        fh.write(blob[: len(blob) // 2])

    with pytest.warns(RuntimeWarning, match="falling back"):
        state, path = ckpt.restore_latest(str(tmp_path), tree)
    assert path == good
    assert int(state["step"]) == 4

    # every file corrupt -> (None, None), caller starts fresh
    for f in os.listdir(tmp_path):
        with open(tmp_path / f, "wb") as fh:
            fh.write(b"\x00" * 16)
    with pytest.warns(RuntimeWarning):
        state, path = ckpt.restore_latest(str(tmp_path), tree)
    assert state is None and path is None


def test_trainer_resume_survives_corrupt_latest_checkpoint(tiny, fitted, tmp_path):
    """End-to-end: Trainer.init_or_restore on a run dir whose newest
    checkpoint is torn resumes from the previous intact one (not a crash,
    not a silent fresh start)."""
    import shutil

    cfg, ctx, data = tiny
    t1, _, _, _ = fitted
    workdir2 = str(tmp_path)
    run2 = os.path.join(workdir2, cfg.name)
    os.makedirs(run2)
    ckpt_dir2 = os.path.join(run2, "checkpoints")
    shutil.copytree(t1.ckpt_dir, ckpt_dir2)
    # corrupt the newest checkpoint; the older intact ones stay
    files = sorted(f for f in os.listdir(ckpt_dir2) if f.startswith("ckpt_"))
    assert len(files) >= 2, "fitted run should keep multiple checkpoints"
    with open(os.path.join(ckpt_dir2, files[-1]), "r+b") as fh:
        fh.truncate(100)

    cfg2 = cfg.replace(restart=False, num_epochs=1)
    t2 = Trainer(cfg2, CAPE(cfg2), ctx, data, workdir=workdir2)
    with pytest.warns(RuntimeWarning, match="falling back"):
        state = t2.init_or_restore(jax.random.PRNGKey(0))
    resumed = int(jax.device_get(state.step))
    assert 0 < resumed < t1.num_steps
    assert resumed == ckpt.checkpoint_step(os.path.join(ckpt_dir2, files[-2]))


def test_writer_death_mid_save_leaves_tmp_only_and_sweep_cleans(tmp_path, monkeypatch):
    """Death between np.savez and the atomic rename (the async-checkpoint
    worker can be killed at any point) must leave ONLY a .tmp orphan —
    never a half-written final name — and the next save sweeps it."""
    tree = {"w": np.arange(6.0)}
    ckpt.save_checkpoint(str(tmp_path), tree, step=1)

    def die(*a, **k):
        raise RuntimeError("killed between snapshot and rename")

    monkeypatch.setattr(ckpt.os, "replace", die)
    with pytest.raises(RuntimeError, match="killed"):
        ckpt.save_checkpoint(str(tmp_path), tree, step=2)
    names = sorted(os.listdir(tmp_path))
    assert names == [".tmp_ckpt_0000000002.npz", "ckpt_0000000001.npz"]
    # resume ignores the orphan and restores the intact checkpoint cleanly
    state, path = ckpt.restore_latest(str(tmp_path), tree)
    assert path.endswith("ckpt_0000000001.npz")
    np.testing.assert_array_equal(state["w"], tree["w"])

    monkeypatch.undo()
    ckpt.save_checkpoint(str(tmp_path), tree, step=3)
    names = sorted(os.listdir(tmp_path))
    assert names == ["ckpt_0000000001.npz", "ckpt_0000000003.npz"]


def test_restore_wrong_config_fails_loudly(tiny):
    """Restoring a checkpoint written by a differently-configured model
    must raise immediately, naming the offending key and both shapes —
    not silently reshape/cast, and not fall back to an older file."""
    flat = {"['w']": np.zeros((8, 4), np.float32), "['b']": np.zeros(4, np.float32)}
    template = {"w": np.zeros((8, 4), np.float32), "b": np.zeros(4, np.float32)}
    # happy path sanity
    ckpt.unflatten_tree(flat, template)
    # wrong leaf size (e.g. different nf): error names key + both shapes
    bad = dict(flat, **{"['w']": np.zeros((8, 8), np.float32)})
    with pytest.raises(ckpt.CheckpointMismatchError, match=r"\['w'\].*\(8, 8\).*\(8, 4\)"):
        ckpt.unflatten_tree(bad, template)
    # missing key (e.g. extra layer in the model): loud, names the key
    with pytest.raises(ckpt.CheckpointMismatchError, match=r"missing key.*\['b'\]"):
        ckpt.unflatten_tree({"['w']": flat["['w']"]}, template)
    # restore_latest must PROPAGATE a mismatch, never "fall back" past it
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ckpt.save_checkpoint(d, {"w": np.zeros((8, 8), np.float32)}, step=1)
        with pytest.raises(ckpt.CheckpointMismatchError):
            ckpt.restore_latest(d, {"w": np.zeros((8, 4), np.float32)})


def test_schedule_staircase_and_warmup():
    # staircase: constant within an epoch window, 0.99x per window
    s = cape_schedule(0.008, decay_steps=100, decay_rate=0.99, warmup_steps=0)
    assert float(s(0)) == pytest.approx(0.008)
    assert float(s(99)) == pytest.approx(0.008)
    assert float(s(100)) == pytest.approx(0.008 * 0.99)
    assert float(s(250)) == pytest.approx(0.008 * 0.99**2)
    # warmup: linear ramp to base lr, then staircase from warmup end
    w = cape_schedule(0.008, decay_steps=100, decay_rate=0.99, warmup_steps=800)
    assert float(w(0)) == pytest.approx(0.0)
    assert float(w(400)) == pytest.approx(0.004)
    assert float(w(800)) == pytest.approx(0.008)
    assert float(w(900)) == pytest.approx(0.008 * 0.99)


def test_edge_loss_gradient_finite_at_zero_difference(tiny):
    """Regression: norm-at-zero has a NaN gradient; with identical pred/gt
    (exactly-zero edge diffs) the loss gradient must stay finite — this
    NaN poisoned whole training runs before the eps fix."""
    from cape_tpu import losses

    _, ctx, data = tiny
    x = jnp.asarray(data.disp_train[:2])

    g = jax.grad(lambda p: losses.edge_loss(p, x, ctx.edge_op))(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_trainer_does_not_mutate_bodydata(tiny, fitted):
    """Regression: the banded-mode Trainer used to permute the BodyData
    arrays in place, so the post-training demo/test path (which permutes
    again inside the inference engine) saw scrambled meshes."""
    _, ctx, data = tiny
    assert ctx.vertex_perm is not None  # banded mode: permutation in play
    _, _, _, before = fitted
    for k, v in before.items():
        np.testing.assert_array_equal(getattr(data, k), v, err_msg=k)


@pytest.mark.slow
def test_eval_tail_padding_does_not_contaminate_metrics(small_mesh, tmp_path):
    """Regression: evaluate() pads the last partial batch to the fixed
    batch size; the pad rows' garbage losses must NOT enter the averages.
    Oracle: same padded forward (same rng bits), scalar losses recomputed
    over only the real rows."""
    from cape_tpu import losses
    from cape_tpu.train.optim import create_train_state

    verts, faces = small_mesh
    nv = len(verts)
    cfg = CAPEConfig(
        name="eval_tail", nf=4, nz=8, nz_cond=8, nz_cond2=4,
        use_res_block=False, use_res_block_dec=True, affine=True,
        reduce_dim=8, batch_size=8, num_epochs=1, data_parallel=1,
    )
    pyr = build_pyramid(verts, faces, cfg.ds_factors)
    pyr_d = build_pyramid(verts, faces, [2, 2, 2, 2])
    ctx = build_graph_context(pyr, pyr_d, vertices_per_edge(faces, nv), verts)
    # n_val=12, bs=8 -> tail batch has 4 real + 4 pad rows
    data = synthetic_bodydata(n_train=44, n_test=8, num_verts=nv, seed=0, n_val=12)
    model = CAPE(cfg)
    trainer = Trainer(cfg, model, ctx, data, workdir=str(tmp_path))
    tx, _, _ = build_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(model.init_params(jax.random.PRNGKey(0), ctx), tx)

    rng = jax.random.PRNGKey(7)
    got = trainer.evaluate("val", state=state, rng=rng)

    # oracle: replay the padded batches, reduce over real rows only
    disp, pose, clo = data.split("val")
    disp = trainer._to_device_order(disp)
    n, bs = len(disp), cfg.batch_size
    totals = {"recon": 0.0, "kl": 0.0, "edge": 0.0}
    mask = ctx.loss_mask if ctx.loss_mask.ndim > 0 else None
    for begin in range(0, n, bs):
        end = min(begin + bs, n)
        w = end - begin
        pad = bs - w
        d = jnp.asarray(np.concatenate([disp[begin:end], np.zeros((pad,) + disp.shape[1:], disp.dtype)]))
        p = jnp.asarray(np.concatenate([pose[begin:end], np.zeros((pad,) + pose.shape[1:], pose.dtype)]))
        c = jnp.asarray(np.concatenate([clo[begin:end], np.zeros((pad,) + clo.shape[1:], clo.dtype)]))
        y, y2 = model.embed_conditions(state.params, p, c)
        x_hat, zm, zl, _ = model.generate(
            state.params, ctx, d, y, y2, jax.random.fold_in(rng, begin)
        )
        gt = d.astype(x_hat.dtype)
        totals["recon"] += w * float(
            losses.reconstruction_loss(x_hat[:w], gt[:w], mask=mask, kind=cfg.loss)
        )
        totals["kl"] += w * float(losses.kl_loss(zm[:w], zl[:w]))
        totals["edge"] += w * float(losses.edge_loss(x_hat[:w], gt[:w], ctx.edge_op))
    oracle = {k: v / n for k, v in totals.items()}
    for k in oracle:
        np.testing.assert_allclose(got[k], oracle[k], rtol=1e-5, atol=1e-6, err_msg=k)


@pytest.mark.slow
def test_single_backward_matches_stitched_two_player_grads(tiny):
    """The combined stop_gradient-blocked loss must yield exactly the
    stitched gradients: jax.grad(loss_g) on G/cond subtrees and
    jax.grad(loss_d) on the discriminator subtree."""
    from cape_tpu.train.step import _forward_losses, _gan_losses

    cfg, ctx, data = tiny
    model = CAPE(cfg)
    params = model.init_params(jax.random.PRNGKey(0), ctx)
    sg, sd = BatchStream(80, cfg.batch_size, 0), BatchStream(80, cfg.batch_size, 1)
    batch = {k: jnp.asarray(v) for k, v in make_gan_batch(data, sg, sd).items()}
    rng = jax.random.PRNGKey(5)

    combined = jax.jit(
        jax.grad(lambda p: _gan_losses(model, cfg, p, ctx, batch, rng)[0])
    )(params)
    g_only = jax.jit(
        jax.grad(lambda p: _forward_losses(model, cfg, p, ctx, batch, rng)[0])
    )(params)
    d_only = jax.jit(
        jax.grad(lambda p: _forward_losses(model, cfg, p, ctx, batch, rng)[1])
    )(params)

    for group in ("generator", "cond_pose", "cond_clo"):
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(combined[group])[0],
            jax.tree_util.tree_flatten_with_path(g_only[group])[0],
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
                err_msg=f"{group}{jax.tree_util.keystr(pa)}",
            )
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(combined["discriminator"])[0],
        jax.tree_util.tree_flatten_with_path(d_only["discriminator"])[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
            err_msg=f"disc{jax.tree_util.keystr(pa)}",
        )


@pytest.mark.slow
def test_eval_metrics_leave_step_as_f32_under_bf16(tiny):
    """Regression: per-sample eval metrics must be f32 on the host even
    under bf16 compute — numpy's bfloat16 np.sum over ~100 samples loses
    ~1-2% (measured on the flagship val eval; the scan-vs-loop eval
    'disagreement' was exactly this host aggregation error)."""
    from cape_tpu.train.step import build_eval_step

    cfg, ctx, data = tiny
    cfg = cfg.replace(compute_dtype="bfloat16")
    model = CAPE(cfg)
    params = model.init_params(jax.random.PRNGKey(0), ctx)
    disp, pose, clo = data.split("val")
    bs = cfg.batch_size
    batch = {
        "disp": jnp.asarray(disp[:bs]),
        "pose": jnp.asarray(pose[:bs]),
        "clo": jnp.asarray(clo[:bs]),
    }
    eval_fn = jax.jit(build_eval_step(model, cfg))
    pred, metrics = eval_fn(params, ctx, batch, jax.random.PRNGKey(0))
    assert pred.dtype == jnp.float32
    for k, v in metrics.items():
        assert v.dtype == jnp.float32, (k, v.dtype)
        assert v.shape == (bs,), (k, v.shape)


@pytest.mark.slow
def test_fit_fails_fast_on_non_finite_loss(small_mesh, tmp_path):
    """Failure detection: a NaN in the training data must abort fit() with
    the offending step in the error, not silently poison later
    checkpoints (the chunk-sync fetch screens every scanned step)."""
    verts, faces = small_mesh
    nv = len(verts)
    cfg = CAPEConfig(
        name="nan_abort", nf=4, nz=8, nz_cond=8, nz_cond2=4,
        use_res_block=False, use_res_block_dec=True, affine=True,
        reduce_dim=8, batch_size=8, num_epochs=1, steps_per_dispatch=4,
        data_parallel=1,
    )
    pyr = build_pyramid(verts, faces, cfg.ds_factors)
    pyr_d = build_pyramid(verts, faces, [2, 2, 2, 2])
    ctx = build_graph_context(pyr, pyr_d, vertices_per_edge(faces, nv), verts)
    data = synthetic_bodydata(n_train=40, n_test=8, num_verts=nv, seed=0, n_val=8)
    data.disp_train[:] = np.nan
    trainer = Trainer(cfg, CAPE(cfg), ctx, data, workdir=str(tmp_path))
    with pytest.raises(FloatingPointError, match="non-finite training loss"):
        trainer.fit()


def test_trainer_auto_mesh_clamps_to_batch(tiny):
    """Auto data_parallel (0) must pick a mesh that divides the batch:
    batch 4 on the 8-device test host -> 4 devices (the artifact drill's
    configuration); an explicit non-dividing request is a clear error."""
    cfg, ctx, data = tiny
    model = CAPE(cfg)
    t = Trainer(cfg.replace(batch_size=4, data_parallel=0), model, ctx, data)
    assert t.dp.num_devices == 4
    t = Trainer(cfg.replace(batch_size=16, data_parallel=0), model, ctx, data)
    assert t.dp.num_devices == 8
    with pytest.raises(ValueError, match="does not divide"):
        Trainer(cfg.replace(batch_size=4, data_parallel=8), model, ctx, data)


# Measured 2026-08-19 on this box (CPU backend, jax 0.9.0, seeded run
# below): val recon per epoch [0.8047, 0.8010, 0.8008, 0.8000]. The
# normalized synthetic targets are ~N(0,1) per vertex, so an untrained /
# stalled model sits at E|N(0,1)| = 0.798... BIASED UP by init noise to
# ~0.805 — the measured descent below 0.801 is genuine optimization.
# Ceiling = final + ~0.3% headroom for bf16/XLA-version drift; a change
# that stalls or breaks optimization lands at >= 0.8047 and fails.
# Re-pin (with the curve) if the model or synthetic set changes
# INTENTIONALLY; see docs/PERF.md "quality gate".
QUALITY_GATE_CEILING = 0.8025


@pytest.mark.slow
def test_training_quality_gate_flagship_lite(tmp_path):
    """Pinned convergence-quality regression gate (VERDICT r3 item 4).

    Seeded flagship-lite run through the PRODUCTION pipeline — full SMPL
    template, banded RCM operators, persistent-padded layout, bf16
    compute, scanned multi-step dispatch — on the learnable synthetic set.
    The ceiling is pinned from the measured final val-recon of this exact
    seeded run (see docs/PERF.md "quality gate"); a future 'performance
    optimization' that silently degrades optimization quality turns this
    red instead of shipping. test_training_reduces_loss only checks
    monotonicity, which a large regression could still pass."""
    from cape_tpu.meshops import assets

    cfg = CAPEConfig(
        name="quality_gate", nf=16, nz=32, nz_cond=16, nz_cond2=8,
        use_res_block=False, use_res_block_dec=True, affine=True,
        reduce_dim=16, batch_size=8, num_epochs=4, lambda_edge=1.0,
        compute_dtype="bfloat16", data_parallel=1,
        # adam + full LR from step 0: the reference's sgd + 8-epoch ramp
        # moves val recon only ~0.3% in a 4-epoch window (measured) — far
        # too shallow to pin a regression threshold against. adam descends
        # ~an order of magnitude more over the same window while exercising
        # the identical compute pipeline (banded padded bf16 scan dispatch).
        optimizer="adam", lr=2e-3, lr_warmup=False,
    )
    verts, _ = assets.template_mesh()
    ctx = build_graph_context(
        assets.load_pyramid("for_demo"), assets.load_pyramid("ds2"),
        assets.smpl_edges(), verts,
        mode=cfg.op_mode, dtype=np.dtype(cfg.compute_dtype),
        padded=cfg.padded_layout, use_pallas=cfg.use_pallas,
    )
    data = synthetic_bodydata(n_train=144, n_test=8, num_verts=6890, seed=3, n_val=16)
    trainer = Trainer(cfg, CAPE(cfg), ctx, data, workdir=str(tmp_path))
    val_losses, _ = trainer.fit(seed=0)
    print(f"quality gate val recon per epoch: {val_losses}")
    assert np.all(np.isfinite(val_losses))
    assert val_losses[-1] <= QUALITY_GATE_CEILING, (
        f"convergence regression: final val recon {val_losses[-1]:.6f} "
        f"> pinned ceiling {QUALITY_GATE_CEILING} (docs/PERF.md quality gate)"
    )


@pytest.mark.slow
def test_training_with_pose_type_pose(small_mesh, tmp_path):
    """End-to-end training on 42-dim axis-angle conditions (pose_type=
    'pose'): the reference supports it via config (config_parser.py:31,
    lib/utils.py:40-62) but ships no preset; pin that the whole loop runs
    and learns with cond_dim=42."""
    verts, faces = small_mesh
    nv = len(verts)
    cfg = CAPEConfig(
        name="pose_aa_test", nf=4, nz=8, nz_cond=8, nz_cond2=4,
        use_res_block=False, use_res_block_dec=True, affine=True,
        reduce_dim=8, batch_size=8, num_epochs=2, lambda_edge=1.0,
        lr=2e-3, optimizer="adam", data_parallel=1,
        pose_type="pose", cond_dim=42,
    )
    pyr = build_pyramid(verts, faces, cfg.ds_factors)
    pyr_d = build_pyramid(verts, faces, [2, 2, 2, 2])
    ctx = build_graph_context(pyr, pyr_d, vertices_per_edge(faces, nv), verts)
    data = synthetic_bodydata(
        n_train=96, n_test=16, num_verts=nv, seed=0, n_val=16, pose_type="pose"
    )
    assert data.pose_train.shape[-1] == 42     # 72-d axis-angle filtered

    trainer = Trainer(cfg, model=CAPE(cfg), ctx=ctx, data=data, workdir=str(tmp_path))
    val_losses, _ = trainer.fit()
    assert np.all(np.isfinite(val_losses))
    assert val_losses[-1] <= val_losses[0]
