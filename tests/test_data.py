"""Data layer tests: loader semantics, batch streams, packer, GMM prior."""

import os

import jax
import numpy as np
import pytest

from cape_tpu.data.dataset_configs import dataset_config_dicts
from cape_tpu.data.loader import BatchStream, BodyData, make_gan_batch
from cape_tpu.data.packer import create_dataset
from cape_tpu.data.synthetic import synthetic_bodydata
from cape_tpu.models.gmm import GMM, fit_gmm


def test_bodydata_normalization_and_split():
    data = synthetic_bodydata(n_train=64, n_test=16, num_verts=50, n_val=8, seed=0)
    assert len(data.disp_train) == 56 and len(data.disp_val) == 8
    # train split is z-scored per vertex
    np.testing.assert_allclose(data.disp_train.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(data.disp_train.std(axis=0), 1.0, atol=1e-3)
    # denormalize roundtrips
    rec = data.denormalize(data.disp_test)
    assert rec.shape == data.disp_test.shape
    # rot poses got filtered 216 -> 126, full kept for reposing
    assert data.pose_train.shape[-1] == 126
    assert data.pose_test_full.shape[-1] == 216


def test_batch_stream_epoch_coverage():
    s = BatchStream(n=10, batch_size=4, seed=0)
    seen = []
    for _ in range(5):  # 20 draws = 2 epochs
        seen.extend(s.next_indices().tolist())
    # every sample appears exactly twice in 2 epochs
    counts = np.bincount(seen, minlength=10)
    assert counts.min() >= 1 and counts.max() <= 3 and counts.sum() == 20


def test_gan_batch_keys():
    data = synthetic_bodydata(n_train=32, n_test=8, num_verts=20, n_val=4)
    b = make_gan_batch(data, BatchStream(28, 4, 0), BatchStream(28, 4, 1))
    assert set(b) == {"disp_g", "pose_g", "clo_g", "disp_d", "pose_d", "clo_d"}
    assert b["disp_g"].shape == (4, 20, 3)
    assert b["pose_g"].shape == (4, 126)
    assert b["clo_g"].shape == (4, 4)


def _fabricate_raw_cape(root, subj="00032", seqs=("move_arms",), cloths=("longlong",), n_frames=6):
    rng = np.random.default_rng(0)
    nv = 30
    minimal = rng.standard_normal((nv, 3))
    os.makedirs(os.path.join(root, "minimal_body_shape", subj), exist_ok=True)
    np.save(os.path.join(root, "minimal_body_shape", subj, f"{subj}_minimal.npy"), minimal)
    for seq in seqs:
        for cloth in cloths:
            d = os.path.join(root, "sequences", subj, f"{cloth}_{seq}")
            os.makedirs(d, exist_ok=True)
            for i in range(n_frames):
                np.savez(
                    os.path.join(d, f"frame_{i:04d}.npz"),
                    pose=0.3 * rng.standard_normal(72),
                    v_cano=minimal + 0.01 * rng.standard_normal((nv, 3)),
                )
    return nv


def test_packer_end_to_end(tmp_path):
    raw = str(tmp_path / "raw")
    out = str(tmp_path / "packed")
    nv = _fabricate_raw_cape(raw)
    split = dict(dataset_config_dicts["male"])
    split.update({"train_subjs": ["00032"], "test_subjs": ["00032"]})
    n = create_dataset("train", split, raw, "ds_test", out)
    # 6 frames - 2*cut_first = 2 frames packed
    assert n == 2
    disp = np.load(os.path.join(out, "ds_test", "train", "train_disp.npy"))
    rot = np.load(os.path.join(out, "ds_test", "train", "train_rot.npy"))
    clo = np.load(os.path.join(out, "ds_test", "train", "train_clo_label.npy"))
    assert disp.shape == (2, nv, 3)
    assert rot.shape == (2, 216)
    # longlong is one-hot position 3 in the canonical ordering
    np.testing.assert_array_equal(clo[0], [0, 0, 0, 1])
    assert os.path.exists(os.path.join(out, "ds_test", "stats.txt"))


def test_packer_byte_parity_vs_reference_transcription(tmp_path):
    """The packer's outputs are BYTE-identical to the reference packer's
    (lib/prep_data.py) on the same raw tree: .npy files for disp/pose/
    clo_label compare equal as bytes, stats.txt and broken_frames.txt
    compare equal as text, and rot matches in shape/dtype with values
    equal to float64 precision (cv2.Rodrigues vs our closed form — the
    only non-bitwise seam). Oracle: tests/packer_oracle.py."""
    from packer_oracle import oracle_create_dataset

    raw = str(tmp_path / "raw")
    rng = np.random.default_rng(7)
    nv = 27
    subjects = ("00032", "00096")
    seqs = ("move_arms", "squat")
    cloths = ("longlong", "shortshort")
    for subj in subjects:
        minimal = rng.standard_normal((nv, 3))
        os.makedirs(os.path.join(raw, "minimal_body_shape", subj), exist_ok=True)
        np.save(
            os.path.join(raw, "minimal_body_shape", subj, f"{subj}_minimal.npy"),
            minimal,
        )
        for seq in seqs:
            for cloth in cloths:
                d = os.path.join(raw, "sequences", subj, f"{cloth}_{seq}")
                os.makedirs(d, exist_ok=True)
                for i in range(8):
                    np.savez(
                        os.path.join(d, f"frame_{i:04d}.npz"),
                        pose=0.4 * rng.standard_normal(72),
                        v_cano=minimal + 0.02 * rng.standard_normal((nv, 3)),
                    )
    # one torn frame inside the kept [2:-2] slice: both packers must log
    # it to broken_frames.txt and keep going
    with open(
        os.path.join(raw, "sequences", "00032", "longlong_move_arms", "frame_0003.npz"),
        "wb",
    ) as fh:
        fh.write(b"definitely not a zip archive")
    # and one existing-but-EMPTY sequence dir ("stretch" is in the split
    # but only this dir exists for it): skipped entirely — no stats info
    # line and no per-clotype sequence-counter bump in either packer
    os.makedirs(os.path.join(raw, "sequences", "00032", "shortshort_stretch"))

    split = {
        "train_subjs": list(subjects), "train_seqs": list(seqs) + ["stretch"],
        "train_cloth": list(cloths),
        "test_subjs": [subjects[1]], "test_seqs": [seqs[0]],
        "test_cloth": list(cloths),
        "exclude_seqs": [], "exclude_cases": [["00096", "shortshort"]],
        "cut_first": 2, "sample_rate": 2,
    }
    ours, ref = str(tmp_path / "ours"), str(tmp_path / "ref")
    for phase in ("train", "test"):  # both: exercises stats.txt append mode
        n_ours = create_dataset(phase, split, raw, "ds_parity", ours)
        n_ref = oracle_create_dataset(phase, split, raw, "ds_parity", ref)
        assert n_ours == n_ref > 0

    def slurp(root, rel):
        with open(os.path.join(root, "ds_parity", rel), "rb") as fh:
            return fh.read()

    for phase in ("train", "test"):
        for kind in ("disp", "pose", "clo_label"):
            rel = os.path.join(phase, f"{phase}_{kind}.npy")
            assert slurp(ours, rel) == slurp(ref, rel), f"{rel} bytes differ"
        r_ours = np.load(os.path.join(ours, "ds_parity", phase, f"{phase}_rot.npy"))
        r_ref = np.load(os.path.join(ref, "ds_parity", phase, f"{phase}_rot.npy"))
        assert r_ours.dtype == r_ref.dtype == np.float64
        assert r_ours.shape == r_ref.shape
        np.testing.assert_allclose(r_ours, r_ref, atol=1e-12, rtol=0)
    assert slurp(ours, "stats.txt") == slurp(ref, "stats.txt")
    assert slurp(ours, "broken_frames.txt") == slurp(ref, "broken_frames.txt")


def test_pretrained_gmm_loads_and_samples():
    gmm = GMM.load_pretrained()
    assert gmm.weights.shape == (10,)
    assert gmm.means.shape == (10, 18)
    assert gmm.covariances.shape == (10, 18, 18)
    np.testing.assert_allclose(float(gmm.weights.sum()), 1.0, atol=1e-5)
    z = np.asarray(gmm.sample(jax.random.PRNGKey(0), 32))
    assert z.shape == (32, 18)
    lp = np.asarray(gmm.log_prob(z))
    assert np.all(np.isfinite(lp))


def test_fit_gmm_recovers_two_clusters():
    rng = np.random.default_rng(0)
    x = np.concatenate(
        [rng.normal(-3, 0.3, (300, 2)), rng.normal(3, 0.3, (300, 2))]
    )
    gmm = fit_gmm(x, n_components=2, n_iter=50)
    means = np.sort(np.asarray(gmm.means)[:, 0])
    np.testing.assert_allclose(means, [-3, 3], atol=0.3)
    np.testing.assert_allclose(np.asarray(gmm.weights), [0.5, 0.5], atol=0.05)


def test_batch_stream_skip_is_equivalent_and_o1():
    """skip(k) lands exactly where k sequential draws would (resume
    determinism), in O(1): epoch permutations are keyed by (seed, epoch)."""
    import time

    seq = BatchStream(n=37, batch_size=5, seed=3)
    drawn = [seq.next_indices() for _ in range(50)]

    jumped = BatchStream(n=37, batch_size=5, seed=3)
    jumped.skip(17)
    np.testing.assert_array_equal(jumped.next_indices(), drawn[17])
    jumped.skip(10)                                    # 17 + 1 + 10 = 28
    np.testing.assert_array_equal(jumped.next_indices(), drawn[28])

    # O(1): a 10M-batch skip must be instant (was O(steps) replay)
    big = BatchStream(n=31036, batch_size=16, seed=0)
    t0 = time.perf_counter()
    big.skip(10_000_000)
    assert time.perf_counter() - t0 < 0.1
    idx = big.next_indices()
    assert idx.shape == (16,) and idx.min() >= 0 and idx.max() < 31036


def test_batch_stream_epoch_boundary_batches():
    """Batches spanning an epoch boundary stitch two permutations; every
    epoch still covers each index exactly once."""
    s = BatchStream(n=10, batch_size=4, seed=1)
    idx = np.concatenate([s.next_indices() for _ in range(5)])  # 2 epochs
    assert sorted(idx[:10].tolist()) == list(range(10))
    assert sorted(idx[10:].tolist()) == list(range(10))
