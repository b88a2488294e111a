"""In-memory dataset wrapper and batch streams.

BodyData mirrors the reference wrapper (lib/load_data.py:35-150): load the
packed per-frame arrays, carve a 100-sample validation split off the train
tail, z-score-normalize vertices by per-vertex train mean/std, filter the
pose condition down to the 14 clothing joints (keeping the full pose for
test-time reposing), cast float32.

BatchStream reproduces the reference's epoch-permuted index deques
(lib/models.py:872-898): independent G and D minibatch streams that use
every sample once per epoch. Batches are plain numpy dicts; device
placement/sharding is the caller's job (parallel.DataParallel).
"""

from __future__ import annotations

import os

import numpy as np

from cape_tpu.smpl.joints import filter_cloth_pose


class BodyData:
    def __init__(
        self,
        train_disp: np.ndarray,
        train_pose: np.ndarray,
        train_clo: np.ndarray,
        test_disp: np.ndarray,
        test_pose: np.ndarray,
        test_clo: np.ndarray,
        n_val: int = 100,
    ):
        n_val = min(n_val, max(len(train_disp) - 1, 1))
        self.disp_train = np.asarray(train_disp[:-n_val])
        self.disp_val = np.asarray(train_disp[-n_val:])
        self.disp_test = np.asarray(test_disp)

        pose_train = np.asarray(train_pose).reshape(len(train_pose), -1)
        pose_test = np.asarray(test_pose).reshape(len(test_pose), -1)
        self.pose_train_full = pose_train[:-n_val]
        self.pose_val_full = pose_train[-n_val:]
        self.pose_test_full = pose_test

        # filter to clothing joints unless already filtered (lib/load_data.py:94-99)
        if pose_test.shape[-1] % 14 != 0:
            self.pose_train = filter_cloth_pose(self.pose_train_full)
            self.pose_val = filter_cloth_pose(self.pose_val_full)
            self.pose_test = filter_cloth_pose(self.pose_test_full)
        else:
            self.pose_train = self.pose_train_full
            self.pose_val = self.pose_val_full
            self.pose_test = self.pose_test_full

        self.clo_train = np.asarray(train_clo[:-n_val])
        self.clo_val = np.asarray(train_clo[-n_val:])
        self.clo_test = np.asarray(test_clo)

        # normalization stats from the (train - val) split, like the
        # reference (mean/std computed after the val carve-out's source
        # array but before normalize; lib/load_data.py:55-58 computes them
        # on vertices_train which excludes val)
        self.mean = np.mean(self.disp_train, axis=0)
        self.std = np.std(self.disp_train, axis=0)
        self.std = np.where(self.std < 1e-12, 1.0, self.std)

        for name in ("disp_train", "disp_val", "disp_test"):
            arr = (getattr(self, name) - self.mean) / self.std
            setattr(self, name, arr.astype(np.float32))
        for name in (
            "pose_train", "pose_val", "pose_test",
            "clo_train", "clo_val", "clo_test",
        ):
            setattr(self, name, getattr(self, name).astype(np.float32))

        self.n_vertex = self.disp_train.shape[1]

    # ------------------------------------------------------------------
    @classmethod
    def from_packed(cls, data_dir: str, pose_type: str = "rot", n_val: int = 100):
        """Load a packed dataset directory (the packer's output layout,
        identical to the reference's data/datasets/<name>/{train,test})."""

        def load(phase, kind):
            return np.load(os.path.join(data_dir, phase, f"{phase}_{kind}.npy"))

        return cls(
            train_disp=load("train", "disp"),
            train_pose=load("train", pose_type),
            train_clo=load("train", "clo_label"),
            test_disp=load("test", "disp"),
            test_pose=load("test", pose_type),
            test_clo=load("test", "clo_label"),
            n_val=n_val,
        )

    def permute_vertices(self, perm: np.ndarray) -> None:
        """Rewrite all per-vertex arrays in a new vertex order (used by the
        banded/reordered device formulation; see meshops.ordering)."""
        perm = np.asarray(perm)
        if getattr(self, "_vertex_perm", None) is not None:
            if np.array_equal(self._vertex_perm, perm):
                return
            raise ValueError("BodyData already permuted with a different order")
        for name in ("disp_train", "disp_val", "disp_test"):
            setattr(self, name, np.ascontiguousarray(getattr(self, name)[:, perm]))
        self.mean = self.mean[perm]
        self.std = self.std[perm]
        self._vertex_perm = perm

    def denormalize(self, disp: np.ndarray) -> np.ndarray:
        return disp * self.std + self.mean

    def split(self, name: str):
        """('disp', 'pose', 'clo') arrays for 'train' | 'val' | 'test'."""
        return (
            getattr(self, f"disp_{name}"),
            getattr(self, f"pose_{name}"),
            getattr(self, f"clo_{name}"),
        )


class BatchStream:
    """Epoch-permuted minibatch index stream (lib/models.py:872-884).

    Each epoch's permutation is derived independently from (seed, epoch)
    — not drawn from one sequential generator — so a resume fast-forward
    is O(1) position arithmetic instead of replaying every draw (a resume
    at step 100k previously re-ran 100k host-side permutation draws). The
    stream is a pure function of (seed, position): chunked, skipped, and
    sequential consumption all see the identical index sequence (tested)."""

    def __init__(self, n: int, batch_size: int, seed: int = 0):
        self.n = n
        self.batch_size = batch_size
        self.seed = seed
        self._pos = 0                    # items consumed so far
        self._cached: tuple[int, np.ndarray | None] = (-1, None)

    def _perm(self, epoch: int) -> np.ndarray:
        if self._cached[0] != epoch:
            perm = np.random.default_rng((self.seed, epoch)).permutation(self.n)
            self._cached = (epoch, perm)
        return self._cached[1]

    def next_indices(self) -> np.ndarray:
        out = np.empty(self.batch_size, dtype=np.int64)
        got = 0
        while got < self.batch_size:
            epoch, off = divmod(self._pos, self.n)
            take = min(self.batch_size - got, self.n - off)
            out[got : got + take] = self._perm(epoch)[off : off + take]
            got += take
            self._pos += take
        return out

    def skip(self, n_batches: int) -> None:
        """O(1) fast-forward past n_batches (checkpoint resume: positions
        the stream exactly where an uninterrupted run would be)."""
        self._pos += n_batches * self.batch_size


def make_gan_batch(data: BodyData, stream_g: BatchStream, stream_d: BatchStream) -> dict:
    """One training batch with independent G and D sample streams."""
    ig = stream_g.next_indices()
    idx = stream_d.next_indices()
    return {
        "disp_g": data.disp_train[ig],
        "pose_g": data.pose_train[ig],
        "clo_g": data.clo_train[ig],
        "disp_d": data.disp_train[idx],
        "pose_d": data.pose_train[idx],
        "clo_d": data.clo_train[idx],
    }
