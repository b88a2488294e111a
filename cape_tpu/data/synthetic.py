"""Synthetic datasets for tests and benchmarks.

Generates CAPE-shaped data (per-vertex displacement fields conditioned on
pose and clothing type) with a smooth low-rank structure so models can
actually fit it — used by the integration tests (SURVEY §4 item 4) and by
bench.py when the real CAPE dataset is not on disk.
"""

from __future__ import annotations

import numpy as np

from cape_tpu.data.loader import BodyData
from cape_tpu.smpl.rodrigues import pose_to_rotmats


def synthetic_bodydata(
    n_train: int = 256,
    n_test: int = 64,
    num_verts: int = 6890,
    pose_type: str = "rot",
    rank: int = 12,
    noise: float = 0.001,
    seed: int = 0,
    n_val: int = 32,
) -> BodyData:
    rng = np.random.default_rng(seed)
    n = n_train + n_test

    pose_aa = 0.3 * rng.standard_normal((n, 72))
    clo = np.eye(4, dtype=np.float32)[rng.integers(0, 4, size=n)]

    # displacements = smooth function of (pose, clotype) + small noise
    basis = rng.standard_normal((rank, num_verts, 3)) * 0.01
    pose_proj = rng.standard_normal((72, rank))
    clo_proj = rng.standard_normal((4, rank))
    coeff = np.tanh(pose_aa @ pose_proj + clo @ clo_proj)           # [n, rank]
    disp = np.einsum("nr,rvc->nvc", coeff, basis)
    disp += noise * rng.standard_normal(disp.shape)

    if pose_type == "rot":
        cond = pose_to_rotmats(pose_aa)                             # [n, 216]
    else:
        cond = pose_aa
    return BodyData(
        train_disp=disp[:n_train],
        train_pose=cond[:n_train],
        train_clo=clo[:n_train],
        test_disp=disp[n_train:],
        test_pose=cond[n_train:],
        test_clo=clo[n_train:],
        n_val=n_val,
    )
