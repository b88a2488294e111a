"""Closed-form Rodrigues conversions, batched, numpy and JAX.

Replaces the reference's per-joint OpenCV `cv2.Rodrigues` loops
(lib/utils.py:80-110, lib/prep_data.py:77) with vectorized exponential /
log maps — no native dependency, and the JAX versions run inside jitted
graphs (e.g. the data packer and the pure-XLA demo path).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _rodrigues(axis_angle, xp):
    """axis-angle [..., 3] -> rotation matrices [..., 3, 3] (exp map)."""
    theta = xp.sqrt(xp.sum(axis_angle**2, axis=-1, keepdims=True) + 1e-16)
    k = axis_angle / theta
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zeros = xp.zeros_like(kx)
    K = xp.stack(
        [
            xp.stack([zeros, -kz, ky], axis=-1),
            xp.stack([kz, zeros, -kx], axis=-1),
            xp.stack([-ky, kx, zeros], axis=-1),
        ],
        axis=-2,
    )
    theta = theta[..., None]
    eye = xp.eye(3, dtype=axis_angle.dtype)
    eye = xp.broadcast_to(eye, K.shape)
    return eye + xp.sin(theta) * K + (1.0 - xp.cos(theta)) * (K @ K)


def _inverse_rodrigues(R, xp):
    """rotation matrices [..., 3, 3] -> axis-angle [..., 3] (log map)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_theta = xp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = xp.arccos(cos_theta)
    # skew part gives axis * 2 sin(theta)
    v = xp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    sin_theta = xp.sin(theta)
    small = xp.abs(sin_theta) < 1e-6
    scale = xp.where(small, 0.5, theta / xp.where(small, 1.0, 2.0 * sin_theta))
    aa_generic = v * scale[..., None]
    # theta ~ pi: axis from the diagonal of (R + I)/2
    near_pi = theta > np.pi - 1e-3
    diag = xp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis2 = xp.clip((diag + 1.0) / 2.0, 0.0, 1.0)
    axis = xp.sqrt(axis2)
    # fix signs from off-diagonals (largest component positive convention)
    sx = xp.where(v[..., 0] < 0, -1.0, 1.0)
    sy = xp.where(R[..., 0, 1] + R[..., 1, 0] < 0, -sx, sx)
    sz = xp.where(R[..., 0, 2] + R[..., 2, 0] < 0, -sx, sx)
    axis = axis * xp.stack([xp.ones_like(sx), sy * sx, sz * sx], axis=-1) * sx[..., None]
    aa_pi = axis * theta[..., None]
    return xp.where(near_pi[..., None], aa_pi, aa_generic)


def pose_to_rotmats(pose: np.ndarray | jnp.ndarray, use_jax: bool = False):
    """[N, J*3] axis-angle pose -> [N, J*9] flat rotation matrices
    (reference pose2rot, lib/utils.py:80-94)."""
    xp = jnp if use_jax else np
    pose = pose.reshape(pose.shape[0], -1, 3)
    R = _rodrigues(xp.asarray(pose), xp)
    return R.reshape(pose.shape[0], -1)


def rotmats_to_pose(rot: np.ndarray | jnp.ndarray, use_jax: bool = False):
    """[N, J*9] flat rotation matrices -> [N, J*3] axis-angle
    (reference rot2pose, lib/utils.py:96-110)."""
    xp = jnp if use_jax else np
    n = rot.shape[0]
    R = xp.asarray(rot).reshape(n, -1, 3, 3)
    aa = _inverse_rodrigues(R, xp)
    return aa.reshape(n, -1)


def rodrigues(axis_angle, use_jax: bool = True):
    """[..., 3] axis-angle -> [..., 3, 3] rotation matrices."""
    xp = jnp if use_jax else np
    return _rodrigues(xp.asarray(axis_angle), xp)
