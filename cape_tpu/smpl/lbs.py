"""Pure-JAX SMPL linear blend skinning.

Replaces the reference's PyTorch/smplx posing path (demos.py:22-24,
267-283: smplx.body_models.create + v_template override) with a jittable
forward that composes with the rest of the XLA graph: shape blendshapes,
pose blendshapes, joint regression, kinematic chain, skinning.

The official SMPL .pkl model files are loaded chumpy-free via a tolerant
unpickler. When no model file is available (they are license-gated), a
synthetic rig (`SMPLModel.synthetic`) exercises the same code path for
tests and demos.
"""

from __future__ import annotations

import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from cape_tpu.smpl.rodrigues import rodrigues

NUM_JOINTS = 24


class _TolerantUnpickler(pickle.Unpickler):
    """Unpickle SMPL .pkl files without chumpy/scipy-version landmines."""

    def find_class(self, module, name):
        if module.startswith("chumpy"):
            return _ChStub
        if module == "scipy.sparse.csc" and name == "csc_matrix":
            import scipy.sparse

            return scipy.sparse.csc_matrix
        return super().find_class(module, name)


class _ChStub:
    """Minimal stand-in for chumpy.Ch: keeps the wrapped ndarray."""

    def __setstate__(self, state):
        self.__dict__.update(state)

    def __array__(self, dtype=None):
        arr = np.asarray(self.__dict__.get("x"))
        return arr.astype(dtype) if dtype is not None else arr


def _to_np(x) -> np.ndarray:
    if hasattr(x, "toarray"):
        return np.asarray(x.toarray())
    return np.asarray(x)


@struct.dataclass
class SMPLModel:
    """SMPL constants as a jit-friendly pytree."""

    v_template: jnp.ndarray      # [V, 3]
    shapedirs: jnp.ndarray       # [V, 3, n_betas]
    posedirs: jnp.ndarray        # [(J-1)*9, V*3] pose-blendshape basis
    J_regressor: jnp.ndarray     # [J, V]
    weights: jnp.ndarray         # [V, J] skinning weights
    parents: tuple = struct.field(pytree_node=False)
    faces: jnp.ndarray | None = None

    @classmethod
    def load(cls, model_path: str, gender: str = "male") -> "SMPLModel":
        """Load an official SMPL .pkl (searches the usual smplx layout:
        <model_path>/smpl/SMPL_<GENDER>.pkl, or a direct file path)."""
        candidates = [
            model_path,
            os.path.join(model_path, "smpl", f"SMPL_{gender.upper()}.pkl"),
            os.path.join(model_path, f"SMPL_{gender.upper()}.pkl"),
            os.path.join(model_path, "smpl", f"basicmodel_{gender[0]}_lbs_10_207_0_v1.0.0.pkl"),
        ]
        path = next((c for c in candidates if os.path.isfile(c)), None)
        if path is None:
            raise FileNotFoundError(
                f"No SMPL model found under {model_path!r} for gender={gender!r}"
            )
        with open(path, "rb") as f:
            data = _TolerantUnpickler(f, encoding="latin1").load()
        shapedirs = _to_np(data["shapedirs"])
        posedirs = _to_np(data["posedirs"])
        V = shapedirs.shape[0]
        return cls(
            v_template=jnp.asarray(_to_np(data["v_template"]), jnp.float32),
            shapedirs=jnp.asarray(shapedirs, jnp.float32),
            posedirs=jnp.asarray(
                posedirs.reshape(V * 3, -1).T, jnp.float32
            ),
            J_regressor=jnp.asarray(_to_np(data["J_regressor"]), jnp.float32),
            weights=jnp.asarray(_to_np(data["weights"]), jnp.float32),
            parents=tuple(int(p) for p in _to_np(data["kintree_table"])[0]),
            faces=jnp.asarray(_to_np(data["f"]).astype(np.int32)),
        )

    @classmethod
    def synthetic(cls, verts: np.ndarray, faces: np.ndarray, seed: int = 0) -> "SMPLModel":
        """A plausible rig over an arbitrary mesh: joints from vertex
        clusters, smooth distance-based skinning weights. For tests/demos
        when the license-gated SMPL .pkl is unavailable."""
        rng = np.random.default_rng(seed)
        verts = np.asarray(verts, dtype=np.float64)
        V = len(verts)
        centers = verts[rng.choice(V, NUM_JOINTS, replace=False)]
        # joint regressor: soft assignment of vertices to nearest centers
        d = np.linalg.norm(verts[None] - centers[:, None], axis=-1)  # [J, V]
        Jreg = np.exp(-(d**2) / (2 * 0.05**2)) + 1e-8
        Jreg /= Jreg.sum(axis=1, keepdims=True)
        # skinning weights: softmax over inverse distances
        w = np.exp(-(d.T**2) / (2 * 0.1**2)) + 1e-8                  # [V, J]
        w /= w.sum(axis=1, keepdims=True)
        parents = tuple([0] + [max(0, (i - 1) // 2) for i in range(1, NUM_JOINTS)])
        n_betas = 10
        return cls(
            v_template=jnp.asarray(verts, jnp.float32),
            shapedirs=jnp.asarray(
                0.01 * rng.standard_normal((V, 3, n_betas)), jnp.float32
            ),
            posedirs=jnp.asarray(
                0.001 * rng.standard_normal(((NUM_JOINTS - 1) * 9, V * 3)), jnp.float32
            ),
            J_regressor=jnp.asarray(Jreg, jnp.float32),
            weights=jnp.asarray(w, jnp.float32),
            parents=parents,
            faces=jnp.asarray(np.asarray(faces, np.int32)),
        )


def lbs(
    model: SMPLModel,
    pose: jnp.ndarray,
    betas: jnp.ndarray | None = None,
    v_template: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """SMPL forward: pose [B, 72] axis-angle (joint 0 = global orient),
    optional betas [B, n_betas], optional per-sample template override
    [B, V, 3] (the reference's v_template[:] = generated clothed body,
    demos.py:267). Returns posed vertices [B, V, 3]."""
    B = pose.shape[0]
    vt = model.v_template[None] if v_template is None else v_template
    vt = jnp.broadcast_to(vt, (B,) + model.v_template.shape).astype(jnp.float32)

    if betas is not None:
        vt = vt + jnp.einsum("vck,bk->bvc", model.shapedirs, betas.astype(jnp.float32))

    joints = jnp.einsum("jv,bvc->bjc", model.J_regressor, vt)        # [B, J, 3]

    R = rodrigues(pose.reshape(B, NUM_JOINTS, 3))                    # [B, J, 3, 3]

    # pose blendshapes from the non-root joint rotations
    eye = jnp.eye(3, dtype=R.dtype)
    pose_feat = (R[:, 1:] - eye).reshape(B, -1)                      # [B, (J-1)*9]
    v_posed = vt + jnp.einsum(
        "bp,pn->bn", pose_feat, model.posedirs
    ).reshape(B, -1, 3)

    # kinematic chain: world transforms per joint (static unroll over 24)
    parents = model.parents
    rel = joints.at[:, 1:].add(-joints[:, [parents[j] for j in range(1, NUM_JOINTS)]])
    transforms = [None] * NUM_JOINTS

    def make_tf(rot, trans):
        top = jnp.concatenate([rot, trans[..., None]], axis=-1)      # [B, 3, 4]
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=rot.dtype), (B, 1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)               # [B, 4, 4]

    transforms[0] = make_tf(R[:, 0], rel[:, 0])
    for j in range(1, NUM_JOINTS):
        transforms[j] = transforms[parents[j]] @ make_tf(R[:, j], rel[:, j])
    A = jnp.stack(transforms, axis=1)                                # [B, J, 4, 4]

    # remove the rest-pose joint locations from the transforms
    joints_h = jnp.concatenate([joints, jnp.zeros((B, NUM_JOINTS, 1))], axis=-1)
    correction = jnp.einsum("bjik,bjk->bji", A, joints_h)
    A = A.at[:, :, :3, 3].add(-correction[:, :, :3])

    # skinning
    T = jnp.einsum("vj,bjik->bvik", model.weights, A)                # [B, V, 4, 4]
    v_h = jnp.concatenate([v_posed, jnp.ones((B, v_posed.shape[1], 1))], axis=-1)
    out = jnp.einsum("bvik,bvk->bvi", T, v_h)
    return out[..., :3]
