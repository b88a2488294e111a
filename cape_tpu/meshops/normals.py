"""Triangle and vertex normal estimation, pure JAX.

Replaces the reference's TF port of psbody triangle geometry
(lib/utils.py:119-152: TriNormals / TriNormalsScaled / NormalizedNx3) and
the faces-by-vertex normal averaging (lib/losses.py:54-97). Used by the
normal-consistency losses and available to demo tooling.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def face_normals_scaled(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized face normals (cross products).

    verts: [..., V, 3]; faces: [F, 3] int32. Returns [..., F, 3].
    """
    v0 = jnp.take(verts, faces[:, 0], axis=-2)
    v1 = jnp.take(verts, faces[:, 1], axis=-2)
    v2 = jnp.take(verts, faces[:, 2], axis=-2)
    return jnp.cross(v1 - v0, v2 - v0)


def _safe_normalize(v: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    ss = jnp.sum(jnp.square(v), axis=axis, keepdims=True)
    ss = jnp.where(ss == 0.0, 1.0, ss)  # zero-area faces keep zero normals
    return v / jnp.sqrt(ss)


def face_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Unit face normals ([..., F, 3]); zero for degenerate faces."""
    return _safe_normalize(face_normals_scaled(verts, faces))


def vertex_normal_matrix(faces: np.ndarray, num_verts: int):
    """Host-side [V, F] faces-by-vertex averaging matrix (scipy sparse),
    the reference's faces_by_vertex (lib/losses.py:83-97)."""
    from cape_tpu.meshops.topology import faces_by_vertex

    return faces_by_vertex(faces, num_verts)


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray, ftov_op=None) -> jnp.ndarray:
    """Unit vertex normals by averaging incident unnormalized face normals
    (reference estimate_vertex_normals, lib/losses.py:54-80).

    ftov_op: optional device operator for the [V, F] incidence matrix
    (ops.sparse.make_op of vertex_normal_matrix); falls back to a segment
    sum when None.
    """
    fn = face_normals_scaled(verts, faces)
    if ftov_op is not None:
        acc = ftov_op(fn)
    else:
        V = verts.shape[-2]
        flat_idx = jnp.asarray(np.asarray(faces).reshape(-1))
        fn_rep = jnp.repeat(fn, 3, axis=-2)
        acc = (
            jnp.zeros(verts.shape[:-2] + (V, 3), fn.dtype)
            .at[..., flat_idx, :]
            .add(fn_rep)
        )
    return _safe_normalize(acc)
