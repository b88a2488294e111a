"""SMPL module tests: Rodrigues conversions (vs OpenCV oracle) and LBS
(SURVEY §4 implication 3)."""

import numpy as np
import pytest

from cape_tpu.smpl.joints import CLOTH_JOINT_IDX, filter_cloth_pose
from cape_tpu.smpl.lbs import SMPLModel, lbs
from cape_tpu.smpl.rodrigues import pose_to_rotmats, rotmats_to_pose


def test_pose_rot_roundtrip():
    rng = np.random.default_rng(0)
    pose = 0.8 * rng.standard_normal((5, 72))
    rot = pose_to_rotmats(pose)
    assert rot.shape == (5, 216)
    back = rotmats_to_pose(rot)
    np.testing.assert_allclose(back, pose, atol=1e-6)


def test_rodrigues_matches_opencv():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    pose = rng.standard_normal((3, 72))
    ours = pose_to_rotmats(pose).reshape(3, 24, 3, 3)
    for n in range(3):
        for j in range(24):
            want, _ = cv2.Rodrigues(pose[n].reshape(24, 3)[j])
            np.testing.assert_allclose(ours[n, j], want, atol=1e-6)


def test_rotmats_are_orthonormal():
    rng = np.random.default_rng(2)
    rot = pose_to_rotmats(rng.standard_normal((4, 72))).reshape(-1, 3, 3)
    eye = np.eye(3)
    for R in rot:
        np.testing.assert_allclose(R @ R.T, eye, atol=1e-6)
        assert np.linalg.det(R) > 0.99


def test_filter_cloth_pose():
    rng = np.random.default_rng(3)
    pose72 = rng.standard_normal((2, 72))
    out = filter_cloth_pose(pose72)
    assert out.shape == (2, 42)
    np.testing.assert_array_equal(
        out.reshape(2, 14, 3), pose72.reshape(2, 24, 3)[:, CLOTH_JOINT_IDX]
    )
    rot216 = rng.standard_normal((2, 216))
    assert filter_cloth_pose(rot216).shape == (2, 126)


@pytest.fixture(scope="module")
def rig(small_mesh):
    verts, faces = small_mesh
    return SMPLModel.synthetic(verts, faces)


def test_lbs_zero_pose_is_identity(rig):
    pose = np.zeros((2, 72), np.float32)
    out = np.asarray(lbs(rig, pose))
    want = np.broadcast_to(np.asarray(rig.v_template)[None], out.shape)
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_lbs_global_rotation_is_rigid(rig):
    """Rotating only the root applies a rigid rotation about the root joint."""
    angle = np.array([0.0, 0.0, np.pi / 2], np.float32)
    pose = np.zeros((1, 72), np.float32)
    pose[0, :3] = angle
    out = np.asarray(lbs(rig, pose))[0]
    vt = np.asarray(rig.v_template)
    root = np.asarray(rig.J_regressor)[0] @ vt
    Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=np.float64)
    want = (vt - root) @ Rz.T + root
    np.testing.assert_allclose(out, want, atol=1e-4)


def test_lbs_template_override(rig):
    """Per-sample v_template override (reference demos.py:267 semantics)."""
    rng = np.random.default_rng(4)
    vt = np.asarray(rig.v_template)
    override = (vt[None] + 0.01 * rng.standard_normal((2,) + vt.shape)).astype(np.float32)
    out = np.asarray(lbs(rig, np.zeros((2, 72), np.float32), v_template=override))
    np.testing.assert_allclose(out, override, atol=1e-5)


def _smplx_lbs_oracle(model, pose, betas, v_template):
    """Straight-line numpy float64 transcription of the published SMPL
    forward exactly as smplx implements it (smplx/lbs.py `lbs`,
    `batch_rigid_transform`, `blend_shapes` — the torch library the
    reference calls at /root/reference/demos.py:267-283): per-sample
    loops, homogeneous 4x4 transform chain built relative-then-absolute,
    rest-joint correction via F_k = A_k - pack(A_k @ [j_k, 0]). The
    structural golden for cape_tpu.smpl.lbs until the license-gated SMPL
    .pkl + smplx itself are available (ROADMAP)."""
    J_reg = np.asarray(model.J_regressor, np.float64)
    W = np.asarray(model.weights, np.float64)
    shapedirs = np.asarray(model.shapedirs, np.float64)
    posedirs = np.asarray(model.posedirs, np.float64)
    parents = list(model.parents)
    B, J = pose.shape[0], len(parents)

    out = np.zeros((B,) + v_template.shape[1:], np.float64)
    for b in range(B):
        # blend_shapes: v_shaped = template + shapedirs . betas
        v_shaped = v_template[b].astype(np.float64) + shapedirs @ betas[b]
        joints = J_reg @ v_shaped                              # [J, 3]
        # batch_rodrigues on each axis-angle triple
        R = np.zeros((J, 3, 3))
        for j in range(J):
            aa = pose[b, 3 * j:3 * j + 3].astype(np.float64)
            angle = np.linalg.norm(aa)
            if angle < 1e-12:
                R[j] = np.eye(3)
                continue
            axis = aa / angle
            K = np.array([
                [0, -axis[2], axis[1]],
                [axis[2], 0, -axis[0]],
                [-axis[1], axis[0], 0],
            ])
            R[j] = np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * (K @ K)
        # pose blendshapes from non-root rotations
        pose_feature = (R[1:] - np.eye(3)).reshape(-1)          # [(J-1)*9]
        v_posed = v_shaped + (pose_feature @ posedirs).reshape(-1, 3)
        # batch_rigid_transform: relative joints, chain of 4x4s
        rel = joints.copy()
        rel[1:] -= joints[[parents[j] for j in range(1, J)]]
        A = np.zeros((J, 4, 4))
        for j in range(J):
            T = np.eye(4)
            T[:3, :3] = R[j]
            T[:3, 3] = rel[j]
            A[j] = T if j == 0 else A[parents[j]] @ T
        # remove rest-pose joint locations: F = A - pack(A @ [joint, 0])
        for j in range(J):
            A[j, :3, 3] -= A[j, :3, :3] @ joints[j]
        T = np.einsum("vj,jik->vik", W, A)                      # [V, 4, 4]
        v_h = np.concatenate([v_posed, np.ones((len(v_posed), 1))], axis=1)
        out[b] = np.einsum("vik,vk->vi", T, v_h)[:, :3]
    return out


def test_lbs_matches_smplx_transcription_oracle(rig):
    """Full articulated parity — random pose + betas + per-sample template
    override — against the independent numpy transcription above. Covers
    the wiring the identity/rigid tests cannot (pose-blendshape feature
    order, kinematic-chain composition, rest-joint correction)."""
    rng = np.random.default_rng(11)
    vt = np.asarray(rig.v_template)
    B = 3
    pose = (0.4 * rng.standard_normal((B, 72))).astype(np.float32)
    betas = (0.5 * rng.standard_normal((B, 10))).astype(np.float32)
    override = (vt[None] + 0.01 * rng.standard_normal((B,) + vt.shape)).astype(
        np.float32
    )
    got = np.asarray(lbs(rig, pose, betas=betas, v_template=override))
    want = _smplx_lbs_oracle(rig, pose, betas, override)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-5 * scale)


def test_lbs_jit_compatible(rig):
    import jax

    f = jax.jit(lambda pose: lbs(rig, pose))
    out = f(np.zeros((1, 72), np.float32))
    assert out.shape == (1,) + np.asarray(rig.v_template).shape
