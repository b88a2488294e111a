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


def test_lbs_jit_compatible(rig):
    import jax

    f = jax.jit(lambda pose: lbs(rig, pose))
    out = f(np.zeros((1, 72), np.float32))
    assert out.shape == (1,) + np.asarray(rig.v_template).shape
