from cape_tpu.smpl.joints import CLOTH_JOINT_IDX, SMPL_JOINT_NAMES, filter_cloth_pose
from cape_tpu.smpl.rodrigues import pose_to_rotmats, rotmats_to_pose
from cape_tpu.smpl.lbs import SMPLModel, lbs
