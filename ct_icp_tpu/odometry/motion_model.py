"""Motion models: trajectory priors + prediction (host side).

Counterparts of the reference's AMotionModel hierarchy
(reference include/ct_icp/motion_model.h, src/ct_icp/motion_model.cpp):
the constraint rows themselves live on device (icp/residuals.py
motion_prior_residuals); this module provides prediction, validity checks and
state management.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ct_icp_tpu.config.options import MotionModelOptions, MotionModelType
from ct_icp_tpu.core.pose import Pose, TrajectoryFrame
from ct_icp_tpu.icp.registration import make_prior


class PreviousFrameMotionModel:
    """Reference PreviousFrameMotionModel (motion_model.cpp:12-115)."""

    def __init__(self, options: MotionModelOptions = MotionModelOptions()):
        self.options = options
        self.previous_frame = TrajectoryFrame()

    def reset(self):
        self.previous_frame = TrajectoryFrame()

    def update_state(self, optimized_frame: TrajectoryFrame, frame_index: int):
        self.previous_frame = optimized_frame.copy()

    def next_frame(self) -> TrajectoryFrame:
        """Predict the next frame (motion_model.cpp:85-103)."""
        prev = self.previous_frame
        nxt = prev.copy()
        dt = prev.end_pose.timestamp - prev.begin_pose.timestamp
        nxt.end_pose.timestamp = prev.end_pose.timestamp + dt
        if self.options.model == MotionModelType.CONSTANT_VELOCITY:
            nxt.begin_pose = prev.end_pose.copy()
            rel = prev.begin_pose.inverse() * prev.end_pose
            moved = rel * prev.end_pose
            nxt.end_pose.quat = moved.quat
            nxt.end_pose.tr = moved.tr
            return nxt
        nxt.begin_pose.quat = prev.end_pose.quat.copy()
        nxt.begin_pose.tr = prev.end_pose.tr.copy()
        nxt.end_pose.quat = prev.end_pose.quat.copy()
        nxt.end_pose.tr = prev.end_pose.tr.copy()
        return nxt

    def is_valid(self, frame: TrajectoryFrame) -> bool:
        """Compare prediction with the optimized frame (motion_model.cpp:64-82)."""
        pred = self.next_frame()
        o = self.options
        return (pred.begin_pose.angular_distance(frame.begin_pose) < o.threshold_orientation_deg
                and pred.end_pose.angular_distance(frame.end_pose) < o.threshold_orientation_deg
                and pred.begin_pose.location_distance(frame.begin_pose) < o.threshold_translation_diff
                and pred.end_pose.location_distance(frame.end_pose) < o.threshold_translation_diff)

    def device_prior(self, origin: np.ndarray) -> np.ndarray:
        """Packed prior vector for the solver (see registration.make_prior)."""
        return make_prior(self.previous_frame, self.options, origin)


@dataclasses.dataclass
class PredictionConsistencyOptions:
    """Reference PredictionConsistencyModel::Options (motion_model.h:96-110)."""

    alpha_begin_tr_constraint: float = 0.0
    alpha_end_tr_constraint: float = 0.0
    alpha_begin_rot_constraint: float = 0.0
    alpha_end_rot_constraint: float = 0.0
    alpha_relative_rot_constraint: float = 100.0
    alpha_relative_tr_constraint: float = 60.0
    beta_scale_rot_deg: float = 1.0
    beta_scale_tr_m: float = 0.1
    threshold_rot_deg: float = 5.0
    threshold_tr_m: float = 0.5
    log_if_invalid: bool = True


class PredictionConsistencyModel:
    """Constraints against an externally supplied prediction
    (reference motion_model.cpp:117-283). The validity check and prediction
    are implemented here; its Ceres constraint rows are approximated by the
    same location/orientation prior rows anchored at the prediction."""

    def __init__(self, options: PredictionConsistencyOptions = PredictionConsistencyOptions()):
        self.options = options
        self.prediction = TrajectoryFrame()

    def set_prediction(self, frame: TrajectoryFrame):
        self.prediction = frame.copy()

    def next_frame(self) -> TrajectoryFrame:
        return self.prediction.copy()

    def update_state(self, optimized_frame: TrajectoryFrame, frame_index: int):
        pass

    def reset(self):
        self.prediction = TrajectoryFrame()

    def is_valid(self, frame: TrajectoryFrame) -> bool:
        o = self.options
        return (self.prediction.begin_pose.angular_distance(frame.begin_pose) < o.threshold_rot_deg
                and self.prediction.end_pose.angular_distance(frame.end_pose) < o.threshold_rot_deg
                and self.prediction.begin_pose.location_distance(frame.begin_pose) < o.threshold_tr_m
                and self.prediction.end_pose.location_distance(frame.end_pose) < o.threshold_tr_m)
