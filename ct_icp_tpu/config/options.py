"""Options dataclasses — the full configuration surface of the engine.

Mirrors the reference options structs and their defaults:
  * CTICPOptions            — reference include/ct_icp/ct_icp.h:56-153
  * OdometryOptions         — reference include/ct_icp/odometry.h:32-157
  * Map options/resolutions — reference include/ct_icp/map.h:102-134
  * Neighborhood strategies — reference include/ct_icp/neighborhood_strategy.h:37-146
  * Motion model options    — reference include/ct_icp/motion_model.h:40-90
  * Profiles                — reference src/ct_icp/odometry.cpp:30-151

All dataclasses are frozen (hashable), so a config object can be a static
argument of a jitted function. Fields that the robust-escalation regimen
mutates per attempt (iteration counts, thresholds, sigmas) are *dynamic* at the
solver boundary — escalation does not trigger recompilation (see
icp/registration.py).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional, Tuple


class Solver(enum.Enum):
    GN = "GN"
    CERES = "CERES"          # the reference's LM path; here: damped GN/LM (IRLS)
    ROBUST = "ROBUST"


class LeastSquares(enum.Enum):
    STANDARD = "STANDARD"
    CAUCHY = "CAUCHY"
    HUBER = "HUBER"
    TOLERANT = "TOLERANT"
    TRUNCATED = "TRUNCATED"


class WeightingScheme(enum.Enum):
    PLANARITY = "PLANARITY"
    NEIGHBORHOOD = "NEIGHBORHOOD"
    ALL = "ALL"


class PoseParametrization(enum.Enum):
    SIMPLE = "SIMPLE"
    CONTINUOUS_TIME = "CONTINUOUS_TIME"


class IcpDistance(enum.Enum):
    POINT_TO_PLANE = "POINT_TO_PLANE"
    POINT_TO_POINT = "POINT_TO_POINT"
    POINT_TO_LINE = "POINT_TO_LINE"
    POINT_TO_DISTRIBUTION = "POINT_TO_DISTRIBUTION"


class MotionCompensation(enum.Enum):
    NONE = "NONE"
    CONSTANT_VELOCITY = "CONSTANT_VELOCITY"
    ITERATIVE = "ITERATIVE"
    CONTINUOUS = "CONTINUOUS"


class Initialization(enum.Enum):
    INIT_NONE = "INIT_NONE"
    INIT_CONSTANT_VELOCITY = "INIT_CONSTANT_VELOCITY"


class SamplingOption(enum.Enum):
    NONE = "NONE"
    GRID = "GRID"
    ADAPTIVE = "ADAPTIVE"


class MotionModelType(enum.Enum):
    CONSTANT_VELOCITY = "CONSTANT_VELOCITY"
    SMALL_VELOCITY = "SMALL_VELOCITY"


# --------------------------------------------------------------------- map —

@dataclasses.dataclass(frozen=True)
class ResolutionParam:
    """One resolution level of the multi-resolution voxel map.

    Reference map.h:109-113; capacity/slot sizes are the TPU additions that
    turn the unbounded robin_map into fixed device arrays.
    """

    resolution: float = 0.5
    min_distance_between_points: float = 0.1
    max_num_points: int = 40       # points per voxel (reference: max_num_points)
    capacity_log2: int = 19        # 2**capacity_log2 voxel slots in the hash table


@dataclasses.dataclass(frozen=True)
class MultiResolutionVoxelMapOptions:
    """Reference MultipleResolutionVoxelMap::Options (map.h:115-134)."""

    resolutions: Tuple[ResolutionParam, ...] = (
        ResolutionParam(0.2, 0.03, 50, 20),
        ResolutionParam(0.5, 0.1, 40, 19),
        ResolutionParam(1.5, 0.15, 40, 17),
    )
    select_valid_normals_direction: bool = True
    max_frames_to_keep: int = 100
    default_radius: float = 0.8

    def search_params(self, radius: float):
        """Pick (level, voxel_neighborhood) for a search radius.

        Replicates SearchParamsFromRadiusSearch (map.h:416-432): the last level
        whose resolution <= radius (clamped to level 0).
        """
        import math
        idx = 0
        for i, r in enumerate(self.resolutions):
            if r.resolution <= radius:
                idx = i
        res = self.resolutions[idx].resolution
        return idx, int(math.ceil(radius / res))


# ------------------------------------------------------- neighbor strategy —

@dataclasses.dataclass(frozen=True)
class NearestNeighborStrategyOptions:
    """Reference DefaultNearestNeighborStrategy (neighborhood_strategy.h:60-85)."""

    max_num_neighbors: int = 20
    min_num_neighbors: int = 8


@dataclasses.dataclass(frozen=True)
class DistanceBasedStrategyOptions:
    """Reference DistanceBasedStrategy (neighborhood_strategy.h:95-146):
    search radius grows with the point's distance to the sensor."""

    max_num_neighbors: int = 20
    min_num_neighbors: int = 8
    distance_max: float = 60.0
    radius_min: float = 0.1
    radius_max: float = 2.0
    exponent: float = 1.0

    def compute_radius(self, distance_to_sensor):
        """alpha = (min(|d|, r_max)/r_max)^exp; r = a*r_max + (1-a)*r_min.

        (Reference neighborhood_strategy.h:124-129 — note it clamps the
        distance by radius_max, not distance_max; replicated as-is.)
        """
        import numpy as np
        alpha = (np.minimum(np.abs(distance_to_sensor), self.radius_max)
                 / self.radius_max) ** self.exponent
        return alpha * self.radius_max + (1.0 - alpha) * self.radius_min


# -------------------------------------------------------------- motion model —

@dataclasses.dataclass(frozen=True)
class MotionModelOptions:
    """Reference PreviousFrameMotionModel::Options (motion_model.h:42-58)."""

    model: MotionModelType = MotionModelType.CONSTANT_VELOCITY
    beta_location_consistency: float = 0.001
    beta_constant_velocity: float = 0.001
    beta_small_velocity: float = 0.0
    beta_orientation_consistency: float = 0.0
    threshold_orientation_deg: float = 15.0
    threshold_translation_diff: float = 0.3
    log_if_invalid: bool = True


# ----------------------------------------------------------------- sampling —

@dataclasses.dataclass(frozen=True)
class AdaptiveGridSamplingOptions:
    """Distance-banded voxel sizes (reference algorithm/sampling.h:13-26).

    ``distance_voxel_size`` pairs (band lower edge, voxel size); a point at
    range d uses the voxel size of the last band whose edge is < d. Points
    closer than the first edge or at/beyond the last edge are dropped
    (reference sampling.h:74-76). The last pair's voxel size is unused.
    """

    distance_voxel_size: Tuple[Tuple[float, float], ...] = (
        (0.5, 0.1), (2.0, 0.2), (4.0, 0.4), (8.0, 0.8), (16.0, 1.6), (200.0, -1.0),
    )
    num_points_per_voxel: int = 1
    max_num_points: int = -1


# ---------------------------------------------------------------------- ICP —

@dataclasses.dataclass(frozen=True)
class CTICPOptions:
    """Reference CTICPOptions (ct_icp.h:56-153), same defaults."""

    num_iters_icp: int = 5
    parametrization: PoseParametrization = PoseParametrization.CONTINUOUS_TIME
    distance: IcpDistance = IcpDistance.POINT_TO_PLANE
    solver: Solver = Solver.CERES

    # robustness scheme
    max_num_residuals: int = -1
    min_num_residuals: int = 100
    weighting_scheme: WeightingScheme = WeightingScheme.ALL
    weight_alpha: float = 0.9
    weight_neighborhood: float = 0.1

    # neighborhood params
    power_planarity: float = 2.0
    max_number_neighbors: int = 20
    min_number_neighbors: int = 20
    threshold_voxel_occupancy: int = 1
    estimate_normal_from_neighborhood: bool = True
    num_closest_neighbors: int = 1

    # stop criteria
    threshold_orientation_norm: float = 0.0001  # degrees
    threshold_translation_norm: float = 0.001   # meters

    point_to_plane_with_distortion: bool = True

    # LM / least squares params (reference "CERES solver specific")
    loss_function: LeastSquares = LeastSquares.CAUCHY
    ls_max_num_iters: int = 1
    ls_num_threads: int = 16          # kept for config parity; unused on TPU
    ls_sigma: float = 0.1
    ls_tolerant_min_threshold: float = 0.05

    # GN params
    max_dist_to_plane_ct_icp: float = 0.3

    # ROBUST solver params
    threshold_linearity: float = 0.8
    threshold_planarity: float = 0.8
    weight_point_to_point: float = 0.1
    outlier_distance: float = 1.0
    use_barycenter: bool = False
    use_lines: bool = True
    use_distribution: bool = True

    # output/debug
    output_weights: bool = False
    output_normals: bool = False
    debug_print: bool = False

    # --------------------------------------------- TPU search-path knobs —
    # ball_neighborhood: estimate descriptors from ALL in-radius candidates
    # instead of the k nearest (drops the top-k sort — the reference's
    # max_number_neighbors cap only bounds CPU work). False = exact k-NN
    # parity with the reference search (neighborhood_strategy.h:60-85).
    ball_neighborhood: bool = True
    # in ball mode, cap descriptor moments to ~the max_number_neighbors
    # nearest candidates via an adaptive histogram radius (restores the
    # reference's k-NN normal locality; False = whole-ball moments).
    knn_moments: bool = True
    # analytic cross-product CT Jacobians (reference GN linearization,
    # ct_icp.cpp:813-850) instead of exact autodiff through the slerp.
    # Cheaper per LM iteration at large K; measured +18% APE on the driving
    # bench, so OFF by default (exact autodiff = CERES-path parity).
    analytic_jacobian: bool = False
    # candidate-plane cache policy (ball mode): fresh neighbor gathers for
    # the first N ICP iterations; later iterations re-score the cached
    # candidate planes unless the pose moved > voxel/2 since the last
    # gather. Set >= num_iters_icp to gather every iteration (exact parity
    # with the reference's per-iteration search, ct_icp.cpp:561-604).
    regather_iters: int = 1


# ----------------------------------------------------------------- odometry —

@dataclasses.dataclass(frozen=True)
class BackendOptions:
    """Sliding-window CT bundle-adjustment backend (odometry/backend.py).

    A capability beyond the reference (which has no backend thread): every
    ``period`` registered frames, jointly refine the last ``window``
    keyframes' begin/end poses against the current map with the distributed
    CT-BA step (parallel/ct_ba.py), then — when ``replay`` — re-point the
    retained frame clouds at the refined poses and replay them into the map
    (evict + re-insert), so refinements compound instead of being overwritten
    by the next insert. Requires map_options.max_frames_to_keep >= window
    for replay to cover the refined frames.
    """

    enabled: bool = False
    window: int = 8          # keyframes jointly refined
    period: int = 8          # refine every N registered frames
    num_steps: int = 2       # outer CT-BA steps per refinement
    keep_first_frames: int = 2   # anchor frames never refined
    # replay: propagate refined poses into the map (evict + re-insert the
    # retained frames). Sound for REVISITING/static regimes, where the
    # frame ring covers the evicted geometry and refinements compound
    # (measured -20%+ error on an under-converged room, tests/test_ct_ba).
    # UNSOUND for traversal: each surface is seen by only a few
    # consecutive frames, so eviction erases non-ring history and the
    # refine->replay->re-localize loop amplifies drift (round-4
    # measurement, tools/ab_backend.py: 96-frame urban drive mean APE
    # 0.38 off / 0.42 refine-only / 0.63 with replay; 500 frames with
    # replay diverges outright, 15.8 %Tr with 243 failures). Default OFF.
    replay: bool = False
    # weighting (see odometry/backend.py make_assemble_fn): pose-anchor
    # prior weight (pins the point-to-plane tangential null space) and
    # continuity-edge beta, both absolute vs a point block of strength 10
    prior_weight: float = 1.5
    continuity_beta: float = 2.0


@dataclasses.dataclass(frozen=True)
class OdometryOptions:
    """Reference OdometryOptions (odometry.h:32-157), same defaults."""

    ct_icp_options: CTICPOptions = dataclasses.field(default_factory=CTICPOptions)
    motion_compensation: MotionCompensation = MotionCompensation.CONTINUOUS
    initialization: Initialization = Initialization.INIT_CONSTANT_VELOCITY

    # initialization regimen
    init_voxel_size: float = 0.2
    init_sample_voxel_size: float = 1.0
    init_num_frames: int = 20

    # sampling
    sample_voxel_size: float = 1.5
    max_num_keypoints: int = -1
    sampling: SamplingOption = SamplingOption.GRID
    adaptive_options: AdaptiveGridSamplingOptions = dataclasses.field(
        default_factory=AdaptiveGridSamplingOptions)

    # map
    map_options: MultiResolutionVoxelMapOptions = dataclasses.field(
        default_factory=MultiResolutionVoxelMapOptions)
    neighborhood_strategy: NearestNeighborStrategyOptions = dataclasses.field(
        default_factory=NearestNeighborStrategyOptions)
    distance_strategy: Optional[DistanceBasedStrategyOptions] = None

    size_voxel_map: float = 1.0
    max_num_points_in_voxel: int = 20
    voxel_neighborhood: int = 1
    max_radius_neighborhood: float = 0.8
    min_distance_points: float = 0.1

    # frame construction
    voxel_size: float = 0.5
    max_distance: float = 100.0

    # validity checks
    distance_error_threshold: float = 5.0
    orientation_error_threshold: float = 30.0
    quit_on_error: bool = True

    # robust regimen
    robust_minimal_level: int = 0
    robust_registration: bool = False
    robust_full_voxel_threshold: float = 0.7
    robust_empty_voxel_threshold: float = 0.1
    robust_neighborhood_min_dist: float = 0.10
    robust_neighborhood_min_orientation: float = 0.1
    robust_relative_trans_threshold: float = 1.0
    robust_fail_early: bool = False
    robust_num_attempts: int = 6
    robust_num_attempts_when_rotation: int = 2
    robust_max_voxel_neighborhood: int = 3
    robust_threshold_ego_orientation: float = 3.0
    robust_threshold_relative_orientation: float = 3.0

    # insertion heuristics
    insertion_ego_rotation_threshold: float = 3.0
    insertion_threshold_frames_skipped: float = 5.0
    insertion_cum_distance_threshold: float = 0.8
    insertion_cum_orientation_threshold: float = 5.0

    always_insert: bool = False
    do_no_insert: bool = False
    debug_print: bool = False
    # per-phase ICP timing (reference ICPSummary durations, ct_icp.h:155-169):
    # drive the same jitted phase kernels from a host loop with a sync point
    # per phase so init/neighborhood/solve durations are real wall times.
    # Forces the staged (non-fused) path — observability, not throughput.
    profile_registration: bool = False
    log_to_file: bool = False
    log_file_destination: str = "/tmp/ct_icp_tpu.log"

    default_motion_model: MotionModelOptions = dataclasses.field(
        default_factory=MotionModelOptions)
    with_default_motion_model: bool = True

    # sliding-window CT-BA backend (off by default, like every capability
    # the reference's shipped profiles don't enable)
    backend: BackendOptions = dataclasses.field(default_factory=BackendOptions)

    # ------------------------------------------------ TPU shape configuration —
    # Static capacities that turn the dynamic-size reference pipeline into a
    # fixed-shape XLA program. Scans/keypoint sets are padded+masked to these.
    max_scan_points: int = 1 << 17        # raw scan capacity (KITTI HDL-64 ~130k)
    max_subsampled_points: int = 1 << 16  # after voxel-grid subsample
    # voxel-dedup scans on the HOST (numpy, in the prefetch worker) and
    # upload only the subsample: on a remote-TPU tunnel the scan upload
    # binds streaming throughput (~14 ms/frame for 131k points), not device
    # compute. The device grid subsample is idempotent on the deduped scan.
    host_subsample: bool = True
    max_keypoints: int = 4096             # after grid sampling
    max_dirty_voxels: int = 1 << 15       # voxels touched per map insert
    # Map-insert election-round budget (= points a voxel may gain per frame;
    # see voxel_map.insert_points) for the first ``bootstrap_frames`` frames.
    # The reference has no such cap. Default 12: at the steady-state budget
    # of 4 the 1-frame bootstrap map can starve below min_number_neighbors
    # at radius 0.75 and frame 1 fails outright — round 3 found the round-2
    # driving bench SURVIVED ONLY BY LUCK of its seed-3 draw (frame 1 had
    # 36 residuals; re-drawn scans gave < 20, and every other seed
    # catastrophically failed: 79/80 frame failures, 23 m APE). The robust
    # default costs ~+0.03 m APE on the lucky draw (0.06 -> 0.09) and
    # converts every unlucky draw from total failure to ~0.10 m tracking.
    bootstrap_insert_rounds: int = 12
    bootstrap_frames: int = 3
    # keep per-frame corrected world points on the host (for visualization /
    # callbacks); forces the staged multi-dispatch path instead of the fused
    # single-dispatch frame step
    keep_corrected_points: bool = False


def default_driving_profile() -> OdometryOptions:
    """The driving configuration the reference ships and benchmarks with
    (config/odometry/driving_config.yaml): a single 0.8 m map resolution with
    radius-0.75 searches, 900-residual cap, 5 LM steps per ICP iteration.

    (OdometryOptions::DefaultDrivingProfile, odometry.cpp:30-36, only sets
    solver/iters on top of the C++ defaults — the shipped YAML is the
    configuration behind the regression baselines.)
    """
    return OdometryOptions(
        map_options=MultiResolutionVoxelMapOptions(
            resolutions=(ResolutionParam(0.8, 0.1, 30, 18),),
            default_radius=0.75),
        neighborhood_strategy=NearestNeighborStrategyOptions(
            max_num_neighbors=20, min_num_neighbors=10),
        ct_icp_options=CTICPOptions(
            solver=Solver.CERES,
            num_iters_icp=5,
            max_num_residuals=900,
            min_num_residuals=100,
            threshold_orientation_norm=0.1,
            threshold_translation_norm=0.01,
            loss_function=LeastSquares.CAUCHY,
            # DELIBERATE deviation: reference default 20 (ct_icp.h:91). 40
            # is the knn-moments cap that holds the <= 0.5 %Tr north star
            # on the 500-frame urban drive. Round-4 cross-gate A/B
            # (tools/ab_mnn.py, 3 seeds each): long %Tr 0.545 -> 0.461
            # (every seed <= 0.464), corridor APE 0.0576 -> 0.0587 (bound
            # 0.07), throughput within noise (dynamic scalar — the cap
            # only widens the adaptive-radius histogram target).
            max_number_neighbors=40,
            # DELIBERATE deviation: the reference DefaultDrivingProfile
            # leaves the base default of 1 (ct_icp.h:120). Round-2 A/B kept
            # 5 (1 wins short-horizon, loses at 80 frames). Round 4, with
            # the ceres function_tolerance convergence exit in the LM inner
            # loop, re-ran the gate A/B: ls 5/3/2 give 3-seed APE
            # 0.0587/0.0587/0.0584 (identical to the pinned digit) at
            # 101/105/103 fps — the inner loop converges by ~3 steps and
            # the cap only trims converged iterations. 3 keeps a safety
            # step over the measured convergence point.
            ls_max_num_iters=3,
            ls_sigma=0.1,
        ))


def robust_driving_profile() -> OdometryOptions:
    """Reference OdometryOptions::RobustDrivingProfile (odometry.cpp:38-90).

    TPU deviation: the map keeps ONE 0.5 m level instead of the reference's
    default {0.2, 0.5, 1.5} triple. This profile's solver (CERES, fixed
    default_radius=0.8) only ever searches the 0.5 m level
    (SearchParamsFromRadiusSearch picks the last level <= radius); on TPU the
    unsearched levels are not lazily-allocated robin_maps but fixed device
    arrays whose insert scatters cost ~1/3 of the frame — pure waste.
    Multi-level maps remain fully supported (see MultiResolutionVoxelMapOptions
    and the distance-strategy profiles that do search multiple radii).
    """
    return OdometryOptions(
        voxel_size=0.5,
        map_options=MultiResolutionVoxelMapOptions(
            resolutions=(ResolutionParam(0.5, 0.1, 40, 19),),
            default_radius=0.8),
        sample_voxel_size=1.5,
        max_distance=200.0,
        min_distance_points=0.05,
        init_num_frames=40,
        max_num_points_in_voxel=20,
        distance_error_threshold=5.0,
        motion_compensation=MotionCompensation.CONTINUOUS,
        initialization=Initialization.INIT_CONSTANT_VELOCITY,
        robust_registration=True,
        robust_full_voxel_threshold=0.5,
        robust_empty_voxel_threshold=0.2,
        robust_num_attempts=10,
        robust_max_voxel_neighborhood=4,
        robust_threshold_relative_orientation=5.0,
        robust_threshold_ego_orientation=5.0,
        default_motion_model=MotionModelOptions(
            beta_constant_velocity=0.001,
            beta_location_consistency=0.001,
            beta_small_velocity=0.0),
        ct_icp_options=CTICPOptions(
            max_number_neighbors=20,
            min_number_neighbors=20,
            num_iters_icp=15,
            max_dist_to_plane_ct_icp=0.5,
            threshold_orientation_norm=0.01,
            point_to_plane_with_distortion=True,
            distance=IcpDistance.POINT_TO_PLANE,
            parametrization=PoseParametrization.CONTINUOUS_TIME,
            num_closest_neighbors=1,
            loss_function=LeastSquares.CAUCHY,
            solver=Solver.CERES,
            ls_max_num_iters=20,
            ls_sigma=0.2,
            ls_tolerant_min_threshold=0.05,
        ),
    )


def default_robust_outdoor_low_inertia() -> OdometryOptions:
    """Reference OdometryOptions::DefaultRobustOutdoorLowInertia
    (odometry.cpp:92-152) — the NCLT profile."""
    return OdometryOptions(
        voxel_size=0.3,
        sample_voxel_size=1.5,
        min_distance_points=0.1,
        max_distance=200.0,
        init_num_frames=20,
        max_num_points_in_voxel=20,
        distance_error_threshold=5.0,
        motion_compensation=MotionCompensation.CONTINUOUS,
        initialization=Initialization.INIT_NONE,
        size_voxel_map=0.8,
        voxel_neighborhood=1,
        robust_registration=True,
        robust_full_voxel_threshold=0.5,
        robust_empty_voxel_threshold=0.1,
        robust_num_attempts=3,
        robust_max_voxel_neighborhood=4,
        robust_threshold_relative_orientation=2.0,
        robust_threshold_ego_orientation=2.0,
        default_motion_model=MotionModelOptions(
            beta_constant_velocity=0.0,
            beta_location_consistency=0.0,
            beta_small_velocity=0.001,
            beta_orientation_consistency=0.0),
        ct_icp_options=CTICPOptions(
            num_iters_icp=30,
            threshold_voxel_occupancy=5,
            min_number_neighbors=20,
            max_number_neighbors=20,
            max_dist_to_plane_ct_icp=0.5,
            threshold_orientation_norm=0.01,
            point_to_plane_with_distortion=True,
            distance=IcpDistance.POINT_TO_PLANE,
            parametrization=PoseParametrization.CONTINUOUS_TIME,
            num_closest_neighbors=1,
            loss_function=LeastSquares.CAUCHY,
            solver=Solver.CERES,
            ls_max_num_iters=10,
            ls_sigma=0.2,
            ls_tolerant_min_threshold=0.05,
            weight_neighborhood=0.2,
            weight_alpha=0.8,
            weighting_scheme=WeightingScheme.ALL,
            max_num_residuals=600,
            min_num_residuals=200,
        ),
    )
