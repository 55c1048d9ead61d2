"""Static configuration for the SLAM engine.

Replaces the reference's OpenCV-YAML settings file + hard-coded constants
(reference src/Tracking.cc:93-218 parses camera/ORB params; thresholds are
sprinkled at call sites — collected here with their origins cited).
Everything is static/hashable so configs can be closed over by jit.
"""

from __future__ import annotations

from typing import NamedTuple

from ..ops.camera import CameraParams
from ..ops.orb.extractor import OrbConfig


class Capacities(NamedTuple):
    """Fixed array capacities (the TPU substitute for dynamic containers)."""

    max_keyframes: int = 256
    max_points: int = 65536
    local_points: int = 2048   # frustum-visible local map points per frame
    local_keyframes: int = 80  # reference caps the local-KF set at 80 (Tracking.cc:1964)
    # Local bundle adjustment window (reference uses current + all covisible
    # KFs free and all other observers fixed, Optimizer.cc:640-724; here the
    # window is capacity-bounded by covisibility ranking)
    ba_free_kfs: int = 12
    ba_fixed_kfs: int = 12
    ba_points: int = 4096
    # GN iteration budget for the per-keyframe local BA (pre/post outlier
    # gate).  The reference uses 5+10 (Optimizer.cc:863-917); 3+5 converges
    # to the same ATE on the synthetic benchmark at ~half the device time.
    ba_iters_pre: int = 3
    ba_iters_post: int = 5
    # Cull-archive ring capacity: retired keyframes log (seq, parent_seq,
    # Tcp) here so trajectory entries referencing them stay resolvable after
    # their slot is reused (reference keeps bad KFs alive with mTcp,
    # src/KeyFrame.cc:571-724).
    cull_log: int = 2048
    # Persisted loop-edge capacity (KeyFrame::AddLoopEdge analogue)
    loop_log: int = 32
    # Sparse BoW entries kept per keyframe (top-T words by TF-IDF weight,
    # ops/bow.py sparse_bow).  Makes the place-recognition database O(K*T)
    # independent of vocabulary size (reference ORBvoc is ~1M leaves, DBoW2
    # TemplatedVocabulary.h:1338).  Exact-equal to dense scoring while a
    # frame has <= T distinct words; beyond that the LOWEST-IDF words are
    # dropped (a tight lower bound of the dense score).
    bow_top: int = 512


class TrackingConfig(NamedTuple):
    # Keyframe policy (reference Tracking::NeedNewKeyFrame, Tracking.cc:1509-1648)
    min_frames_between_kf: int = 0
    max_frames_between_kf: int = 30          # = fps in the reference
    kf_ref_ratio_stereo: float = 0.75        # insert if tracked < 75% of ref (:1621)
    kf_ref_ratio_mono: float = 0.9
    kf_min_close_points: int = 100           # stereo/RGBD close-point rule (:1585-1605)
    kf_min_new_close: int = 70
    # Attrition trigger: insert a keyframe when tracked inliers fall to this
    # fraction of the count at the previous keyframe.  Plays the role of the
    # reference's c1b ("mapping is idle, minFrames elapsed" — which in its
    # threaded design lets keyframes flow almost every frame early on,
    # LocalMapping.cc:141-167) for our deterministic pipelined cadence.
    kf_attrition_ratio: float = 0.6
    # Matching (reference Tracking.cc:1353-1440, ORBmatcher radii)
    motion_search_radius: float = 15.0
    motion_search_radius_wide: float = 30.0
    local_search_radius: float = 3.0         # units of scale, SearchLocalPoints th=1
    min_motion_matches: int = 20
    min_inliers_motion: int = 10
    min_inliers_local: int = 30
    # Depth handling
    depth_threshold_factor: float = 35.0     # ThDepth: close = depth < 35 * baseline
    max_new_points_per_kf: int = 100         # reference creates <=100 close points (:1734 region)
    # Matching ratio for frame-to-frame
    nn_ratio: float = 0.9
    # Initialization: required depth features (reference uses 500 at VGA,
    # Tracking.cc:791; scale down for smaller images)
    min_init_depth_points: int = 100
    # RGB-D u_right information weight (sigma_ur = 1/sqrt(w) px).  Depth
    # sensors measure depth to ~1%, far better than the 1px-disparity noise
    # the reference's uniform weighting assumes; the extra weight anchors
    # translation-along-view drift in low-parallax scenes.
    rgbd_ur_weight: float = 25.0
    # Monocular initialization gates.  The reference demands >=100 matches
    # with its DOUBLED init extractor (2x nFeatures, Tracking.cc:121); these
    # scale to the configured feature budget.
    mono_init_min_matches: int = 60
    mono_init_min_points: int = 40
    mono_init_min_parallax: float = 2.0  # degrees; reject low-baseline inits
    # mono keyframes must come faster (no depth seeding; reference uses
    # thRefRatio=0.9 for mono vs 0.75 stereo, Tracking.cc:1575)
    kf_attrition_ratio_mono: float = 0.9
    # Run global BA after each loop closure (reference
    # RunGlobalBundleAdjustment).  Disable for workloads where observations
    # deliberately encode non-physical map edits (tests), or very large maps.
    enable_loop_gba: bool = True
    # Keyframe-cull redundancy threshold: a covisible KF whose points are
    # observed by >= 3 other keyframes at this fraction or more is retired
    # (reference LocalMapping::KeyFrameCulling 0.9, src/LocalMapping.cc:952).
    kf_cull_redundancy: float = 0.9
    # Covisibility-consistency chaining: a loop candidate's covisibility
    # group must be re-detected in this many consecutive keyframes before
    # Sim3 correction is applied (reference mnCovisibilityConsistencyTh=3,
    # LoopClosing.cc:56, groups :229-305).  3 matches the reference; the
    # Sim3 gate (RANSAC + GN polish, >=20 inliers) additionally protects
    # against false positives, so 1 is a usable low-latency setting for
    # short sequences.
    loop_consistency_th: int = 3


class SlamConfig(NamedTuple):
    camera: CameraParams
    orb: OrbConfig = OrbConfig()
    caps: Capacities = Capacities()
    tracking: TrackingConfig = TrackingConfig()
    sensor: str = "rgbd"  # "mono" | "stereo" | "rgbd"
    depth_map_factor: float = 1.0
    # Trained BoW vocabulary (ops/bow.py) for relocalization + loop closing;
    # None disables place recognition (reference requires ORBvoc.txt at
    # startup, System.cc:77-89 — here it is optional).
    vocab: object = None
    # Stereo undistort-rectify maps (mx_l, my_l, mx_r, my_r), float32 [H, W]
    # each, applied ON DEVICE to both eyes before extraction (the reference's
    # EuRoC path remaps with cv::remap before tracking,
    # Examples/Stereo/stereo_euroc.cc:45-80 region; maps from
    # utils/rectify.init_undistort_rectify_map).  None = input pre-rectified.
    rect_maps: object = None

    @property
    def ur_weight(self) -> float:
        return self.tracking.rgbd_ur_weight if self.sensor == "rgbd" else 1.0

    @property
    def bow_top(self) -> int:
        """Sparse-BoW row width: capped by the feature budget (a frame can
        never have more distinct words than features)."""
        return min(self.caps.bow_top, self.orb.feat_capacity())

    @property
    def th_depth(self) -> float:
        """Close/far point split: reference mThDepth = bf * ThDepth / fx."""
        return float(self.camera.bf / self.camera.fx * self.tracking.depth_threshold_factor)
