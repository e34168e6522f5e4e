"""Configuration for the TPU-native SLAM engine.

One frozen-dataclass tree replaces the reference's three config tiers
(launch-file ROS params -> ``ORBParameters`` struct at ``Tracking.h:55-63``,
dynamic_reconfigure, legacy YAML; see ``ros/src/Node.cc:318-379``) and its
scattered hardcoded constants (grid 64x48 ``Frame.h:37-38``, covisibility
weight 15 ``KeyFrame.cc:397``, matcher thresholds 50/100/30
``ORBmatcher.cc:37-39``, Huber deltas ``Optimizer.cc:99-100``, FAST patch
sizes ``ORBextractor.cc:72-74``).

Everything that shapes a compiled program (capacities, pyramid levels, grid
sizes) is static here so jitted functions trace once per config.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Pinhole camera + Brown-Conrady distortion + stereo baseline.

    Mirrors the intrinsics block of the reference's ``ORBParameters``
    (``Tracking.cc:59-158``): fx, fy, cx, cy, k1..k3, p1, p2, ``bf`` (baseline
    times fx, pixels), and ``thDepth`` (close/far stereo point threshold in
    units of baseline, ``Tracking.cc:105-112``).
    """

    width: int = 640
    height: int = 480
    fx: float = 525.0
    fy: float = 525.0
    cx: float = 319.5
    cy: float = 239.5
    k1: float = 0.0
    k2: float = 0.0
    p1: float = 0.0
    p2: float = 0.0
    k3: float = 0.0
    bf: float = 40.0          # baseline * fx [px]; stereo/RGB-D only
    th_depth: float = 40.0    # close-point threshold = th_depth * baseline
    depth_map_factor: float = 5000.0  # TUM depth png scale (Tracking.cc:151-157)

    @property
    def has_distortion(self) -> bool:
        return any(abs(v) > 0 for v in (self.k1, self.k2, self.p1, self.p2, self.k3))


@dataclasses.dataclass(frozen=True)
class OrbConfig:
    """ORB extractor operating point.

    Defaults are the reference's launch-file operating point: 1200 features,
    8 levels, scale 1.2, FAST thresholds 20/7 (``ros/src/Node.cc:320-326``).
    ``max_kps`` is the static keypoint pool per frame (padded with a validity
    mask); it must be >= n_features.
    """

    n_features: int = 1200
    scale_factor: float = 1.2
    n_levels: int = 8
    ini_th_fast: int = 20
    min_th_fast: int = 7
    max_kps: int = 1536       # static per-frame keypoint capacity (pool size)
    edge_threshold: int = 19  # border kept clear of kps (ORBextractor.cc:73)
    patch_size: int = 31      # rBRIEF/IC-angle patch (ORBextractor.cc:72)
    fast_cell: int = 32       # detection cell size (~30 in ORBextractor.cc:798)
    approx_topk_recall: float = 1.0  # 1.0 = exact per-level top_k budget
                              # selection; < 1.0 uses jax.lax.approx_max_k
                              # at that recall target (drops up to 1-recall
                              # of the strongest corners per level)

    def scale_factors(self) -> Tuple[float, ...]:
        return tuple(self.scale_factor ** i for i in range(self.n_levels))


@dataclasses.dataclass(frozen=True)
class MatcherConfig:
    """Descriptor matching constants (``ORBmatcher.cc:37-39`` and call sites)."""

    th_high: int = 100        # lenient Hamming gate
    th_low: int = 50          # strict Hamming gate
    histo_length: int = 30    # rotation-consistency histogram bins
    nn_ratio_tracking: float = 0.9   # ratio test, local-map search (Tracking.cc:1068)
    nn_ratio_bow: float = 0.7        # ratio test, BoW search (Tracking.cc:855)
    # NOTE: the reference's 64x48 feature grid (Frame.h:37-38,
    # Frame.cc:239-256) is a CPU candidate-pruning accelerator; here every
    # window gate is evaluated inside the fused Pallas matcher kernel
    # (ops/pallas_match.py) or as masked matrix ops, so no grid exists —
    # same accept semantics, no bucketing data structure.


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Optimization constants (``Optimizer.cc``)."""

    huber_mono2: float = 5.991    # chi2 95% 2-dof (Optimizer.cc:99)
    huber_stereo2: float = 7.815  # chi2 95% 3-dof (Optimizer.cc:100)
    pose_rounds: int = 4          # PoseOptimization reclassification rounds (:415)
    pose_iters: int = 10          # LM iterations per round (:417)
    local_ba_iters1: int = 5      # LocalBA first pass (Optimizer.cc:764)
    local_ba_iters2: int = 10     # LocalBA second pass (:813)
    global_ba_iters: int = 10     # GBA after loop — reference parity
                                  # (LoopClosing.cc:763 runs 10); measured
                                  # at full-system scale, the f32 CG-Schur
                                  # chunks plateau by 10 outer iterations
                                  # (10 vs 20 gave per-keyframe errors
                                  # identical to 3 decimals)
    essential_iters: int = 20     # essential-graph LM iterations (:1108)
    sim3_iters: int = 5           # OptimizeSim3 first pass (Optimizer.cc:1290)
    lm_lambda_init: float = 1e-3  # g2o default; essential graph uses 1e-16 (:1075)
    gba_structure_only: bool = True   # post-loop GBA refines LANDMARKS
                                  # with poses FIXED at the essential-graph
                                  # result (documented deviation,
                                  # measured: the full reprojection GBA
                                  # wanders the chain's soft bending modes
                                  # on our sparser maps — chi2 down, ATE
                                  # 0.030 -> 0.214; the pose graph IS the
                                  # pose optimizer, the GBA re-fits the
                                  # map to it). False restores the
                                  # reference's all-free GBA
                                  # (Optimizer.cc:41-262).
    gba_loop_prior_weight: float = 0.0  # optional strength of the
                                  # measured loop-edge SE3 priors inside
                                  # a FULL (all-cameras-free) post-loop
                                  # GBA (solvers/ba.py _loop_prior_terms).
                                  # Off by default: with the production
                                  # structure-only GBA the poses are fixed
                                  # so seams cannot reopen anyway, and in
                                  # full mode a strong prior pins the
                                  # measured (noisy) seam Sim3 against
                                  # the refinement (measured on the
                                  # synthetic two-seam ring: mid-ring
                                  # error 0.13 -> 0.27 at weight 1e7)
    local_ba_max_points: int = 4096  # compact free-landmark axis of the
                                  # windowed BA: the Schur reductions run
                                  # over this many free points (one-hot
                                  # MXU segment sums, solvers/ba.py);
                                  # overflow points stay fixed that step.
                                  # The local window observes far fewer
                                  # distinct points than the 16k pool —
                                  # sizing the reduction to the window is
                                  # what keeps the mapping step real-time.


@dataclasses.dataclass(frozen=True)
class MapConfig:
    """Static capacities of the functional map (SURVEY.md §7.0).

    The reference's unbounded pointer graph (``Map.cc``, ``KeyFrame.cc``,
    ``MapPoint.cc``) becomes fixed-size pools with validity masks.
    """

    max_kfs: int = 256            # keyframe pool
    max_mps: int = 16384          # map-point pool
    max_kps: int = 1536           # keypoints per keyframe (= OrbConfig.max_kps)
    covis_th: int = 15            # covisibility edge weight threshold (KeyFrame.cc:397)
    covis_neighbors: int = 32     # bounded covisibility degree kept per KF
    local_window: int = 80        # local-map KF cap (Tracking.cc:1474)
    local_map_cap: int = 4096     # max map points entering the per-frame
                                  # local-map search: frustum survivors are
                                  # compacted to this bound (the array
                                  # analog of the reference's 80-KF local
                                  # map, Tracking.cc:1409-1532; also 4x
                                  # less VPU gate work than sweeping the
                                  # full 16k point pool per frame)
    min_obs_cull: int = 3         # map-point culling min observations (LocalMapping.cc:219)
    kf_cull_redundancy: float = 0.9   # keyframe culling rule (LocalMapping.cc:686)
    tri_neighbors: int = 10       # covisible neighbors triangulated against
                                  # per mapping step — the reference's
                                  # breadth: 10 stereo/RGB-D, doubled to 20
                                  # for monocular (LocalMapping.cc:247).
                                  # All neighbors are matched/gated in ONE
                                  # vmapped pass with a scatter-min winner
                                  # pick, so breadth costs far less than
                                  # the old sequential per-neighbor loop
    fuse_neighbors: int = 4       # covisible neighbors swept by duplicate
                                  # fusion per step (SearchInNeighbors uses
                                  # 10/20 + a second ring,
                                  # LocalMapping.cc:506-511; the fusion
                                  # sweep is sequential two-directional
                                  # projection, so a smaller count trades
                                  # per-step cost — later steps revisit as
                                  # covisibility reshuffles the top ranks)


@dataclasses.dataclass(frozen=True)
class TrackingConfig:
    """Front-end thresholds (``Tracking.cc``)."""

    min_init_stereo_kps: int = 500   # stereo init gate (Tracking.cc:548)
    min_init_mono_matches: int = 100 # mono init gate (:680)
    min_matches_motion: int = 20     # motion-model accept (:1006)
    min_matches_reference: int = 15  # reference-KF accept (:860)
    min_inliers_track: int = 10      # post-opt track accept (:1035)
    min_inliers_local_map: int = 30  # TrackLocalMap accept (:1090)
    min_num_kf_in_map: int = 5       # auto-reset threshold (ros dynamic param)
    max_frames_between_kf: int = 30  # fps-based KF cadence (Tracking.cc:130)
    min_frames_between_kf: int = 0


@dataclasses.dataclass(frozen=True)
class VocabConfig:
    """Bag-of-words vocabulary shape.

    The reference uses the ORBvoc tree (k=10, L=6, ~1M leaves,
    ``TemplatedVocabulary.h``). TPU-native default is a smaller dense
    vocabulary (k=10, L=4 -> 10k words) trained in-repo so BoW scoring is a
    single tf-idf matmul on the MXU; the ORBvoc binary format remains loadable
    (place/vocabulary.py) for parity.
    """

    k: int = 10
    levels: int = 4
    # FeatureVector grouping level distance: the reference groups at level
    # L - 4 = 2 of its 6-level tree (~100 nodes, Frame.cc:433); two levels
    # up of this 4-level tree gives the same ~100-node granularity
    levels_up: int = 2

    @property
    def num_words(self) -> int:
        return self.k ** self.levels


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh axes for the distributed map (SURVEY.md §2.D, §5.8)."""

    kf_axis: str = "kf"       # keyframe blocks (trajectory = "sequence" axis)
    mp_axis: str = "mp"       # map-point blocks
    n_kf_shards: int = 1
    n_mp_shards: int = 1


SENSOR_MONOCULAR = 0
SENSOR_STEREO = 1
SENSOR_RGBD = 2


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    """Top-level config: the single source of truth for a run."""

    sensor: int = SENSOR_RGBD
    camera: CameraConfig = dataclasses.field(default_factory=CameraConfig)
    orb: OrbConfig = dataclasses.field(default_factory=OrbConfig)
    matcher: MatcherConfig = dataclasses.field(default_factory=MatcherConfig)
    solver: SolverConfig = dataclasses.field(default_factory=SolverConfig)
    map: MapConfig = dataclasses.field(default_factory=MapConfig)
    tracking: TrackingConfig = dataclasses.field(default_factory=TrackingConfig)
    vocab: VocabConfig = dataclasses.field(default_factory=VocabConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    # The wjjcdy fork hardcodes a mounting-tilt initial pose
    # (Tracking.cc:552-563, pitch=-0.5637 rad about X). We default to identity
    # and expose it as an option (SURVEY.md §2.18).
    initial_pitch: float = 0.0
    localization_only: bool = False
    seed: int = 0             # DUtils::Random::SeedRandOnce(0) determinism analog

    def replace(self, **kw) -> "SlamConfig":
        return dataclasses.replace(self, **kw)


def tum_fr1_config(sensor: int = SENSOR_RGBD) -> SlamConfig:
    """TUM freiburg1 calibration (cf. orb_slam2/config/TUM1-style params)."""
    cam = CameraConfig(
        width=640, height=480,
        fx=517.306408, fy=516.469215, cx=318.643040, cy=255.313989,
        k1=0.262383, k2=-0.953104, p1=-0.005358, p2=0.002628, k3=1.163314,
        bf=40.0, th_depth=40.0, depth_map_factor=5000.0,
    )
    return SlamConfig(sensor=sensor, camera=cam)
