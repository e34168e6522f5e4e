"""Descriptor matching: all search variants as masked distance-matrix ops.

TPU-native replacement for ``ORBmatcher.cc`` (1667 LoC, 8 search variants +
2 fuse variants): every variant is ONE masked (N query x M target) Hamming
matrix + per-row best/second-best reduction + gate masks — the union of the
reference's grid window / octave band / epipolar / viewing-cos / stereo gates
(§2.7 of SURVEY.md). Conflict resolution (several queries picking the same
target keypoint) is a scatter-min on (distance, query) keys, which strictly
improves on the reference's last-writer-wins loop.

Thresholds follow ``ORBmatcher.cc:37-39`` (TH_HIGH=100, TH_LOW=50) and the
rotation-consistency histogram replicates the reference's 30-bin layout
including its famous factor quirk (bins are 30 degrees wide because
``factor = 1/HISTO_LENGTH`` is applied to degrees, ``ORBmatcher.cc:1603``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

import os

from orb_slam_2_ros_tpu.config import SlamConfig
from orb_slam_2_ros_tpu.frontend.frame import Frame
from orb_slam_2_ros_tpu.geometry import camera, se3
from orb_slam_2_ros_tpu.ops.hamming import (INF_DIST, best_two,
                                            hamming_matrix, unpack_pm1)


def _pallas_ok(n: int, m: int) -> bool:
    """Use the fused Pallas matcher kernel when on a TPU backend and the
    problem tiles cleanly (ops/pallas_match.py); pool sizes are config
    constants, so this is a trace-time decision."""
    if os.environ.get("SLAM_DISABLE_PALLAS"):
        return False
    if n % 128 or m % 128 or m >= (1 << 15):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:       # pragma: no cover
        return False


def _fused_best_two(desc_rows, desc_cols, row_uv, row_rad, row_oct_lo,
                    row_oct_hi, row_ur, row_ok, col_uv, col_oct, col_ur,
                    col_ok, interpret: bool = False):
    """Streamed masked best/second-best via the Pallas kernel."""
    from orb_slam_2_ros_tpu.ops import pallas_match
    f32 = jnp.float32
    row_meta = jnp.stack([
        row_uv[:, 0].astype(f32), row_uv[:, 1].astype(f32),
        row_rad.astype(f32), row_oct_lo.astype(f32), row_oct_hi.astype(f32),
        row_ur.astype(f32), row_ok.astype(f32),
        jnp.zeros_like(row_rad, dtype=f32)])
    col_meta = jnp.stack([
        col_uv[:, 0].astype(f32), col_uv[:, 1].astype(f32),
        col_oct.astype(f32), col_ur.astype(f32), col_ok.astype(f32),
        jnp.zeros_like(col_oct, dtype=f32),
        jnp.zeros_like(col_oct, dtype=f32),
        jnp.zeros_like(col_oct, dtype=f32)])
    return pallas_match.masked_best_two(
        unpack_pm1(desc_rows), row_meta, unpack_pm1(desc_cols), col_meta,
        interpret=interpret)


class TrackInView(NamedTuple):
    """Per-map-point frustum data (``Frame::isInFrustum``, ``Frame.cc:284-350``)."""

    uv: jnp.ndarray         # (N, 2) projected undistorted pixel
    u_right: jnp.ndarray    # (N,) projected right coord
    dist: jnp.ndarray       # (N,) distance to camera center
    view_cos: jnp.ndarray   # (N,) cos(angle between ray and mean normal)
    pred_level: jnp.ndarray  # (N,) int32 predicted octave
    ok: jnp.ndarray         # (N,) bool


def predict_level(dist: jnp.ndarray, max_dist: jnp.ndarray, cfg: SlamConfig) -> jnp.ndarray:
    """Scale prediction from distance (``MapPoint::PredictScale``,
    ``MapPoint.cc:455-487``)."""
    ratio = max_dist / jnp.maximum(dist, 1e-9)
    lvl = jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / jnp.log(cfg.orb.scale_factor))
    return jnp.clip(lvl.astype(jnp.int32), 0, cfg.orb.n_levels - 1)


def frustum_check(q, t, mp_pos, mp_normal, mp_min_dist, mp_max_dist,
                  mp_valid, cfg: SlamConfig, view_cos_limit: float = 0.5) -> TrackInView:
    """Batched isInFrustum over the map-point pool."""
    cam = cfg.camera
    xc = se3.apply(q, t, mp_pos)
    z = xc[..., 2]
    uvr = camera.project_stereo(cam, xc)
    uv = uvr[..., :2]
    ow = se3.camera_center(q, t)
    po = mp_pos - ow
    dist = jnp.linalg.norm(po, axis=-1)
    view_cos = jnp.sum(po * mp_normal, axis=-1) / jnp.maximum(dist, 1e-9)
    ok = (mp_valid & (z > 0.0) & camera.in_image(cam, uv)
          & (dist >= mp_min_dist) & (dist <= mp_max_dist)
          & (view_cos > view_cos_limit))
    return TrackInView(uv=uv, u_right=uvr[..., 2], dist=dist, view_cos=view_cos,
                       pred_level=predict_level(dist, mp_max_dist, cfg), ok=ok)


def resolve_conflicts(best_kp: jnp.ndarray, best_d: jnp.ndarray,
                      accept: jnp.ndarray, n_kps: int):
    """Each accepted query q wants target keypoint best_kp[q]; keep, per
    keypoint, the query with the smallest distance. Returns (kp_to_query
    (n_kps,) int32 with -1, kp_dist (n_kps,) int32)."""
    n_q = best_kp.shape[0]
    # key = dist * 2^20 + query_idx; scatter-min then decode
    key = best_d * (1 << 20) + jnp.arange(n_q, dtype=jnp.int32)
    key = jnp.where(accept, key, jnp.int32(0x7FFFFFFF))
    slot = jnp.where(accept, best_kp, n_kps)  # dump rejected into overflow slot
    kp_key = jnp.full((n_kps + 1,), 0x7FFFFFFF, jnp.int32).at[slot].min(key)
    kp_key = kp_key[:n_kps]
    matched = kp_key != 0x7FFFFFFF
    kp_to_q = jnp.where(matched, kp_key & ((1 << 20) - 1), -1)
    kp_dist = jnp.where(matched, kp_key >> 20, INF_DIST)
    return kp_to_q, kp_dist


def rotation_consistency(rot_deg: jnp.ndarray, accept: jnp.ndarray) -> jnp.ndarray:
    """Keep only matches in the 3 most-populated rotation bins
    (``ComputeThreeMaxima``, ``ORBmatcher.cc:1603-1644``; 30-deg bins
    replicating the reference's factor)."""
    histo_len = 30
    rot = jnp.where(rot_deg < 0, rot_deg + 360.0, rot_deg)
    b = jnp.round(rot * (1.0 / histo_len)).astype(jnp.int32)
    b = jnp.where(b == histo_len, 0, b)
    b = jnp.clip(b, 0, histo_len - 1)
    counts = jnp.zeros((histo_len,), jnp.int32).at[jnp.where(accept, b, 0)].add(
        accept.astype(jnp.int32))
    # top-3 bins with the reference's 10% drop rule
    vals, idx = jax.lax.top_k(counts, 3)
    keep_bins = jnp.where(
        jnp.arange(3) == 0, True,
        vals > 0.1 * vals[0])
    good = jnp.zeros((histo_len,), bool).at[idx].set(keep_bins)
    return accept & good[b]


def search_local_map(tv: TrackInView, mp_desc: jnp.ndarray, frame: Frame,
                     kp_has_mp: jnp.ndarray, cfg: SlamConfig,
                     th: float = 1.0):
    """Project local map points into the frame and match
    (``ORBmatcher::SearchByProjection`` variant 1, ``ORBmatcher.cc:45-129``).

    Returns (kp_to_mp_local (max_kps,) int32 index into the tv/mp arrays or
    -1, kp_dist)."""
    m = cfg.matcher
    sf = cfg.orb.scale_factor ** tv.pred_level.astype(jnp.float32)   # (N,)
    r = jnp.where(tv.view_cos > 0.998, 2.5, 4.0) * th * sf           # (N,)

    if _pallas_ok(mp_desc.shape[0], frame.desc.shape[0]):
        best_idx, best_d, second_idx, second_d = _fused_best_two(
            mp_desc, frame.desc, tv.uv, r, tv.pred_level - 1, tv.pred_level,
            tv.u_right, tv.ok, frame.uv, frame.kps.octave, frame.u_right,
            frame.valid & ~kp_has_mp)
    else:
        dx = jnp.abs(tv.uv[:, None, 0] - frame.uv[None, :, 0])
        dy = jnp.abs(tv.uv[:, None, 1] - frame.uv[None, :, 1])
        window = (dx <= r[:, None]) & (dy <= r[:, None])

        kp_oct = frame.kps.octave[None, :]
        oct_ok = ((kp_oct >= tv.pred_level[:, None] - 1)
                  & (kp_oct <= tv.pred_level[:, None]))

        has_ur = frame.u_right[None, :] > 0
        er = jnp.abs(tv.u_right[:, None] - frame.u_right[None, :])
        stereo_ok = jnp.where(has_ur, er <= r[:, None], True)

        mask = (tv.ok[:, None] & frame.valid[None, :] & (~kp_has_mp)[None, :]
                & window & oct_ok & stereo_ok)

        D = hamming_matrix(mp_desc, frame.desc)
        best_idx, best_d, second_idx, second_d = best_two(D, mask)

    lvl_best = frame.kps.octave[best_idx]
    lvl_second = frame.kps.octave[second_idx]
    ratio_fail = (lvl_best == lvl_second) & (
        best_d.astype(jnp.float32) > m.nn_ratio_tracking * second_d.astype(jnp.float32))
    accept = (best_d <= m.th_high) & ~ratio_fail & tv.ok
    return resolve_conflicts(best_idx, best_d, accept, frame.uv.shape[0])


def search_by_projection_pose(mp_world: jnp.ndarray, mp_desc: jnp.ndarray,
                              src_octave: jnp.ndarray, src_valid: jnp.ndarray,
                              q, t, frame: Frame, cfg: SlamConfig,
                              th: float, src_angle: jnp.ndarray = None,
                              check_rotation: bool = True,
                              exclude_kp: jnp.ndarray = None,
                              widen_below: int = 0):
    """Project known 3D points (with a source octave per point) into the frame
    under pose (q, t) and match in a window th*scale^octave — the
    last-frame->current variant of SearchByProjection
    (``ORBmatcher.cc:1330-1472``) and the relocalization KF->frame variant
    (``:1474-1601``).

    widen_below > 0 enables the reference's failure fallback: when fewer
    than that many matches pass the narrow window, re-match with a 2x
    window (``Tracking.cc:1002-1016``). The Hamming matrix is shared
    between the two passes, so the retry costs one extra masked argmin.

    Returns (kp_to_src (max_kps,) int32, kp_dist)."""
    cam = cfg.camera
    xc = se3.apply(q, t, mp_world)
    z = xc[..., 2]
    uvr = camera.project_stereo(cam, xc)
    uv = uvr[..., :2]
    ok = src_valid & (z > 0) & camera.in_image(cam, uv)

    sf = cfg.orb.scale_factor ** src_octave.astype(jnp.float32)
    dx = jnp.abs(uv[:, None, 0] - frame.uv[None, :, 0])
    dy = jnp.abs(uv[:, None, 1] - frame.uv[None, :, 1])

    kp_oct = frame.kps.octave[None, :]
    oct_ok = (kp_oct >= src_octave[:, None] - 1) & (kp_oct <= src_octave[:, None] + 1)
    has_ur = frame.u_right[None, :] > 0
    er = jnp.abs(uvr[..., 2][:, None] - frame.u_right[None, :])

    base = ok[:, None] & frame.valid[None, :] & oct_ok
    col_ok = frame.valid
    if exclude_kp is not None:
        base = base & (~exclude_kp)[None, :]
        col_ok = col_ok & ~exclude_kp
    use_pallas = _pallas_ok(mp_desc.shape[0], frame.desc.shape[0])
    if not use_pallas:
        D = hamming_matrix(mp_desc, frame.desc)

    def attempt(radius):
        if use_pallas:
            best_idx, best_d, _, _ = _fused_best_two(
                mp_desc, frame.desc, uv, radius, src_octave - 1,
                src_octave + 1, uvr[..., 2], ok,
                frame.uv, frame.kps.octave, frame.u_right, col_ok)
        else:
            window = (dx <= radius[:, None]) & (dy <= radius[:, None])
            stereo_ok = jnp.where(has_ur, er <= radius[:, None], True)
            best_idx, best_d, _, _ = best_two(D, base & window & stereo_ok)
        accept = (best_d <= cfg.matcher.th_high) & ok
        if check_rotation and src_angle is not None:
            rot = jnp.degrees(src_angle - frame.kps.angle[best_idx])
            accept = rotation_consistency(rot, accept)
        return best_idx, best_d, accept

    best_idx, best_d, accept = attempt(th * sf)
    if widen_below > 0:
        n = jnp.sum(accept.astype(jnp.int32))
        bi2, bd2, ac2 = attempt(2.0 * th * sf)
        use_wide = n < widen_below
        best_idx = jnp.where(use_wide, bi2, best_idx)
        best_d = jnp.where(use_wide, bd2, best_d)
        accept = jnp.where(use_wide, ac2, accept)

    return resolve_conflicts(best_idx, best_d, accept, frame.uv.shape[0])


def search_by_node(desc_q: jnp.ndarray, node_q: jnp.ndarray, valid_q: jnp.ndarray,
                   angle_q: jnp.ndarray,
                   desc_t: jnp.ndarray, node_t: jnp.ndarray, valid_t: jnp.ndarray,
                   angle_t: jnp.ndarray, cfg: SlamConfig,
                   nn_ratio: float = None, check_rotation: bool = True):
    """BoW-accelerated matching (``SearchByBoW``, ``ORBmatcher.cc:160-289`` and
    ``:524-657``): candidate pairs must share a vocabulary node (the
    FeatureVector gate). Returns (t_to_q (M,) int32, t_dist)."""
    m = cfg.matcher
    nn = m.nn_ratio_bow if nn_ratio is None else nn_ratio
    mask = ((node_q[:, None] == node_t[None, :]) & (node_q[:, None] >= 0)
            & valid_q[:, None] & valid_t[None, :])
    D = hamming_matrix(desc_q, desc_t)
    best_idx, best_d, _, second_d = best_two(D, mask)
    accept = ((best_d <= m.th_low)
              & (best_d.astype(jnp.float32) < nn * second_d.astype(jnp.float32))
              & valid_q)
    if check_rotation:
        rot = jnp.degrees(angle_q - angle_t[best_idx])
        accept = rotation_consistency(rot, accept)
    return resolve_conflicts(best_idx, best_d, accept, desc_t.shape[0])


def search_reference_kf(ref_desc: jnp.ndarray, ref_valid: jnp.ndarray,
                        ref_angle: jnp.ndarray, frame: Frame, cfg: SlamConfig):
    """Reference-keyframe matching for TrackReferenceKeyFrame
    (``SearchByBoW(KF, F)``, ``ORBmatcher.cc:160-289``; called from
    ``Tracking.cc:839-868`` with nn_ratio 0.7 + rotation check).

    The reference gates candidate pairs to those sharing a vocabulary node —
    a CPU pruning accelerator that only ever REMOVES candidates, never adds
    them. On TPU the full masked Hamming matrix is one MXU matmul, so the
    idiomatic equivalent drops the node gate and searches all pairs
    (documented deviation: strictly wider candidate set, same accept gates:
    TH_LOW, best < 0.7 * second-best, rotation histogram).

    Returns (kp_to_ref (max_kps,) int32, kp_dist)."""
    m = cfg.matcher
    mask = ref_valid[:, None] & frame.valid[None, :]
    D = hamming_matrix(ref_desc, frame.desc)
    best_idx, best_d, _, second_d = best_two(D, mask)
    accept = ((best_d <= m.th_low)
              & (best_d.astype(jnp.float32)
                 < m.nn_ratio_bow * second_d.astype(jnp.float32))
              & ref_valid)
    rot = jnp.degrees(ref_angle - frame.kps.angle[best_idx])
    accept = rotation_consistency(rot, accept)
    return resolve_conflicts(best_idx, best_d, accept, frame.desc.shape[0])


def search_for_initialization(f_ref: Frame, f_cur: Frame, cfg: SlamConfig,
                              window: float = 100.0, nn_ratio: float = 0.9):
    """Windowed level-0 matching for monocular initialization
    (``SearchForInitialization``, ``ORBmatcher.cc:406-522``).

    Returns (cur_to_ref (max_kps,) int32, dist)."""
    m = cfg.matcher
    dx = jnp.abs(f_ref.uv[:, None, 0] - f_cur.uv[None, :, 0])
    dy = jnp.abs(f_ref.uv[:, None, 1] - f_cur.uv[None, :, 1])
    lvl0 = (f_ref.kps.octave[:, None] == 0) & (f_cur.kps.octave[None, :] == 0)
    mask = ((dx <= window) & (dy <= window) & lvl0
            & f_ref.valid[:, None] & f_cur.valid[None, :])
    D = hamming_matrix(f_ref.desc, f_cur.desc)
    best_idx, best_d, _, second_d = best_two(D, mask)
    accept = ((best_d <= m.th_low)
              & (best_d.astype(jnp.float32) < nn_ratio * second_d.astype(jnp.float32)))
    rot = jnp.degrees(f_ref.kps.angle - f_cur.kps.angle[best_idx])
    accept = rotation_consistency(rot, accept)
    return resolve_conflicts(best_idx, best_d, accept, f_cur.uv.shape[0])


def search_for_triangulation(f1_desc, f1_uv, f1_ur, f1_oct, f1_angle, f1_valid,
                             f2_desc, f2_uv, f2_ur, f2_oct, f2_angle, f2_valid,
                             F12: jnp.ndarray, cfg: SlamConfig,
                             node1: jnp.ndarray = None, node2: jnp.ndarray = None,
                             check_rotation: bool = False):
    """Epipolar-gated matching between two keyframes for new-point creation
    (``SearchForTriangulation``, ``ORBmatcher.cc:659-825``): candidates must be
    unmatched features whose pairing satisfies the fundamental-matrix distance
    gate ``CheckDistEpipolarLine`` (``:140-157``); optional BoW node gate.

    F12 maps points in image 1 to epipolar lines in image 2 (x2^T F12 x1 = 0).
    Returns (idx2_to_idx1 (M,) int32, dist)."""
    m = cfg.matcher
    # epipolar line of each f1 feature in image 2: l = F12 @ [u1, v1, 1]
    ones = jnp.ones_like(f1_uv[:, :1])
    x1 = jnp.concatenate([f1_uv, ones], axis=-1)          # (N, 3)
    lines = x1 @ F12.T                                    # (N, 3)
    a, b, c = lines[:, 0:1], lines[:, 1:2], lines[:, 2:3]
    num = a * f2_uv[None, :, 0] + b * f2_uv[None, :, 1] + c   # broadcasting (N,M)
    den = a * a + b * b
    dsqr = (num * num) / jnp.maximum(den, 1e-12)
    sf2 = cfg.orb.scale_factor ** f2_oct.astype(jnp.float32)
    epi_ok = dsqr < 3.84 * (sf2 * sf2)[None, :]

    mask = f1_valid[:, None] & f2_valid[None, :] & epi_ok
    if node1 is not None and node2 is not None:
        mask = mask & (node1[:, None] == node2[None, :]) & (node1[:, None] >= 0)

    D = hamming_matrix(f1_desc, f2_desc)
    best_idx, best_d, _, _ = best_two(D, mask)
    accept = (best_d <= m.th_low) & f1_valid
    if check_rotation:
        rot = jnp.degrees(f1_angle - f2_angle[best_idx])
        accept = rotation_consistency(rot, accept)
    return resolve_conflicts(best_idx, best_d, accept, f2_desc.shape[0])
