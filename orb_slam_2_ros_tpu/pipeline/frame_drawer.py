"""Debug-image renderer: keypoint overlays + status text.

Replaces ``FrameDrawer`` (SURVEY.md §2.17, ``FrameDrawer.cc``): the
reference double-buffers tracking state under a mutex and draws green
squares for map-matched keypoints, blue for visual-odometry points, match
lines during initialization, and a status bar
(``FrameDrawer::DrawFrame``, ``FrameDrawer.cc:38-203``). Here rendering is
an offline/optional host-side routine over the functional tracking state —
no mutex needed; the System exposes ``render_debug_image()``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

_STATE_TEXT = {
    0: "WAITING FOR IMAGES",
    1: "TRYING TO INITIALIZE",
    2: "SLAM MODE",
    3: "LOST. TRYING TO RELOCALIZE",
}

_GREEN = (0, 255, 0)
_BLUE = (255, 0, 0)       # BGR, like the reference's cv::Scalar(255,0,0)


def draw_frame(gray: np.ndarray, kp_xy: np.ndarray, kp_valid: np.ndarray,
               kp_has_map: np.ndarray, state: int, n_matches: int,
               n_kfs: int = 0, n_mps: int = 0,
               localization_only: bool = False,
               kp_has_vo: Optional[np.ndarray] = None,
               init_ref_xy: Optional[np.ndarray] = None,
               init_matches: Optional[np.ndarray] = None) -> np.ndarray:
    """Render the annotated tracking image.

    gray (H, W) float/uint8; kp_xy (P, 2) pixel coords; kp_valid (P,) bool;
    kp_has_map (P,) bool — True = matched to a MAP point (green square +
    dot, ``FrameDrawer.cc:123-131``); kp_has_vo (P,) bool — matched to a
    temporal visual-odometry point (blue square + dot,
    ``FrameDrawer.cc:133-139``; only populated in localization mode).

    During initialization pass init_ref_xy (P, 2) reference-frame keypoint
    coords and init_matches (P,) int32 mapping CURRENT keypoint j ->
    reference keypoint index (or -1): matched pairs are joined by green
    lines like ``FrameDrawer.cc:92-105``.

    Returns (H + 20, W, 3) uint8 with the status bar appended below
    (``FrameDrawer.cc:170-203``).
    """
    import cv2

    img = np.clip(np.asarray(gray), 0, 255).astype(np.uint8)
    rgb = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
    r = 5
    kp_xy = np.asarray(kp_xy)
    kp_valid = np.asarray(kp_valid)

    if init_ref_xy is not None and init_matches is not None:
        ref_xy = np.asarray(init_ref_xy)
        mi = np.asarray(init_matches)
        for j, (x, y) in enumerate(kp_xy):
            if not kp_valid[j] or mi[j] < 0:
                continue
            cv2.line(rgb, (int(ref_xy[mi[j]][0]), int(ref_xy[mi[j]][1])),
                     (int(x), int(y)), _GREEN)
    else:
        vo = (np.zeros(len(kp_xy), bool) if kp_has_vo is None
              else np.asarray(kp_has_vo))
        has_map = np.asarray(kp_has_map)
        for (x, y), ok, has, is_vo in zip(kp_xy, kp_valid, has_map, vo):
            if not ok or not (has or is_vo):
                continue
            color = _GREEN if has else _BLUE
            p1 = (int(x - r), int(y - r))
            p2 = (int(x + r), int(y + r))
            cv2.rectangle(rgb, p1, p2, color)
            cv2.circle(rgb, (int(x), int(y)), 2, color, -1)

    mode = " | LOCALIZATION" if localization_only else ""
    status = (f"{_STATE_TEXT.get(state, '?')}{mode} | KFs: {n_kfs}, "
              f"MPs: {n_mps}, Matches: {n_matches}")
    H, W = img.shape
    bar = np.zeros((20, W, 3), np.uint8)
    cv2.putText(bar, status, (5, 14), cv2.FONT_HERSHEY_PLAIN, 0.9,
                (255, 255, 255), 1)
    return np.concatenate([rgb, bar], axis=0)
