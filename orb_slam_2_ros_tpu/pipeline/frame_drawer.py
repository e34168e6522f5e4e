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


def draw_frame(gray: np.ndarray, kp_xy: np.ndarray, kp_valid: np.ndarray,
               kp_has_map: np.ndarray, state: int, n_matches: int,
               n_kfs: int = 0, n_mps: int = 0,
               localization_only: bool = False) -> np.ndarray:
    """Render the annotated tracking image.

    gray (H, W) float/uint8; kp_xy (P, 2) pixel coords; kp_valid (P,) bool;
    kp_has_map (P,) bool — True = matched to a map point (green square +
    dot like the reference), False = unmatched keypoint (not drawn, matching
    the reference's default view). Returns (H + 20, W, 3) uint8 with the
    status bar appended below (``FrameDrawer.cc:170-203``).
    """
    import cv2

    img = np.clip(np.asarray(gray), 0, 255).astype(np.uint8)
    rgb = cv2.cvtColor(img, cv2.COLOR_GRAY2BGR)
    r = 5
    for (x, y), ok, has in zip(np.asarray(kp_xy), np.asarray(kp_valid),
                               np.asarray(kp_has_map)):
        if not ok or not has:
            continue
        p1 = (int(x - r), int(y - r))
        p2 = (int(x + r), int(y + r))
        cv2.rectangle(rgb, p1, p2, (0, 255, 0))
        cv2.circle(rgb, (int(x), int(y)), 2, (0, 255, 0), -1)

    mode = " | LOCALIZATION" if localization_only else ""
    status = (f"{_STATE_TEXT.get(state, '?')}{mode} | KFs: {n_kfs}, "
              f"MPs: {n_mps}, Matches: {n_matches}")
    H, W = img.shape
    bar = np.zeros((20, W, 3), np.uint8)
    cv2.putText(bar, status, (5, 14), cv2.FONT_HERSHEY_PLAIN, 0.9,
                (255, 255, 255), 1)
    return np.concatenate([rgb, bar], axis=0)
