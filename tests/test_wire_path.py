"""Wire-format streaming path: native prefetcher -> System.track_chunk must
produce bit-identical tracking to the float-image path (both quantize to the
same u8 gray / u16 mm depth device inputs)."""

import os

import numpy as np
import pytest
from PIL import Image

from orb_slam_2_ros_tpu import native
from orb_slam_2_ros_tpu.config import (CameraConfig, MapConfig, OrbConfig,
                                       SENSOR_RGBD, SlamConfig,
                                       TrackingConfig)
from orb_slam_2_ros_tpu.io.datasets import TumRGBD, make_prefetcher
from orb_slam_2_ros_tpu.io.synthetic import SyntheticRGBD
from orb_slam_2_ros_tpu.pipeline.slam import System
from orb_slam_2_ros_tpu.pipeline.tracking import OK

pytestmark = pytest.mark.skipif(native.load() is None,
                                reason="native toolchain unavailable")


def _small_cfg():
    cam = CameraConfig(width=320, height=240, fx=260.0, fy=260.0,
                       cx=159.5, cy=119.5, bf=20.0, th_depth=50.0)
    return SlamConfig(
        sensor=SENSOR_RGBD, camera=cam,
        orb=OrbConfig(n_features=500, n_levels=3, max_kps=640),
        map=MapConfig(max_kfs=16, max_mps=4096, max_kps=640),
        tracking=TrackingConfig(min_init_stereo_kps=200))


def _write_tum_fixture(root, cfg, n):
    """Render synthetic RGB-D frames into a TUM directory layout."""
    ds = SyntheticRGBD(cfg, n_frames=n, seed=0)
    os.makedirs(f"{root}/rgb")
    os.makedirs(f"{root}/depth")
    frames = []
    with open(f"{root}/rgb.txt", "w") as fr, \
            open(f"{root}/depth.txt", "w") as fd:
        for i in range(n):
            gray, depth = ds[i]
            g8 = np.clip(np.round(gray), 0, 255).astype(np.uint8)
            raw = np.clip(np.round(depth * 5000.0), 0, 65535).astype(np.uint16)
            raw[depth <= 0] = 0
            t = ds.timestamps[i]
            Image.fromarray(g8).save(f"{root}/rgb/{t:.6f}.png")
            Image.fromarray(raw, mode="I;16").save(
                f"{root}/depth/{t:.6f}.png")
            fr.write(f"{t:.6f} rgb/{t:.6f}.png\n")
            fd.write(f"{t:.6f} depth/{t:.6f}.png\n")
            frames.append((g8.astype(np.float32),
                           np.where(raw == 0, -1.0,
                                    np.round(raw / 5.0) * 1e-3)
                           .astype(np.float32)))
    return ds.timestamps, frames


def test_wire_path_matches_float_path(tmp_path):
    cfg = _small_cfg()
    n = 16
    ts, frames = _write_tum_fixture(str(tmp_path), cfg, n)

    tum = TumRGBD(str(tmp_path))
    assert len(tum) == n

    # float path: indexed dataset reads
    sys_f = System(cfg, enable_local_ba=False, enable_loop_closing=False)
    a = np.stack([tum[i][0] for i in range(n)])
    b = np.stack([tum[i][1] for i in range(n)])
    recs_f = sys_f.track_chunk(a, b, list(tum.timestamps))

    # wire path: native prefetcher stream
    pf = make_prefetcher(tum)
    assert pf is not None
    out = [pf.next() for _ in range(n)]
    gw = np.stack([o[0] for o in out])
    dw = np.stack([o[1] for o in out])
    assert gw.dtype == np.uint8 and dw.dtype == np.uint16
    pf.close()
    sys_w = System(cfg, enable_local_ba=False, enable_loop_closing=False)
    recs_w = sys_w.track_chunk(gw, dw, list(tum.timestamps))

    assert [r.state for r in recs_f] == [r.state for r in recs_w]
    assert recs_w[-1].state == OK
    for rf, rw in zip(recs_f, recs_w):
        np.testing.assert_array_equal(rf.c_w, rw.c_w)
        np.testing.assert_array_equal(rf.R_wc, rw.R_wc)
