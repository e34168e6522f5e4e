"""Dataset loader tests over synthetic fixture directories (TUM / KITTI /
EuRoC layouts, §2.20's rosbag-playback equivalent)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from orb_slam_2_ros_tpu.io.datasets import (EurocMav, KittiOdometry, TumRGBD,
                                            associate)


def test_associate_greedy_nearest():
    a = np.array([0.0, 1.0, 2.0, 3.0])
    b = np.array([0.01, 1.5, 2.005, 2.995, 10.0])
    pairs = associate(a, b, max_dt=0.02)
    assert pairs == [(0, 0), (2, 2), (3, 3)]


def _png(path, value, size=(32, 24), depth16=False):
    img = np.full((size[1], size[0]), value,
                  np.uint16 if depth16 else np.uint8)
    cv2.imwrite(path, img)


def test_tum_rgbd_loader(tmp_path):
    root = str(tmp_path)
    os.makedirs(f"{root}/rgb")
    os.makedirs(f"{root}/depth")
    with open(f"{root}/rgb.txt", "w") as fr, \
            open(f"{root}/depth.txt", "w") as fd:
        fr.write("# comment\n")
        fd.write("# comment\n")
        for i in range(3):
            t = 100.0 + i * 0.033
            _png(f"{root}/rgb/{t:.6f}.png", 50 + i)
            _png(f"{root}/depth/{t + 0.01:.6f}.png", 5000 * (i + 1),
                 depth16=True)
            fr.write(f"{t:.6f} rgb/{t:.6f}.png\n")
            fd.write(f"{t + 0.01:.6f} depth/{t + 0.01:.6f}.png\n")
    ds = TumRGBD(root)
    assert len(ds) == 3
    gray, depth = ds[1]
    assert gray.shape == (24, 32) and gray.dtype == np.float32
    assert abs(float(gray[0, 0]) - 51.0) < 1e-6
    # depth factor 5000: raw 10000 -> 2 m
    assert abs(float(depth[0, 0]) - 2.0) < 1e-6


def test_kitti_loader(tmp_path):
    root = str(tmp_path)
    os.makedirs(f"{root}/image_0")
    os.makedirs(f"{root}/image_1")
    with open(f"{root}/times.txt", "w") as f:
        for i in range(2):
            f.write(f"{i * 0.1:.6f}\n")
            _png(f"{root}/image_0/{i:06d}.png", 10 + i)
            _png(f"{root}/image_1/{i:06d}.png", 20 + i)
    ds = KittiOdometry(root)
    assert len(ds) == 2
    left, right = ds[1]
    assert abs(float(left[0, 0]) - 11.0) < 1e-6
    assert abs(float(right[0, 0]) - 21.0) < 1e-6


def test_euroc_loader(tmp_path):
    root = str(tmp_path)
    for cam in ("cam0", "cam1"):
        os.makedirs(f"{root}/mav0/{cam}/data")
        with open(f"{root}/mav0/{cam}/data.csv", "w") as f:
            f.write("#timestamp [ns],filename\n")
            for i in range(2):
                ns = 1000000000 * (i + 1)
                name = f"{ns}.png"
                _png(f"{root}/mav0/{cam}/data/{name}",
                     (30 if cam == "cam0" else 40) + i)
                f.write(f"{ns},{name}\n")
    ds = EurocMav(root)
    assert len(ds) == 2
    l, r = ds[0]
    assert abs(float(l[0, 0]) - 30.0) < 1e-6
    assert abs(float(r[0, 0]) - 40.0) < 1e-6
    assert abs(ds.timestamps[0] - 1.0) < 1e-9


def test_presets_cover_reference_launch_files():
    """Every reference launch file (ros/launch/*.launch, SURVEY.md 2.22) has
    a preset carrying its calibration; sensor overrides work."""
    from orb_slam_2_ros_tpu import presets
    from orb_slam_2_ros_tpu.config import SENSOR_STEREO

    assert set(presets.PRESETS) >= {"tum1", "tum2", "kitti", "euroc",
                                    "r200", "d435", "mynteye", "zed2"}
    zed = presets.get("zed2")
    assert zed.sensor == SENSOR_STEREO
    assert abs(zed.camera.fx - 527.43) < 1e-9          # zed2 launch :56
    assert abs(zed.camera.bf - 63.2916) < 1e-9         # zed2 launch :69
    r200_st = presets.get("r200", SENSOR_STEREO)
    assert abs(r200_st.camera.bf - 30.464328718) < 1e-9  # r200 stereo launch
    d435 = presets.get("d435")
    assert abs(d435.camera.bf - 9.052) < 1e-9          # d435 launch :52
    assert d435.orb.n_features == 1000                 # d435 launch nFeatures
    try:
        presets.get("nope")
        assert False
    except KeyError:
        pass


def test_kitti_calibration_from_calib_txt(tmp_path):
    """Per-sequence intrinsics come from calib.txt (the camera_info
    equivalent, ``ros/src/Node.cc:336-358``)."""
    import numpy as np
    import cv2
    seq = tmp_path / "00"
    (seq / "image_0").mkdir(parents=True)
    (seq / "image_1").mkdir()
    (seq / "times.txt").write_text("0.0\n0.1\n")
    img = np.zeros((376, 1241), np.uint8)
    for d in ("image_0", "image_1"):
        for i in range(2):
            cv2.imwrite(str(seq / d / f"{i:06d}.png"), img)
    fx, cx, cy, base = 718.856, 607.1928, 185.2157, 0.5371657
    p0 = f"P0: {fx} 0 {cx} 0 0 {fx} {cy} 0 0 0 1 0\n"
    p1 = (f"P1: {fx} 0 {cx} {-fx * base} 0 {fx} {cy} 0 0 0 1 0\n")
    (seq / "calib.txt").write_text(p0 + p1)

    from orb_slam_2_ros_tpu.io.datasets import KittiOdometry
    ds = KittiOdometry(str(seq))
    cal = ds.calibration()
    assert abs(cal["fx"] - fx) < 1e-3
    assert abs(cal["bf"] - fx * base) < 1e-3
    assert cal["width"] == 1241 and cal["height"] == 376


def test_mini_tum_checked_in_dataset_roundtrip():
    """The checked-in miniature TUM sequence (tests/data/mini_tum, written
    by tools/make_mini_tum.py) decodes through the real loader path —
    native PNG decoder, associate pairing, depth factor 5000 — and matches
    the synthetic renderer it was written from."""
    import os
    import numpy as np
    from orb_slam_2_ros_tpu.config import SlamConfig, SENSOR_RGBD
    from orb_slam_2_ros_tpu.io.datasets import TumRGBD
    from orb_slam_2_ros_tpu.io.synthetic import SyntheticRGBD

    root = os.path.join(os.path.dirname(__file__), "data", "mini_tum")
    ds = TumRGBD(root)
    assert len(ds) == 20
    cfg = SlamConfig(sensor=SENSOR_RGBD)
    ref = SyntheticRGBD(cfg, n_frames=20, seed=0, trajectory="orbit")
    gray, depth = ds[3]
    gray_ref, depth_ref = ref[3]
    np.testing.assert_array_equal(
        gray, np.clip(np.round(gray_ref), 0, 255).astype(np.float32))
    ok = depth > 0
    assert ok.mean() > 0.9
    # 16-bit depth with factor 5000 quantizes to 0.2 mm
    assert np.abs(depth[ok] - depth_ref[ok]).max() < 5e-4
    # groundtruth.txt parses as TUM trajectory rows
    gt = np.loadtxt(os.path.join(root, "groundtruth.txt"))
    assert gt.shape == (20, 8)
