"""Native dataset-loading runtime (native/dataset_loader.cc): decode
correctness against the OpenCV oracle and threaded-prefetch ordering."""

import numpy as np
import pytest

from orb_slam_2_ros_tpu import native

pytestmark = pytest.mark.skipif(native.load() is None,
                                reason="native toolchain unavailable")


def _write_png(path, arr):
    from PIL import Image
    if arr.dtype == np.uint16:
        Image.fromarray(arr, mode="I;16").save(path)
    else:
        Image.fromarray(arr).save(path)


def test_decode_gray8_rgb_matches_opencv(tmp_path):
    """RGB PNG -> gray must be bit-exact with cv2.cvtColor(RGB2GRAY) — the
    conversion the reference applies per frame (Tracking.cc:173-276).
    (cv2.imread(IMREAD_GRAYSCALE) itself uses a different internal rounding
    and differs from cvtColor by ±1; cvtColor is the reference's call.)"""
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (48, 64, 3), np.uint8)
    p = str(tmp_path / "rgb.png")
    _write_png(p, rgb)
    ours = native.decode_gray8(p)
    ref = cv2.cvtColor(rgb, cv2.COLOR_RGB2GRAY)
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(ours, ref)


def test_decode_gray8_grayscale_png(tmp_path):
    rng = np.random.default_rng(1)
    g = rng.integers(0, 256, (32, 40), np.uint8)
    p = str(tmp_path / "g.png")
    _write_png(p, g)
    np.testing.assert_array_equal(native.decode_gray8(p), g)


def test_decode_depth_mm_tum_factor(tmp_path):
    """16-bit depth PNG -> u16 mm with TUM factor 5000: mm = raw / 5."""
    rng = np.random.default_rng(2)
    raw = rng.integers(0, 30000, (24, 32)).astype(np.uint16)
    p = str(tmp_path / "d.png")
    _write_png(p, raw)
    mm = native.decode_depth_mm(p, depth_factor=5000.0)
    expect = np.minimum(np.floor(raw.astype(np.float64) / 5.0 + 0.5),
                        65535).astype(np.uint16)
    np.testing.assert_array_equal(mm, expect)


def test_decode_pgm(tmp_path):
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (16, 20), np.uint8)
    p = str(tmp_path / "g.pgm")
    with open(p, "wb") as f:
        f.write(b"P5\n# comment\n20 16\n255\n")
        f.write(g.tobytes())
    np.testing.assert_array_equal(native.decode_gray8(p), g)


def test_prefetcher_ordered_rgbd(tmp_path):
    """Frames come back in order with correct contents through a small ring
    and several workers (the claim protocol must not deadlock or reorder)."""
    rng = np.random.default_rng(4)
    n, h, w = 13, 16, 24
    grays, depths, pa, pb = [], [], [], []
    for i in range(n):
        g = rng.integers(0, 256, (h, w), np.uint8)
        d = rng.integers(0, 10000, (h, w)).astype(np.uint16)
        gp = str(tmp_path / f"g{i}.png")
        dp = str(tmp_path / f"d{i}.png")
        _write_png(gp, g)
        _write_png(dp, d)
        grays.append(g)
        depths.append(d)
        pa.append(gp)
        pb.append(dp)
    pf = native.Prefetcher(pa, pb, native.MODE_RGBD, w, h,
                           depth_factor=1000.0, n_threads=3, ring_cap=4)
    for i, (g, d) in enumerate(pf):
        np.testing.assert_array_equal(g, grays[i])
        np.testing.assert_array_equal(d, depths[i])
    assert i == n - 1
    assert pf.next() is None
    pf.close()


def test_prefetcher_stereo_mode(tmp_path):
    rng = np.random.default_rng(5)
    h, w = 12, 18
    l = rng.integers(0, 256, (h, w), np.uint8)
    r = rng.integers(0, 256, (h, w), np.uint8)
    lp, rp = str(tmp_path / "l.png"), str(tmp_path / "r.png")
    _write_png(lp, l)
    _write_png(rp, r)
    pf = native.Prefetcher([lp], [rp], native.MODE_STEREO, w, h)
    g, aux = pf.next()
    np.testing.assert_array_equal(g, l)
    np.testing.assert_array_equal(aux, r)
    assert aux.dtype == np.uint8
    pf.close()
