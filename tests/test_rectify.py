"""Stereo rectification (geometry/rectify.py): Bouguet split + radtan
remap, validated against exact synthetic geometry — the property the
row-band stereo matcher depends on (``Frame.cc:502-676``): after
rectification, a landmark's two projections share a row and their column
difference is exactly fx*b/z."""

import numpy as np

from orb_slam_2_ros_tpu.geometry import rectify as rect


def make_rig():
    """An EuRoC-like rig: cam1 ~11 cm to the right of cam0, slightly
    rotated, both with radtan distortion."""
    K0 = np.array([[458.6, 0, 367.2], [0, 457.3, 248.4], [0, 0, 1.0]])
    K1 = np.array([[457.6, 0, 379.0], [0, 456.1, 255.2], [0, 0, 1.0]])
    D0 = np.array([-0.2834, 0.0739, 0.0002, 1.76e-5])
    D1 = np.array([-0.2837, 0.0745, -0.0001, -3.55e-5])
    # cam0 -> cam1: x1 = R x0 + t (right camera at +x of the left)
    R = rect.rodrigues(np.array([0.003, -0.007, 0.002]))
    c1_in_c0 = np.array([0.110, 0.0004, -0.0008])
    t = -R @ c1_in_c0
    return K0, D0, K1, D1, R, t


def test_rodrigues_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(10):
        r = rng.normal(0, 1, 3)
        R = rect.rodrigues(r)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(rect.log_so3(R),
                                   r / np.linalg.norm(r)
                                   * (np.linalg.norm(r) % (2 * np.pi)),
                                   atol=1e-9)


def test_rectified_rows_align_and_disparity_exact():
    K0, D0, K1, D1, R, t = make_rig()
    size = (752, 480)
    R0, R1, Kn, b = rect.stereo_rectify(K0, D0, K1, D1, R, t, size)
    np.testing.assert_allclose(b, 0.110, atol=1e-4)   # |c1| has tiny y/z

    rng = np.random.default_rng(1)
    pts0 = np.stack([rng.uniform(-1.5, 1.5, 200),
                     rng.uniform(-1.0, 1.0, 200),
                     rng.uniform(2.0, 8.0, 200)], -1)   # in cam0 frame
    # rectified projections
    xr0 = pts0 @ R0.T
    xr1 = (pts0 @ R.T + t) @ R1.T
    u0 = Kn[0, 0] * xr0[:, 0] / xr0[:, 2] + Kn[0, 2]
    v0 = Kn[1, 1] * xr0[:, 1] / xr0[:, 2] + Kn[1, 2]
    u1 = Kn[0, 0] * xr1[:, 0] / xr1[:, 2] + Kn[0, 2]
    v1 = Kn[1, 1] * xr1[:, 1] / xr1[:, 2] + Kn[1, 2]
    # rows align; disparity = fx * b / z; uR < uL (engine convention)
    np.testing.assert_allclose(v1, v0, atol=1e-6)
    np.testing.assert_allclose(xr1[:, 2], xr0[:, 2], atol=1e-9)
    np.testing.assert_allclose(u0 - u1, Kn[0, 0] * b / xr0[:, 2], atol=1e-6)


def test_rectify_map_inverts_distorted_projection():
    """The remap table must send each rectified pixel to the landmark's
    DISTORTED source-image location (initUndistortRectifyMap semantics)."""
    K0, D0, K1, D1, R, t = make_rig()
    size = (752, 480)
    R0, R1, Kn, b = rect.stereo_rectify(K0, D0, K1, D1, R, t, size)
    rng = np.random.default_rng(2)
    pts0 = np.stack([rng.uniform(-1.0, 1.0, 100),
                     rng.uniform(-0.7, 0.7, 100),
                     rng.uniform(2.5, 7.0, 100)], -1)
    for (Rr, K, D, xform) in ((R0, K0, D0, lambda p: p),
                              (R1, K1, D1, lambda p: p @ R.T + t)):
        xc = xform(pts0)
        # forward: distorted source projection
        src_gt = rect.distort_radtan(xc[:, :2] / xc[:, 2:3], D)
        src_gt = np.stack([K[0, 0] * src_gt[:, 0] + K[0, 2],
                           K[1, 1] * src_gt[:, 1] + K[1, 2]], -1)
        # rectified projection -> table lookup
        xr = xc @ Rr.T
        uv = np.stack([Kn[0, 0] * xr[:, 0] / xr[:, 2] + Kn[0, 2],
                       Kn[1, 1] * xr[:, 1] / xr[:, 2] + Kn[1, 2]], -1)
        src = rect.rectified_to_source(Kn, Rr, K, D, uv)
        np.testing.assert_allclose(src, src_gt, atol=1e-6)


def test_remap_bilinear_identity_and_shift():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (48, 64)).astype(np.float32)
    u, v = np.meshgrid(np.arange(64, dtype=np.float32),
                       np.arange(48, dtype=np.float32))
    ident = np.stack([u, v], -1)
    # interior exact; the last row/column clamp to the border by design
    np.testing.assert_allclose(rect.remap_bilinear(img, ident)[:-1, :-1],
                               img[:-1, :-1], atol=1e-4)
    half = ident + np.array([0.5, 0.0], np.float32)
    out = rect.remap_bilinear(img, half)
    np.testing.assert_allclose(out[:-1, :-2],
                               0.5 * (img[:-1, :-2] + img[:-1, 1:-1]),
                               atol=1e-3)


def test_euroc_yaml_parse(tmp_path):
    from orb_slam_2_ros_tpu.io.datasets import _parse_euroc_yaml
    y = tmp_path / "sensor.yaml"
    y.write_text("""%YAML:1.0
sensor_type: camera
T_BS:
  cols: 4
  rows: 4
  data: [0.01, -0.99, 0.0, -0.02,
         0.99, 0.01, 0.0, -0.06,
         0.0, 0.0, 1.0, 0.01,
         0.0, 0.0, 0.0, 1.0]
rate_hz: 20
resolution: [752, 480]
camera_model: pinhole
intrinsics: [458.654, 457.296, 367.215, 248.375]
distortion_model: radial-tangential
distortion_coefficients: [-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05]
""")
    d = _parse_euroc_yaml(str(y))
    assert d["T_BS"].shape == (4, 4)
    np.testing.assert_allclose(d["T_BS"][1, 0], 0.99)
    np.testing.assert_allclose(d["intrinsics"],
                               [458.654, 457.296, 367.215, 248.375])
    np.testing.assert_allclose(d["resolution"], [752, 480])
    assert len(d["distortion_coefficients"]) == 4
