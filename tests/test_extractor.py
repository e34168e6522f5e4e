"""ORB extractor tests against OpenCV / numpy oracles (SURVEY.md §4):
FAST corner masks + scores vs cv2.FastFeatureDetector, rBRIEF bits vs a
direct numpy port of computeOrbDescriptor, IC angles vs a numpy port of
IC_Angle, and OpenCV cross-parity of full descriptors."""

import cv2
import jax.numpy as jnp
import numpy as np
import pytest

from orb_slam_2_ros_tpu.config import OrbConfig
from orb_slam_2_ros_tpu.frontend import extractor
from orb_slam_2_ros_tpu.ops import fast as fast_ops
from orb_slam_2_ros_tpu.ops.image import gaussian_blur_7x7, quantize_u8

RNG = np.random.default_rng(3)


def make_test_image(h=240, w=320):
    """Smooth random texture with structure: blurred noise + shapes."""
    img = RNG.uniform(0, 255, (h, w)).astype(np.float32)
    img = cv2.GaussianBlur(img, (0, 0), 3.0)
    cv2.rectangle(img, (40, 50), (120, 130), 255, -1)
    cv2.circle(img, (220, 150), 40, 30, -1)
    cv2.line(img, (10, 200), (300, 30), 200, 3)
    img = cv2.normalize(img, None, 0, 255, cv2.NORM_MINMAX)
    return np.round(img).astype(np.uint8)


IMG = make_test_image()


def test_fast_mask_matches_opencv():
    th = 20
    score = np.asarray(fast_ops.fast_score_map(jnp.asarray(IMG, jnp.float32)))
    ours = score >= th
    det = cv2.FastFeatureDetector_create(th, nonmaxSuppression=False)
    kps = det.detect(IMG)
    theirs = np.zeros(IMG.shape, bool)
    for kp in kps:
        theirs[int(round(kp.pt[1])), int(round(kp.pt[0]))] = True
    # compare away from the 3px cv2 exclusion border
    ours_in = ours[3:-3, 3:-3]
    theirs_in = theirs[3:-3, 3:-3]
    assert (ours_in == theirs_in).all(), np.argwhere(ours_in != theirs_in)[:10]


def test_fast_score_matches_opencv():
    th = 20
    det = cv2.FastFeatureDetector_create(th, nonmaxSuppression=True)
    kps = det.detect(IMG)
    score = np.asarray(fast_ops.fast_score_map(jnp.asarray(IMG, jnp.float32)))
    for kp in kps[:200]:
        x, y = int(round(kp.pt[0])), int(round(kp.pt[1]))
        assert score[y, x] == pytest.approx(kp.response), (x, y)


def test_fast_nonmax_matches_opencv():
    th = 20
    resp = np.asarray(fast_ops.detect(
        fast_ops.fast_score_map(jnp.asarray(IMG, jnp.float32)),
        threshold=th, min_threshold=th, cell=32, border=3))
    ours = set(map(tuple, np.argwhere(resp > 0)))
    det = cv2.FastFeatureDetector_create(th, nonmaxSuppression=True)
    theirs = {(int(round(kp.pt[1])), int(round(kp.pt[0])))
              for kp in det.detect(IMG)
              if 3 <= kp.pt[0] < IMG.shape[1] - 3 and 3 <= kp.pt[1] < IMG.shape[0] - 3}
    # identical up to the border handling of cv2's internal buffer rows
    sym = ours.symmetric_difference(theirs)
    assert len(sym) <= max(2, 0.01 * len(theirs)), sorted(sym)[:10]


def _ic_angle_numpy(img, x, y):
    """Direct port of IC_Angle (ORBextractor.cc:77-104) as an oracle."""
    um = extractor.umax_table()
    m01, m10 = 0.0, 0.0
    for u in range(-15, 16):
        m10 += u * float(img[y, x + u])
    for v in range(1, 16):
        v_sum = 0.0
        d = um[v]
        for u in range(-d, d + 1):
            val_plus = float(img[y + v, x + u])
            val_minus = float(img[y - v, x + u])
            v_sum += val_plus - val_minus
            m10 += u * (val_plus + val_minus)
        m01 += v * v_sum
    return np.arctan2(m01, m10)


def test_ic_angle_matches_oracle():
    maps = np.asarray(extractor.ic_angle_maps(jnp.asarray(IMG, jnp.float32)))
    pts = [(60, 60), (100, 120), (150, 200), (30, 30), (200, 280)]
    xs = jnp.asarray([p[1] for p in pts], jnp.int32)
    ys = jnp.asarray([p[0] for p in pts], jnp.int32)
    fast = np.asarray(extractor.ic_angles_at(jnp.asarray(IMG, jnp.float32), xs, ys))
    for i, (y, x) in enumerate(pts):
        expected = _ic_angle_numpy(IMG.astype(np.float32), x, y)
        got = np.arctan2(maps[1, y, x], maps[0, y, x])
        assert abs(np.angle(np.exp(1j * (got - expected)))) < 1e-4, (y, x)
        # the production prefix-sum path must agree with the conv/oracle path
        assert abs(np.angle(np.exp(1j * (fast[i] - expected)))) < 1e-3, (y, x)


def _brief_numpy(blurred, x, y, angle):
    """Direct port of computeOrbDescriptor (ORBextractor.cc:108-147)."""
    pat = extractor._brief_pattern().astype(np.float64)
    a, b = np.cos(angle), np.sin(angle)
    desc = np.zeros(32, np.uint8)
    def val(i):
        px, py = pat[i]
        # np.round == round-half-even == cvRound
        sx = int(np.round(px * a - py * b)) + x
        sy = int(np.round(px * b + py * a)) + y
        return blurred[sy, sx]
    for byte in range(32):
        v = 0
        for bit in range(8):
            i = byte * 8 + bit
            v |= int(val(2 * i) < val(2 * i + 1)) << bit
        desc[byte] = v
    return desc


def test_brief_matches_numpy_oracle():
    blurred = np.asarray(quantize_u8(gaussian_blur_7x7(jnp.asarray(IMG, jnp.float32))))
    xs = np.array([60, 100, 200, 150, 255], np.int32)
    ys = np.array([60, 120, 150, 200, 100], np.int32)
    angles = np.array([0.0, 0.5, -1.2, 2.8, 3.9], np.float32)
    ours = np.asarray(extractor._descriptors(
        jnp.asarray(blurred), jnp.asarray(xs), jnp.asarray(ys), jnp.asarray(angles)))
    for i in range(len(xs)):
        expected = _brief_numpy(blurred, xs[i], ys[i], float(angles[i]))
        got_bytes = np.frombuffer(np.ascontiguousarray(ours[i]).tobytes(), np.uint8)
        np.testing.assert_array_equal(got_bytes, expected, err_msg=f"kp {i}")


def test_blur_close_to_opencv():
    ours = np.asarray(quantize_u8(gaussian_blur_7x7(jnp.asarray(IMG, jnp.float32))))
    theirs = cv2.GaussianBlur(IMG, (7, 7), 2, borderType=cv2.BORDER_REFLECT_101)
    diff = np.abs(ours.astype(int) - theirs.astype(int))
    assert diff.max() <= 1 and (diff > 0).mean() < 0.02


def test_extract_end_to_end():
    cfg = OrbConfig(n_features=300, n_levels=3, max_kps=384)
    kps = extractor.extract(jnp.asarray(IMG, jnp.float32), cfg)
    assert kps.xy.shape == (384, 2)
    assert kps.desc.shape == (384, 8)
    n = int(np.asarray(kps.n))
    assert 50 < n <= 300
    v = np.asarray(kps.valid)
    assert np.all(np.asarray(kps.response)[v] > 0)
    # level-0 coords must lie inside the image
    xy = np.asarray(kps.xy)[v]
    assert xy[:, 0].max() < IMG.shape[1] and xy[:, 1].max() < IMG.shape[0]
    octv = np.asarray(kps.octave)[v]
    assert set(np.unique(octv)) <= {0, 1, 2}
    # padded slots are invalid
    assert not v[-(384 - 300):].any()


def test_extract_descriptor_parity_with_opencv():
    """Cross-check full-pipeline descriptors against cv2.ORB.compute on our
    keypoints (level 0). Small bit differences allowed: OpenCV's fixed-point
    blur and fastAtan2 deviate slightly from our float path."""
    rich = IMG.copy()
    noise = RNG.uniform(-40, 40, IMG.shape)
    rich = np.clip(rich.astype(np.float32) + noise, 0, 255).round().astype(np.uint8)
    cfg = OrbConfig(n_features=400, n_levels=1, max_kps=512)
    kps = extractor.extract(jnp.asarray(rich, jnp.float32), cfg)
    v = np.asarray(kps.valid)
    xy = np.asarray(kps.xy)[v]
    ang = np.degrees(np.asarray(kps.angle)[v]) % 360.0
    resp = np.asarray(kps.response)[v]
    ours = np.asarray(kps.desc)[v]
    cv_kps = [cv2.KeyPoint(float(x), float(y), 31.0, float(a), float(r), 0)
              for (x, y), a, r in zip(xy, ang, resp)]
    orb = cv2.ORB_create(nfeatures=1000, nlevels=1, edgeThreshold=19, patchSize=31,
                         fastThreshold=20)
    out_kps, cv_desc = orb.compute(rich, cv_kps)
    # map retained cv kps back to ours by coordinates
    coords = {(round(k.pt[0], 1), round(k.pt[1], 1)): i for i, k in enumerate(out_kps)}
    n_cmp, total_bits_diff = 0, 0
    for j, (x, y) in enumerate(xy):
        key = (round(float(x), 1), round(float(y), 1))
        if key not in coords:
            continue
        ours_bytes = np.frombuffer(np.ascontiguousarray(ours[j]).tobytes(), np.uint8)
        diff = np.unpackbits(ours_bytes ^ cv_desc[coords[key]]).sum()
        total_bits_diff += diff
        n_cmp += 1
    assert n_cmp > 100
    assert total_bits_diff / n_cmp < 8.0, total_bits_diff / n_cmp


def test_patch_matmul_path_equals_gather_oracle():
    """The production gather-free path (one-hot matmul patches -> in-patch
    IC angle + rBRIEF) must reproduce the direct gather implementations
    bit-exactly: both read identical integral pixel values."""
    img = jnp.asarray(IMG, jnp.float32)
    blurred = quantize_u8(gaussian_blur_7x7(img))
    n = 64
    xs = jnp.asarray(RNG.integers(19, IMG.shape[1] - 19, n), jnp.int32)
    ys = jnp.asarray(RNG.integers(19, IMG.shape[0] - 19, n), jnp.int32)
    patches = extractor._patches_at(img, blurred, xs, ys)
    angle = extractor._ic_angles_from_patches(patches[:, 0])
    angle_ref = extractor.ic_angles_at(img, xs, ys)
    np.testing.assert_allclose(np.asarray(angle), np.asarray(angle_ref),
                               rtol=0, atol=1e-5)
    desc = extractor._descriptors_from_patches(patches[:, 1], angle)
    desc_ref = extractor._descriptors(blurred, xs, ys, angle)
    np.testing.assert_array_equal(np.asarray(desc), np.asarray(desc_ref))


def test_level_budgets():
    cfg = OrbConfig(n_features=1200, n_levels=8)
    b = extractor.level_budgets(cfg)
    assert sum(b) == 1200 and len(b) == 8
    assert b[0] > b[1] > b[-1] > 0
