"""SE(3)/Sim(3) unit tests against scipy.spatial.transform oracles and
algebraic identities (exp/log roundtrip, composition, inverse)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from orb_slam_2_ros_tpu.geometry import se3, sim3

RNG = np.random.default_rng(0)


def random_quats(n):
    q = RNG.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q[q[:, 0] < 0] *= -1
    return q


def test_quat_rotate_matches_scipy():
    q = random_quats(64)
    v = RNG.normal(size=(64, 3))
    ours = np.asarray(se3.quat_rotate(jnp.array(q), jnp.array(v)))
    # scipy uses xyzw ordering
    theirs = R.from_quat(q[:, [1, 2, 3, 0]]).apply(v)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_quat_mul_matches_scipy():
    a, b = random_quats(32), random_quats(32)
    ours = np.asarray(se3.quat_mul(jnp.array(a), jnp.array(b)))
    theirs = (R.from_quat(a[:, [1, 2, 3, 0]]) * R.from_quat(b[:, [1, 2, 3, 0]])).as_quat()
    theirs = theirs[:, [3, 0, 1, 2]]
    sign = np.sign(np.sum(ours * theirs, axis=-1, keepdims=True))
    np.testing.assert_allclose(ours, theirs * sign, atol=1e-5)


def test_quat_matrix_roundtrip():
    q = random_quats(64)
    m = se3.quat_to_matrix(jnp.array(q))
    theirs = R.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(np.asarray(m), theirs, atol=1e-5)
    q2 = np.asarray(se3.quat_from_matrix(m))
    sign = np.sign(np.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-5)


def bounded_rotvec(n, max_angle=0.9 * np.pi):
    """Random rotation vectors within the principal domain |phi| < pi
    (log returns the principal value, so roundtrip only holds there)."""
    d = RNG.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return d * RNG.uniform(0, max_angle, size=(n, 1))


def test_quat_exp_log_roundtrip():
    phi = bounded_rotvec(64)
    q = se3.quat_exp(jnp.array(phi))
    theirs = R.from_rotvec(phi).as_quat()[:, [3, 0, 1, 2]]
    ours = np.asarray(q)
    sign = np.sign(np.sum(ours * theirs, axis=-1, keepdims=True))
    np.testing.assert_allclose(ours, theirs * sign, atol=1e-5)
    phi2 = np.asarray(se3.quat_log(q))
    np.testing.assert_allclose(phi2, phi, atol=1e-4)


def test_quat_exp_log_small_angle():
    phi = np.array([[1e-9, 0, 0], [0.0, 0.0, 0.0], [1e-7, -1e-7, 1e-8]])
    q = se3.quat_exp(jnp.array(phi))
    assert np.all(np.isfinite(np.asarray(q)))
    phi2 = np.asarray(se3.quat_log(q))
    np.testing.assert_allclose(phi2, phi, atol=1e-6)


def test_se3_compose_inverse():
    qa, qb = jnp.array(random_quats(16)), jnp.array(random_quats(16))
    ta, tb = jnp.array(RNG.normal(size=(16, 3))), jnp.array(RNG.normal(size=(16, 3)))
    x = jnp.array(RNG.normal(size=(16, 3)))
    qc, tc = se3.compose(qa, ta, qb, tb)
    y1 = se3.apply(qc, tc, x)
    y2 = se3.apply(qa, ta, se3.apply(qb, tb, x))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)
    qi, ti = se3.inverse(qa, ta)
    x_rt = se3.apply(qi, ti, se3.apply(qa, ta, x))
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), atol=1e-5)


def test_se3_exp_log_roundtrip():
    xi = np.concatenate([RNG.normal(size=(64, 3)), bounded_rotvec(64)], axis=-1)
    q, t = se3.exp(jnp.array(xi))
    xi2 = np.asarray(se3.log(q, t))
    np.testing.assert_allclose(xi2, xi, atol=1e-4)


def test_se3_exp_matches_matrix_expm():
    from scipy.linalg import expm
    xi = RNG.normal(size=(8, 6))
    q, t = se3.exp(jnp.array(xi))
    T = np.asarray(se3.to_matrix(q, t))
    for i in range(8):
        rho, phi = xi[i, :3], xi[i, 3:]
        hat = np.zeros((4, 4))
        hat[:3, :3] = np.array([[0, -phi[2], phi[1]],
                                [phi[2], 0, -phi[0]],
                                [-phi[1], phi[0], 0]])
        hat[:3, 3] = rho
        np.testing.assert_allclose(T[i], expm(hat), atol=1e-4)


def test_camera_center():
    q = jnp.array(random_quats(8))
    t = jnp.array(RNG.normal(size=(8, 3)))
    c = se3.camera_center(q, t)
    # camera center maps to origin
    np.testing.assert_allclose(np.asarray(se3.apply(q, t, c)), 0.0, atol=1e-5)


def test_sim3_compose_apply_inverse():
    q1, q2 = jnp.array(random_quats(16)), jnp.array(random_quats(16))
    t1, t2 = jnp.array(RNG.normal(size=(16, 3))), jnp.array(RNG.normal(size=(16, 3)))
    s1 = jnp.array(np.exp(RNG.normal(size=(16, 1)) * 0.3))
    s2 = jnp.array(np.exp(RNG.normal(size=(16, 1)) * 0.3))
    x = jnp.array(RNG.normal(size=(16, 3)))
    qc, tc, sc = sim3.compose(q1, t1, s1, q2, t2, s2)
    y1 = sim3.apply(qc, tc, sc, x)
    y2 = sim3.apply(q1, t1, s1, sim3.apply(q2, t2, s2, x))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)
    qi, ti, si = sim3.inverse(q1, t1, s1)
    x_rt = sim3.apply(qi, ti, si, sim3.apply(q1, t1, s1, x))
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x), atol=1e-4)


def test_sim3_exp_log_roundtrip():
    xi = np.concatenate(
        [RNG.normal(size=(64, 3)), bounded_rotvec(64),
         RNG.normal(size=(64, 1)) * 0.4], axis=-1)
    q, t, s = sim3.exp(jnp.array(xi))
    assert np.all(np.isfinite(np.asarray(t)))
    xi2 = np.asarray(sim3.log(q, t, s))
    np.testing.assert_allclose(xi2, xi, atol=1e-3)


def test_sim3_exp_zero_is_identity():
    q, t, s = sim3.exp(jnp.zeros((7,)))
    np.testing.assert_allclose(np.asarray(q), [1, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-6)


def test_sim3_se3_consistency():
    # sigma=0 must reduce to SE3 exp
    xi6 = RNG.normal(size=(16, 6))
    xi7 = np.concatenate([xi6, np.zeros((16, 1))], axis=-1)
    q7, t7, s7 = sim3.exp(jnp.array(xi7))
    q6, t6 = se3.exp(jnp.array(xi6))
    np.testing.assert_allclose(np.asarray(s7), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t7), np.asarray(t6), atol=1e-4)
    dot = np.abs(np.sum(np.asarray(q7) * np.asarray(q6), axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-6)


def test_jit_and_vmap():
    q = jnp.array(random_quats(8))
    t = jnp.array(RNG.normal(size=(8, 3)))
    f = jax.jit(lambda q, t: se3.log(*se3.inverse(q, t)))
    out = f(q, t)
    assert out.shape == (8, 6)
    g = jax.vmap(lambda q, t: se3.camera_center(q, t))
    assert g(q, t).shape == (8, 3)
