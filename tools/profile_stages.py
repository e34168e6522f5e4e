"""Per-stage device timing for the tracking hot path on the real chip.

Times each jitted stage (ORB extraction, frame build, matchers, pose LM,
full frame step) in the relay's honest per-launch mode (one device fetch
first — see bench.py). Prints milliseconds per call. Use to attribute
frame-time regressions; the end-of-round number comes from bench.py.

Usage: python tools/profile_stages.py [--reps 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np


def timeit(fn, reps):
    import jax
    fn()  # compile
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from orb_slam_2_ros_tpu.config import SlamConfig, SENSOR_RGBD
    from orb_slam_2_ros_tpu.io.synthetic import SyntheticRGBD
    from orb_slam_2_ros_tpu.frontend import extractor, frame as frame_mod, matcher
    from orb_slam_2_ros_tpu.solvers.pose_opt import pose_optimization
    from orb_slam_2_ros_tpu.pipeline.tracking import Tracker

    cfg = SlamConfig(sensor=SENSOR_RGBD)
    ds = SyntheticRGBD(cfg, n_frames=4, seed=0)
    gray, depth = ds[0]

    # honest-timing mode (see bench.py)
    _ = float(jax.device_get(jax.jit(lambda: jnp.float32(1.0))()))
    print(f"platform: {jax.devices()[0].platform}", file=sys.stderr)

    g = jax.device_put(jnp.asarray(gray, jnp.float32))
    d = jax.device_put(jnp.asarray(depth, jnp.float32))

    extract_j = jax.jit(lambda im: extractor.extract(im, cfg.orb))
    print(f"extract:          {timeit(lambda: extract_j(g), args.reps):8.3f} ms")

    build_j = jax.jit(lambda im, dd: frame_mod.build_rgbd(im, dd, cfg))
    fr = build_j(g, d)
    print(f"build_rgbd:       {timeit(lambda: build_j(g, d), args.reps):8.3f} ms")

    # pose LM over max_kps edges (the per-frame shape)
    P = cfg.orb.max_kps
    rng = np.random.default_rng(0)
    pts = jax.device_put(jnp.asarray(rng.normal(0, 1, (P, 3)) + [0, 0, 3],
                                     jnp.float32))
    q0 = jnp.array([1.0, 0, 0, 0])
    t0 = jnp.zeros(3)
    uv = fr.uv
    ur = fr.u_right
    octv = fr.kps.octave
    vmask = fr.valid
    pose_j = jax.jit(lambda q, t: pose_optimization(
        q, t, pts, uv, ur, octv, vmask, cfg))
    print(f"pose_opt (4x10):  {timeit(lambda: pose_j(q0, t0), args.reps):8.3f} ms")

    # in-scan pieces on a realistic tracked state: build a small map first
    from orb_slam_2_ros_tpu.frontend import matcher
    from orb_slam_2_ros_tpu.map import state as map_state
    from orb_slam_2_ros_tpu.geometry import se3

    tracker0 = Tracker(cfg)
    grays0 = np.stack([ds[i][0] for i in range(4)])
    depths0 = np.stack([ds[i][1] for i in range(4)])
    tracker0.process_chunk(grays0, depths0, ds.timestamps[:4],
                           defer_fetch=True)
    m = tracker0.carry.m

    tv_j = jax.jit(lambda q, t: matcher.frustum_check(
        q, t, m.mp_pos, m.mp_normal, m.mp_min_dist, m.mp_max_dist,
        m.mp_valid, cfg))
    tv = tv_j(q0, t0)
    print(f"frustum_check:    {timeit(lambda: tv_j(q0, t0), args.reps):8.3f} ms")

    slm_j = jax.jit(lambda: matcher.search_local_map(
        tv, m.mp_desc, fr, fr.valid & False, cfg))
    print(f"search_local_map: {timeit(slm_j, args.reps):8.3f} ms")

    spp_j = jax.jit(lambda q, t: matcher.search_by_projection_pose(
        pts, m.mp_desc[:P], jnp.zeros((P,), jnp.int32),
        jnp.ones((P,), bool), q, t, fr, cfg, th=15.0,
        src_angle=fr.kps.angle, check_rotation=True, widen_below=20))
    print(f"search_by_proj:   {timeit(lambda: spp_j(q0, t0), args.reps):8.3f} ms")

    commit_j = jax.jit(lambda mm, need: map_state.commit_keyframe(
        mm, fr, q0, t0, jnp.int32(5), jnp.full((P,), -1, jnp.int32),
        need, cfg, close_only=True, max_spawn=P)[0])
    need = jnp.array(True)
    print(f"commit_keyframe:  {timeit(lambda: commit_j(m, need), args.reps):8.3f} ms")

    # full tracking frame-step via one 16-frame chunk / 16
    tracker = Tracker(cfg)
    grays = np.stack([ds[i][0] for i in range(4)] * 4)
    depths = np.stack([ds[i][1] for i in range(4)] * 4)
    gw, dw = tracker.to_wire(grays, depths)
    gw = jax.device_put(jnp.asarray(gw))
    dw = jax.device_put(jnp.asarray(dw))
    act = jax.device_put(np.ones(tracker.chunk, bool))

    def chunk():
        c, outs = tracker._track_chunk(tracker.carry, gw, dw, act)
        return outs
    ms = timeit(chunk, max(2, args.reps // 4))
    print(f"track_chunk/16:   {ms:8.3f} ms  ({ms / tracker.chunk:.3f} ms/frame)")


if __name__ == "__main__":
    main()
