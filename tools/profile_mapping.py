"""Per-stage device timing for the mapping step (LocalMapper) on the real
chip: triangulation, fusion, windowed BA, culling, point-stat refresh.

Usage: python tools/profile_mapping.py [--reps 10]
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
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    from orb_slam_2_ros_tpu.config import SlamConfig, SENSOR_RGBD
    from orb_slam_2_ros_tpu.io.synthetic import SyntheticRGBD
    from orb_slam_2_ros_tpu.pipeline.tracking import Tracker
    from orb_slam_2_ros_tpu.pipeline import local_mapping as lm
    from orb_slam_2_ros_tpu.map import state as map_state

    cfg = SlamConfig(sensor=SENSOR_RGBD)
    ds = SyntheticRGBD(cfg, n_frames=32, seed=0)
    tracker = Tracker(cfg)
    grays = np.stack([ds[i][0] for i in range(32)])
    depths = np.stack([ds[i][1] for i in range(32)])
    tracker.process_chunk(grays, depths, ds.timestamps, defer_fetch=True)
    m = tracker.carry.m
    _ = float(np.asarray(jax.device_get(m.n_kfs)))   # honest-timing mode
    print(f"map: {int(jax.device_get(m.n_kfs))} kfs, "
          f"{int(np.asarray(jax.device_get(m.mp_valid)).sum())} points")

    mapper = lm.LocalMapper(cfg, window=20)

    # windowed BA in isolation at several LM budgets -> ms/iteration
    from orb_slam_2_ros_tpu.solvers import ba as ba_mod
    import jax.numpy as jnp

    def run_wba(mm, phases):
        K, P, M = mm.K, mm.P, mm.M
        W2 = 40
        n = mm.n_kfs
        rows_idx = n - W2 + jnp.arange(W2)
        row_ok = (rows_idx >= 0) & mm.kf_valid[jnp.clip(rows_idx, 0)]
        rows = jnp.clip(rows_idx, 0)
        c_mp = jnp.where(row_ok[:, None], mm.kf_mp[rows], -1)
        c_kpv = mm.kf_kp_valid[rows] & row_ok[:, None]
        w_local = W2 - 20 + jnp.arange(20)
        w_ok = row_ok[w_local] & (rows_idx[w_local] > 0)
        window_rows = jnp.where(w_ok, w_local, -1).astype(jnp.int32)
        in_win_row = jnp.zeros((W2,), bool).at[w_local].set(w_ok)
        obs = jnp.where(in_win_row[:, None] & (c_mp >= 0), c_mp, M)
        mp_free = jnp.zeros((M + 1,), bool).at[obs.ravel()].set(True)[:M]
        mp_free = mp_free & mm.mp_valid
        return ba_mod.windowed_bundle_adjustment(
            mm.kf_q[rows], mm.kf_t[rows], window_rows, mm.kf_uv[rows],
            mm.kf_ur[rows], mm.kf_octave[rows], c_mp, c_kpv,
            mm.mp_pos, mp_free, cfg, phases=phases)[0]

    for ph in ((1,), (5, 10)):
        f = jax.jit(lambda mm, p=ph: run_wba(mm, p))
        ms = timeit(lambda: f(m), args.reps)
        print(f"windowed BA {str(ph):8s} {ms:8.2f} ms")

    stages = {
        "create_new_map_points": jax.jit(
            lambda mm: lm.create_new_map_points(mm, cfg)[0]),
        "fuse_duplicates": jax.jit(lambda mm: lm.fuse_duplicates(mm, cfg)[0]),
        "cull_keyframes": jax.jit(lambda mm: lm.cull_keyframes(mm, cfg)[0]),
        "refresh_point_stats": jax.jit(
            lambda mm: map_state.refresh_point_stats(mm, cfg)),
        "covisibility": jax.jit(lambda mm: map_state.covisibility(mm)),
        "FULL mapping step": lambda mm: mapper.run(mm)[0],
    }
    for name, fn in stages.items():
        ms = timeit(lambda: fn(m), args.reps)
        print(f"{name:24s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
