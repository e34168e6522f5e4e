"""Per-stage device timing for the FULL pipeline (System.track_chunk) on the
real chip: tracking chunk, mapping step, loop ingest+detect, background-GBA
chunk. Each stage is block_until_ready-timed so the async dispatch queue
cannot smear cost across stages.

Renders the bench's revisit sequence once and caches it under /tmp so
re-profiling after a code change costs seconds, not minutes.

Usage: python tools/profile_full_system.py [--frames 160]
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


def cached_sequence(cfg, n):
    path = f"/tmp/loop_seq_{n}.npz"
    if os.path.exists(path):
        d = np.load(path)
        return d["grays"], d["depths"], d["ts"]
    from orb_slam_2_ros_tpu.io.synthetic import SyntheticRGBD
    ds = SyntheticRGBD(cfg, n_frames=n, seed=0, trajectory="loop")
    grays = np.stack([ds[i][0] for i in range(n)])
    depths = np.stack([ds[i][1] for i in range(n)])
    np.savez_compressed(path, grays=grays, depths=depths, ts=ds.timestamps)
    return grays, depths, ds.timestamps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=160)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from orb_slam_2_ros_tpu.config import SlamConfig, SENSOR_RGBD
    from orb_slam_2_ros_tpu.frontend import frame as frame_mod
    from orb_slam_2_ros_tpu.pipeline.slam import System
    from orb_slam_2_ros_tpu.place import vocabulary

    cfg = SlamConfig(sensor=SENSOR_RGBD)
    n = args.frames
    t0 = time.perf_counter()
    grays, depths, ts = cached_sequence(cfg, n)
    print(f"sequence: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    _ = float(jax.device_get(jax.jit(lambda: jnp.float32(1.0))()))
    print(f"platform: {jax.devices()[0].platform}", file=sys.stderr)

    descs = []
    for i in range(0, n, 24):
        f = frame_mod.build_rgbd(jnp.asarray(grays[i], jnp.float32),
                                 jnp.asarray(depths[i], jnp.float32), cfg)
        descs.append(np.asarray(jax.device_get(f.kps.desc))[
            np.asarray(jax.device_get(f.valid))])
    voc = vocabulary.train_vocabulary(np.concatenate(descs), cfg, seed=0)

    sys_ = System(cfg, vocab=voc)
    tr = sys_.tracker
    C = tr.chunk
    g_w, d_w = tr.to_wire(grays, depths)
    chunks = []
    for w0 in range(0, n, C):
        chunks.append((jax.device_put(jnp.asarray(g_w[w0:w0 + C])),
                       jax.device_put(jnp.asarray(d_w[w0:w0 + C]))))
    jax.block_until_ready(chunks)

    stages = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(out) or jnp.zeros(()))
        dt = (time.perf_counter() - t0) * 1e3
        stages.setdefault(name, []).append(dt)
        return out

    lc = sys_.loop_closer
    for i, (g, d) in enumerate(chunks):
        timed("tracking", lambda: tr.process_chunk(
            g, d, list(ts[i * C:(i + 1) * C]), defer_fetch=True,
            prestaged=True))
        jax.block_until_ready(tr.carry.q)
        gba_running = lc is not None and lc.gba_running

        def map_step():
            m2, n_culled, lmp2 = sys_.mapper.run(
                tr.carry.m, tr.carry.last_mp,
                allow_compact=not gba_running, full=True)
            tr.carry = tr.carry._replace(m=m2, last_mp=lmp2)
            return m2.kf_q
        timed("map_step", map_step)

        def loop_step():
            m2, closed = lc.process(tr.carry.m)
            if closed:
                tr.adopt_map(m2)
            return m2.kf_q
        timed("loop_process", loop_step)

        def gba_step():
            m3, finished = lc.step_background(tr.carry.m)
            if finished:
                tr.adopt_map(m3)
            return m3.kf_q if m3 is not None else jnp.zeros(())
        timed("gba_chunk" if lc.gba_running else "gba_idle", gba_step)

    print(f"\n{'stage':<14}{'calls':>6}{'mean ms':>10}{'p50':>9}"
          f"{'max':>9}{'total ms':>10}")
    tot = 0.0
    for name, xs in stages.items():
        xs_w = xs[1:] if len(xs) > 2 else xs      # drop compile call
        tot += sum(xs)
        print(f"{name:<14}{len(xs):>6}{np.mean(xs_w):>10.1f}"
              f"{np.median(xs_w):>9.1f}{np.max(xs):>9.1f}{sum(xs):>10.1f}")
    # steady-state fps: per-chunk cost = stages that co-occur every chunk
    # (tracking + map + loop) plus the gba stages weighted by how often each
    # actually ran (gba_idle and gba_chunk are mutually exclusive per chunk)
    def med(name):
        xs = stages.get(name, [])
        return float(np.median(xs[1:] if len(xs) > 2 else xs)) if xs else 0.0

    n_chunks = len(chunks)
    gba_ms = sum(len(stages.get(k, [])) * med(k)
                 for k in ("gba_idle", "gba_chunk")) / max(n_chunks, 1)
    per_chunk = med("tracking") + med("map_step") + med("loop_process") + gba_ms
    print(f"\ntotal {tot:.0f} ms for {n} frames (incl. compiles) -> "
          f"steady-state {C / (per_chunk / 1e3):.1f} fps estimate "
          f"({per_chunk:.0f} ms/chunk of {C})")
    recs = tr.flush()
    from orb_slam_2_ros_tpu.pipeline.tracking import OK
    print(f"OK frames: {sum(r.state == OK for r in recs)}/{len(recs)}, "
          f"loops: {lc.n_loops_closed}, kfs: {int(jax.device_get(tr.carry.m.n_kfs))}")


if __name__ == "__main__":
    main()
