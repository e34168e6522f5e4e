"""CLI runner: the executable replacing the reference's ROS nodes.

``python -m orb_slam_2_ros_tpu.run --dataset synthetic --frames 60`` runs the
full pipeline and prints per-chunk tracking state plus final ATE; real data
comes in via ``--dataset tum|kitti|euroc --path <dir>``. Replaces the
`orb_slam2_ros_{mono,stereo,rgbd}` mains (§2.20) with the topic-free
equivalent: ``--sensor`` picks the pipeline like choosing the executable;
``--save-map``/``--load-map`` replace the SaveMap service
(``srv/SaveMap.srv``); ``--save-traj`` the shutdown auto-save
(``ros/src/Node.cc:13-21``); ``--localization-only`` the dynamic-reconfigure
toggle; loop closure + background GBA run by default (``--no-loop-closing``
opts out).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _setup_compile_cache():
    """Persistent XLA compile cache: programs build in tens of seconds
    through the remote-compile relay, <1 s from cache. Must go through
    jax.config.update — env vars are dead when a sitecustomize imports jax
    at interpreter start."""
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main(argv=None):
    _setup_compile_cache()
    ap = argparse.ArgumentParser(description="TPU-native ORB-SLAM2-class engine")
    ap.add_argument("--dataset",
                    choices=["synthetic", "tum", "kitti", "euroc"],
                    default="synthetic")
    ap.add_argument("--sensor", choices=["mono", "stereo", "rgbd"],
                    help="default: rgbd for tum/synthetic, stereo for "
                         "kitti/euroc")
    ap.add_argument("--path", help="dataset directory (tum/kitti/euroc)")
    ap.add_argument("--preset",
                    help="camera preset (tum1/tum2/tum3/kitti/euroc/r200/"
                         "d435/mynteye/zed2) ≙ choosing a launch file; "
                         "defaults per dataset")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-ba", action="store_true", help="disable local BA")
    ap.add_argument("--loop-closing", dest="loop_closing",
                    action="store_true", default=True,
                    help="loop detection + Sim3 correction + background GBA "
                         "(ON by default, like the reference)")
    ap.add_argument("--no-loop-closing", dest="loop_closing",
                    action="store_false")
    ap.add_argument("--localization-only", action="store_true")
    ap.add_argument("--save-map", help="write map npz on exit")
    ap.add_argument("--load-map", help="load map npz at start")
    ap.add_argument("--merge-map",
                    help="merge a saved session's map npz into this run's "
                         "map after tracking (multi-session joint mapping)")
    ap.add_argument("--vocab", help="vocabulary file (.bin/.txt/.npz)")
    ap.add_argument("--gt-poses",
                    help="KITTI ground-truth poses file for --dataset kitti "
                         "(enables ATE + t_rel/r_rel evaluation)")
    ap.add_argument("--save-traj", help="write TUM trajectory on exit")
    ap.add_argument("--save-kf-traj", help="write TUM keyframe trajectory")
    ap.add_argument("--save-debug-image", help="write final annotated frame")
    ap.add_argument("--profile",
                    help="write a jax.profiler (xprof) trace of the run to "
                         "this directory (SURVEY.md §5.1: the reference has "
                         "no tracing; stdout prints only)")
    # multi-host runtime (SURVEY.md §5.8): every host runs this same
    # command; --coordinator wires the jax.distributed rendezvous and the
    # loop GBA / windowed BA shard over the GLOBAL mesh (ICI within a host,
    # DCN across hosts; parallel/multihost.py)
    ap.add_argument("--coordinator",
                    help="host:port of the jax.distributed coordination "
                         "service (multi-host jobs; omit on single host)")
    ap.add_argument("--num-hosts", type=int, default=None)
    ap.add_argument("--host-id", type=int, default=None)
    ap.add_argument("--mesh", action="store_true",
                    help="build a device mesh over all (local or global) "
                         "devices and route the loop GBA + windowed BA "
                         "through it (parallel/dist_ba.py)")
    args = ap.parse_args(argv)

    from orb_slam_2_ros_tpu.config import (SENSOR_MONOCULAR, SENSOR_RGBD,
                                           SENSOR_STEREO, SlamConfig)
    from orb_slam_2_ros_tpu.pipeline.slam import System
    from orb_slam_2_ros_tpu.pipeline.tracking import OK
    from orb_slam_2_ros_tpu.io.trajectory import ate_rmse

    if args.dataset in ("tum", "kitti", "euroc") and not args.path:
        ap.error(f"--dataset {args.dataset} requires --path")

    sensor_name = args.sensor or {"synthetic": "rgbd", "tum": "rgbd",
                                  "kitti": "stereo", "euroc": "stereo"}[
        args.dataset]
    sensor = {"mono": SENSOR_MONOCULAR, "stereo": SENSOR_STEREO,
              "rgbd": SENSOR_RGBD}[sensor_name]

    from orb_slam_2_ros_tpu import presets
    preset_name = args.preset or {"synthetic": None, "tum": "tum1",
                                  "kitti": "kitti", "euroc": "euroc"}[
        args.dataset]
    gt = None
    if args.dataset == "synthetic":
        from orb_slam_2_ros_tpu.io.synthetic import (SyntheticRGBD,
                                                     SyntheticStereo)
        cfg = (presets.get(preset_name, sensor) if preset_name
               else SlamConfig(sensor=sensor))
        if sensor == SENSOR_STEREO:
            ds = SyntheticStereo(cfg, n_frames=args.frames, seed=args.seed)
        else:
            ds = SyntheticRGBD(cfg, n_frames=args.frames, seed=args.seed)
        gt = np.stack([ds.gt_pose_wc(i)[1] for i in range(len(ds))])
    elif args.dataset == "tum":
        from orb_slam_2_ros_tpu.io.datasets import TumRGBD
        cfg = presets.get(preset_name, sensor)
        ds = TumRGBD(args.path, cfg.camera.depth_map_factor)
    elif args.dataset == "kitti":
        from orb_slam_2_ros_tpu.io.datasets import KittiOdometry
        cfg = presets.get(preset_name, sensor)
        ds = KittiOdometry(args.path)
        calib = ds.calibration()
        if calib is not None:
            # per-sequence intrinsics from calib.txt (the camera_info
            # equivalent, ros/src/Node.cc:336-358)
            import dataclasses as _dc
            cfg = cfg.replace(camera=_dc.replace(cfg.camera, **calib))
    else:
        from orb_slam_2_ros_tpu.io.datasets import EurocMav
        cfg = presets.get(preset_name, sensor)
        ds = EurocMav(args.path)
        calib = ds.calibration()
        if calib is not None:
            # rectified intrinsics from the dataset's sensor.yaml pair
            # (io/datasets.EurocMav + geometry/rectify.py ≙ the reference's
            # cv::stereoRectify pre-pass in the stock stereo_euroc example)
            import dataclasses as _dc
            cfg = cfg.replace(camera=_dc.replace(cfg.camera, **calib))

    if args.localization_only:
        cfg = cfg.replace(localization_only=True)
    vocab = None
    if args.vocab:
        from orb_slam_2_ros_tpu.place import vocabulary
        vocab = (vocabulary.load_npz(args.vocab) if args.vocab.endswith(".npz")
                 else vocabulary.load_orbvoc(args.vocab, cfg))
    elif args.loop_closing and not args.load_map:
        # no vocabulary file given: bootstrap one from the sequence's own
        # imagery (the reference ships the pre-trained ORBvoc tree,
        # README.md:12; with zero egress, in-domain self-training beats the
        # random-descriptor fallback of pipeline.slam.default_vocabulary —
        # retrieval is what gates loop closing and relocalization)
        import jax.numpy as jnp
        from orb_slam_2_ros_tpu.frontend import frame as frame_mod
        from orb_slam_2_ros_tpu.place import vocabulary
        n_total = min(len(ds), args.frames)
        sample = range(0, n_total, max(1, n_total // 6))
        descs = []
        for i in sample:
            a, b = ds[i]
            f = frame_mod.build_mono(jnp.asarray(a, jnp.float32), cfg)
            descs.append(np.asarray(f.kps.desc)[np.asarray(f.valid)])
        print(f"training vocabulary on {sum(len(d) for d in descs)} "
              f"descriptors from {len(descs)} frames...", flush=True)
        vocab = vocabulary.train_vocabulary(np.concatenate(descs), cfg,
                                            seed=args.seed)
    mesh = None
    if args.coordinator or args.mesh:
        from orb_slam_2_ros_tpu.parallel import multihost
        pid = multihost.initialize(args.coordinator, args.num_hosts,
                                   args.host_id)
        mesh = multihost.global_mesh()
        print(f"host {pid}: mesh {dict(mesh.shape)} over "
              f"{mesh.devices.size} devices")
    sys_ = System(cfg, enable_local_ba=not args.no_ba,
                  load_map=args.load_map,
                  enable_loop_closing=args.loop_closing, vocab=vocab,
                  mesh=mesh)

    n = min(len(ds), args.frames) if args.dataset != "synthetic" else len(ds)
    chunk = sys_.tracker.chunk
    if args.profile:
        import jax
        jax.profiler.start_trace(args.profile)
    # file-based datasets stream through the native threaded prefetcher
    # (C++ decode -> wire-format buffers overlapping device compute,
    # io/datasets.make_prefetcher); indexed loads otherwise
    prefetch = None
    if args.dataset != "synthetic":
        from orb_slam_2_ros_tpu.io.datasets import make_prefetcher
        prefetch = make_prefetcher(ds)

    def load_chunk(i, j):
        if prefetch is not None:
            frames = [prefetch.next() for _ in range(j - i)]
            a = np.stack([f[0] for f in frames])
            b = (np.stack([f[1] for f in frames])
                 if frames[0][1] is not None else None)
            return a, b
        a = np.stack([ds[k][0] for k in range(i, j)])
        b = np.stack([ds[k][1] for k in range(i, j)])
        return a, b

    t_start = time.perf_counter()
    recs_all = []
    for i in range(0, n, chunk):
        j = min(i + chunk, n)
        a, b = load_chunk(i, j)
        recs = sys_.track_chunk(a, b, list(ds.timestamps[i:j]))
        recs_all += recs
        ok = sum(r.state == OK for r in recs)
        kfs = sum(r.is_keyframe for r in recs)
        print(f"[{i:4d}-{j:4d}) tracked {ok}/{len(recs)} (+{kfs} KF, "
              f"inliers {recs[-1].n_inliers})", flush=True)
    dt = time.perf_counter() - t_start
    if prefetch is not None:
        prefetch.close()
    if args.profile:
        import jax
        jax.profiler.stop_trace()
        print("profiler trace ->", args.profile)

    est = np.stack([r.c_w for r in sys_.records])
    print(f"done: {n} frames in {dt:.1f}s ({n / dt:.1f} fps incl. host IO), "
          f"{int(np.sum([r.is_keyframe for r in sys_.records]))} keyframes, "
          f"{len(sys_.map_points())} map points")
    if sys_.loop_closer is not None:
        print(f"loops closed: {sys_.loop_closer.n_loops_closed}")
    mx = sys_.metrics()
    stage_str = ", ".join(f"{k} {v['mean_ms']:.1f}ms"
                          for k, v in mx["stages"].items())
    print(f"metrics: {mx['keyframes']} KFs, {mx['map_points']} points, "
          f"{mx['points_culled']} culled, {mx['resets']} resets | {stage_str}")
    if gt is not None:
        ate = ate_rmse(est, gt, with_scale=(sensor == SENSOR_MONOCULAR))
        print(f"ATE RMSE vs ground truth: {ate:.4f} m")
    # dataset ground truth (TUM groundtruth.txt / KITTI poses file):
    # evaluate the composed trajectory like evo / the KITTI devkit would
    gt_poses = None
    if args.dataset == "kitti" and args.gt_poses:
        ds.poses_file = args.gt_poses
        _, gt_poses = ds.gt_trajectory()
        est_poses, est_ts = sys_.tracker.composed_trajectory(skip_lost=False)
        gt_poses = gt_poses[:len(est_poses)]
    elif args.dataset == "tum":
        try:
            gt_ts, gt_all = ds.gt_trajectory()
        except OSError:
            gt_ts = None
        if gt_ts is not None:
            from orb_slam_2_ros_tpu.io.datasets import associate
            est_poses, est_ts = sys_.tracker.composed_trajectory()
            pairs = associate(np.asarray(est_ts), np.asarray(gt_ts))
            gt_poses = [gt_all[j] for _, j in pairs]
            est_poses = [est_poses[i] for i, _ in pairs]
    if gt_poses:
        from orb_slam_2_ros_tpu.io.trajectory import kitti_relative_error
        gt_c = np.stack([c for _, c in gt_poses])
        est_c = np.stack([c for _, c in est_poses])
        ate = ate_rmse(est_c, gt_c, with_scale=(sensor == SENSOR_MONOCULAR))
        print(f"ATE RMSE vs dataset ground truth: {ate:.4f} m "
              f"({len(gt_poses)} poses)")
        t_rel, r_rel, n_sub = kitti_relative_error(est_poses, gt_poses)
        if n_sub:
            print(f"relative error: t_rel {100 * t_rel:.2f} %, "
                  f"r_rel {r_rel * 100 * 180 / np.pi:.3f} deg/100m "
                  f"({n_sub} subsequences)")
    if args.save_traj:
        sys_.save_trajectory_tum(args.save_traj)
        print("trajectory ->", args.save_traj)
    if args.save_kf_traj:
        sys_.save_keyframe_trajectory_tum(args.save_kf_traj)
    if args.merge_map:
        ok = sys_.merge_map(args.merge_map)
        print(f"merge {args.merge_map}: {'aligned' if ok else 'REJECTED'}; "
              f"{len(sys_.map_points())} points total")
    if args.save_map:
        sys_.save_map(args.save_map)
        print("map ->", args.save_map)
    if args.save_debug_image:
        img = sys_.render_debug_image()
        if img is not None:
            import cv2
            cv2.imwrite(args.save_debug_image, img)
            print("debug image ->", args.save_debug_image)
    return 0


if __name__ == "__main__":
    sys.exit(main())
