"""CLI runner: the executable replacing the reference's ROS nodes.

``python -m orb_slam_2_ros_tpu.run --dataset synthetic --frames 60`` runs the
full pipeline and prints per-chunk tracking state plus final ATE; with
``--dataset tum --path <dir>`` it consumes a real TUM RGB-D directory.
Replaces `orb_slam_2_ros_{mono,stereo,rgbd}` mains (§2.20) with the
topic-free equivalent; ``--save-map``/``--load-map`` replace the SaveMap
service (``srv/SaveMap.srv``), ``--save-traj`` the shutdown auto-save
(``ros/src/Node.cc:13-21``).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description="TPU-native ORB-SLAM2-class engine")
    ap.add_argument("--dataset", choices=["synthetic", "tum"], default="synthetic")
    ap.add_argument("--path", help="dataset directory (tum)")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-ba", action="store_true", help="disable local BA")
    ap.add_argument("--localization-only", action="store_true")
    ap.add_argument("--save-map", help="write map npz on exit")
    ap.add_argument("--load-map", help="load map npz at start")
    ap.add_argument("--save-traj", help="write TUM trajectory on exit")
    ap.add_argument("--save-kf-traj", help="write TUM keyframe trajectory")
    args = ap.parse_args(argv)

    from orb_slam_2_ros_tpu.config import SlamConfig, tum_fr1_config
    from orb_slam_2_ros_tpu.pipeline.slam import System
    from orb_slam_2_ros_tpu.pipeline.tracking import OK, Tracker
    from orb_slam_2_ros_tpu.io.trajectory import ate_rmse

    if args.dataset == "tum" and not args.path:
        ap.error("--dataset tum requires --path <sequence directory>")

    if args.dataset == "synthetic":
        from orb_slam_2_ros_tpu.io.synthetic import SyntheticRGBD
        cfg = SlamConfig()
        ds = SyntheticRGBD(cfg, n_frames=args.frames, seed=args.seed)
        gt = np.stack([ds.gt_pose_wc(i)[1] for i in range(len(ds))])
    else:
        from orb_slam_2_ros_tpu.io.datasets import TumRGBD
        cfg = tum_fr1_config()
        ds = TumRGBD(args.path, cfg.camera.depth_map_factor)
        gt = None

    if args.localization_only:
        cfg = cfg.replace(localization_only=True)
    sys_ = System(cfg, enable_local_ba=not args.no_ba, load_map=args.load_map)

    n = len(ds)
    chunk = Tracker.CHUNK
    t_start = time.perf_counter()
    for i in range(0, n, chunk):
        j = min(i + chunk, n)
        grays = np.stack([ds[k][0] for k in range(i, j)])
        depths = np.stack([ds[k][1] for k in range(i, j)])
        sys_.track_chunk(grays, depths, ds.timestamps[i:j], defer_fetch=True)
        print(f"[{i:4d}-{j:4d}) dispatched", flush=True)
    recs_all = sys_.flush()   # single fetch at the end (fast-launch mode kept)
    dt = time.perf_counter() - t_start
    for i in range(0, n, chunk):
        recs = recs_all[i:min(i + chunk, n)]
        ok = sum(r.state == OK for r in recs)
        kfs = sum(r.is_keyframe for r in recs)
        print(f"[{i:4d}-{min(i+chunk,n):4d}) tracked {ok}/{len(recs)} "
              f"(+{kfs} KF, inliers {recs[-1].n_inliers})")

    est = np.stack([r.c_w for r in sys_.records])
    print(f"done: {n} frames in {dt:.1f}s, "
          f"{int(np.sum([r.is_keyframe for r in sys_.records]))} keyframes, "
          f"{len(sys_.map_points())} map points")
    if gt is not None:
        print(f"ATE RMSE vs ground truth: {ate_rmse(est, gt):.4f} m")
    if args.save_traj:
        sys_.save_trajectory_tum(args.save_traj)
        print("trajectory ->", args.save_traj)
    if args.save_kf_traj:
        sys_.save_keyframe_trajectory_tum(args.save_kf_traj)
    if args.save_map:
        sys_.save_map(args.save_map)
        print("map ->", args.save_map)
    return 0


if __name__ == "__main__":
    sys.exit(main())
