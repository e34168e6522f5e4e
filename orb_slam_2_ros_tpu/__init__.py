"""orb_slam_2_ros_tpu — a TPU-native visual SLAM engine (JAX/XLA/Pallas).

A from-scratch reimplementation of the capabilities of the reference
``wjjcdy/orb_slam_2_ros`` (ORB-SLAM2 + ROS wrapper, C++/pthreads) as an
idiomatic TPU program: ORB extraction, descriptor matching, and BoW place
recognition are batched array kernels; g2o becomes a masked Levenberg-
Marquardt / Schur-complement solver; the three pthreads become a functional
pipeline over fixed-shape device arrays; the map is a pytree of pooled
arrays that shards over a `jax.sharding.Mesh` for distributed BA.

Package layout (see SURVEY.md §7 for the blueprint):
  geometry/  SE3/Sim3 Lie groups, camera models, triangulation
  ops/       hot numeric kernels (pyramid, FAST, rBRIEF, Hamming; Pallas)
  frontend/  ORB extractor, Frame building, matching, mono initializer
  solvers/   masked LM, pose optimization, local/global BA, PnP, Sim3, pose graph
  map/       fixed-shape map state (keyframe/map-point pools) + graph ops
  place/     vocabulary (BoW), keyframe database, relocalization, loop closing
  pipeline/  tracking state machine, local mapping, system facade
  io/        dataset loaders (TUM/EuRoC/KITTI/synthetic), trajectory export, ATE
  parallel/  mesh setup, sharded map, distributed BA collectives
  native/    C++ runtime pieces (binary vocabulary loader, dataset prefetcher)
"""

__version__ = "0.1.0"
