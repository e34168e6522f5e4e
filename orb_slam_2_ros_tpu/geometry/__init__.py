"""Lie-group geometry and camera models (pure jax.numpy, fully batchable).

Replaces the reference's g2o SE3Quat/Sim3 types + Converter glue
(``Thirdparty/g2o/g2o/types/se3quat.h``, ``sim3.h``, ``Converter.cc``) with
functional quaternion+translation(+scale) arrays that vmap/jit cleanly.
"""

from orb_slam_2_ros_tpu.geometry import se3, sim3, camera, triangulate  # noqa: F401
