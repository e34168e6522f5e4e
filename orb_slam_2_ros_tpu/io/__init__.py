"""Dataset-driven I/O: sequence loaders, trajectory export, evaluation.

Replaces the reference's ROS topic layer (§2.19-2.22 of SURVEY.md) per the
topic-free mandate: TUM RGB-D / EuRoC / KITTI directory loaders plus a
synthetic ray-traced sequence generator with exact ground truth (no datasets
ship with either repo), TUM/KITTI trajectory writers
(``System::SaveTrajectoryTUM/KITTI``, ``System.cc:343-494``), and an in-repo
evo-style ATE/RPE evaluator.
"""
