"""Nonlinear optimization: masked Levenberg-Marquardt replacements for g2o.

The reference drives five optimization problems through g2o
(``Optimizer.cc``; vendored ``Thirdparty/g2o``, ~14k LoC). Here each problem
is a jitted LM loop over fixed-shape residual arrays with analytic Jacobians:
pose-only (solvers/pose_opt.py), local/global BA with Schur complement
(solvers/ba.py), Sim3 pose graph (solvers/pose_graph.py), EPnP+RANSAC
(solvers/pnp.py), Horn Sim3 RANSAC (solvers/sim3_solver.py).
"""
