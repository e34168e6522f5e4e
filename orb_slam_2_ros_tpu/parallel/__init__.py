"""Multi-chip scaling: device meshes and sharded map/solver steps.

The reference is single-process pthreads (SURVEY.md §2.D); here the map-point
and keyframe pools shard over a `jax.sharding.Mesh` and the BA/solver
reductions become XLA collectives over ICI (psum of the reduced camera
system), per the §5.8 design.
"""
