"""The functional map: fixed-capacity keyframe/map-point pools.

Replaces the reference's mutex-guarded pointer graph (``Map.cc``,
``KeyFrame.cc``, ``MapPoint.cc``; ~20 mutexes, SURVEY.md §5.2) with a pytree
of arrays updated by pure functions — the "big map lock" becomes value
semantics, and covisibility is one incidence matmul on the MXU.
"""
