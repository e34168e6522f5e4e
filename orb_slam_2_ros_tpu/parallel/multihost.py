"""Multi-host initialization and global mesh construction (SURVEY.md §5.8).

The reference has no multi-node story; the TPU-native design scales the
backend across hosts with ``jax.distributed``: every host runs the same
program, `initialize()` wires the coordination service, and the global mesh
spans all hosts' devices — intra-host axes ride ICI, the host-spanning axis
rides DCN. Session-level sharding (one SLAM session per host, merged by
`pipeline/map_merge.py`) and GBA edge/point sharding over the global ``mp``
axis both build on this.

Typical launch (one command per host):

    python -m orb_slam_2_ros_tpu.run ... \
        --coordinator 10.0.0.1:1234 --num-hosts 4 --host-id $ID
"""

from __future__ import annotations

import jax

from orb_slam_2_ros_tpu.parallel.mesh import make_mesh

_initialized = False


def initialize(coordinator: str = None, num_processes: int = None,
               process_id: int = None) -> int:
    """Initialize the cross-host runtime. On a single host (all args None)
    this is a no-op; with a coordinator address it blocks until every host
    of the job has joined (the ``jax.distributed`` rendezvous). Safe to call
    more than once. Returns the process id (0 on single host)."""
    global _initialized
    if coordinator is None:
        return 0
    if not _initialized:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        _initialized = True
    return jax.process_index()


def global_mesh(n_kf: int = 1, n_mp: int = None):
    """Mesh over EVERY device of the job (all hosts). Lay the ``mp`` axis
    innermost so its collectives (the per-LM-iteration all_gather /
    psum_scatter of the sharded GBA, parallel/dist_ba.py) ride ICI within
    each host; the ``kf`` axis then spans hosts over DCN, matching its much
    lower traffic (one (Wn, 6) psum per windowed-BA iteration)."""
    return make_mesh(n_kf=n_kf, n_mp=n_mp, devices=jax.devices())


def local_session_shard(items):
    """Partition per-session work across hosts (session-level data
    parallelism: one SLAM session per host, maps merged offline via
    System.merge_map). Returns this host's slice."""
    n = jax.process_count()
    i = jax.process_index()
    return items[i::n]
