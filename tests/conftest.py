"""Test harness config: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY.md §4); the real-chip path is
exercised by bench.py, not the unit suite. Must run before jax import.
"""

import os
import sys

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# the axon sitecustomize force-registers the TPU backend via
# jax.config.update("jax_platforms", "axon,cpu") at interpreter start, which
# overrides the env var — override it back so the suite really runs on the
# virtual 8-device CPU mesh (deterministic, no remote-compile round trips)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
os.environ.setdefault("JAX_ENABLE_X64", "0")
# persistent compile cache: the suite re-jits the same programs every run.
# Env vars alone are dead under the axon sitecustomize (jax is imported at
# interpreter start, before they land) — set through jax.config.update.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# ---- fast/slow split (round-2 VERDICT weak #8): integration suites that
# drive whole pipelines are marked `slow`; `-m "not slow"` gives a quick
# unit pass (kernels, solvers, geometry oracles) for inner-loop development.
SLOW_MODULES = {
    "test_slam_system", "test_loop_closing", "test_full_system_loop",
    "test_tracking_e2e", "test_localization_vo", "test_mono_tracking",
    "test_stereo_tracking", "test_map_merge", "test_dist_ba",
    "test_wire_path", "test_pool_recycling", "test_kitti_metric",
    "test_tum_e2e", "test_hard_sequences", "test_orbvoc_scale",
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: whole-pipeline integration test (minutes on CPU)")


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        if item.module.__name__ in SLOW_MODULES:
            item.add_marker(pytest.mark.slow)
