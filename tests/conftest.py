"""Test bootstrap: force an 8-device virtual CPU platform before JAX loads.

All tests run CPU-only (like the reference's CI, reference
.github/workflows/build-pipeline.yml) but with 8 virtual devices so the
multi-chip sharding paths compile and execute without TPU hardware.
"""

import os

# LANPAINT_TEST_TPU=1 (set by bench.py's on-chip selftest) leaves the real
# TPU platform in place so the `skipif(backend == "cpu")` Pallas/attention
# cases actually RUN; without it they silently skip and the gate is vacuous.
_ON_CHIP = os.environ.get("LANPAINT_TEST_TPU") == "1"

if not _ON_CHIP:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (import after env setup)

# The environment's sitecustomize force-registers the TPU backend and sets
# JAX_PLATFORMS before we run; the config update (post-import) wins.
if not _ON_CHIP:
    jax.config.update("jax_platforms", "cpu")
else:
    # On-chip runs share bench.py's persistent compile cache: every compile
    # goes through the tunnel (~20-40 s each), and the selftest set re-runs
    # the same programs each round — cold it exceeds 15 min, cached it is
    # minutes.  (CPU runs skip this: XLA-CPU compiles are fast and the
    # cache's disk churn isn't worth it across 4 xdist workers.)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    # 2 s (not the 10 s bench.py uses for its huge programs): the selftest
    # is DOMINATED by many small 3-10 s compiles that re-pay the tunnel
    # every round unless cached.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest  # noqa: E402


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)
