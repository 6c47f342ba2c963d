"""Test harness config: force CPU backend with 8 virtual devices so
multi-chip sharding paths compile and run without TPU hardware
(SURVEY.md §4: the test pyramid the reference never had)."""

import os
import sys

# MG_TPU_TESTS=1 keeps the real TPU backend so the hardware-only tests
# (tests/test_tpu_sampling.py) can run: pytest MG_TPU_TESTS=1 -k tpu
if os.environ.get("MG_TPU_TESTS") != "1":
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    # jax may already be imported by a pytest plugin before this
    # conftest runs (in which case it captured JAX_PLATFORMS=axon from
    # the shell); force the platform through the config API too — this
    # works as long as no backend has been initialized yet.
    import jax  # noqa: E402

    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", (
        "tests must run on the virtual-device CPU backend, got "
        + jax.default_backend()
    )

    # Persistent XLA compile cache: the suite's cost on this 1-CPU box
    # is dominated by recompiling the same jitted programs run after
    # run (content-hash keyed, so edits that change a program recompile
    # it).  Warm-cache quick lane measured ~2x faster.  Opt out with
    # MG_TEST_NOCACHE=1 (e.g. when bisecting compiler issues).  The
    # helper also patches jax's cache writes to be ATOMIC (tmp +
    # os.replace) so a timeout-killed run can't leave a truncated
    # entry that hangs later readers.
    if os.environ.get("MG_TEST_NOCACHE") != "1":
        sys.path.insert(0, os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        from musicgeneration_tpu.utils.compile_cache import (  # noqa: E402
            enable_persistent_compile_cache,
        )

        enable_persistent_compile_cache()
    else:
        # Propagate the opt-out to in-process CLI invocations: the CLIs
        # call enable_persistent_compile_cache() themselves (opt-out
        # env var MG_NO_COMPILE_CACHE), which would silently re-enable
        # the persistent cache mid-suite and defeat MG_TEST_NOCACHE.
        os.environ["MG_NO_COMPILE_CACHE"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# --------------------------------------------------------------------------
# In-process executable-count relief valve.
#
# A full quick-lane run (~390 tests, several hundred live compiled XLA:CPU
# executables) reliably CRASHES this box's XLA during one of the last big
# compiles (generate_sliding at tests/test_serving_sliding.py — segfault
# inside backend_compile_and_load; round-4 VERDICT #1, reproduced 5/5 with
# and without every compile-cache layer). Neither half of the suite alone
# triggers it — the aggravator is cumulative in-process compiler state.
# Dropping jax's in-memory caches every N tests keeps the live-executable
# population bounded and the full lane green (re-jits reload from the
# persistent disk cache, so the cost is small). MG_TEST_CLEAR_CACHES sets
# the interval (0 disables; default 60).
_CLEAR_EVERY = int(os.environ.get("MG_TEST_CLEAR_CACHES", "60"))
_test_counter = [0]


def pytest_runtest_teardown(item, nextitem):
    if _CLEAR_EVERY <= 0:
        return
    _test_counter[0] += 1
    if _test_counter[0] % _CLEAR_EVERY == 0:
        import gc

        import jax

        jax.clear_caches()
        gc.collect()
