"""Test harness: run JAX on a virtual 8-device CPU mesh so sharding paths are
exercised without TPU hardware (the driver separately compile-checks the
multi-chip path via __graft_entry__.dryrun_multichip).

This container's sitecustomize pre-initialises an `axon` remote-TPU backend
and overrides `jax_platforms`, so plain env vars are ignored — tests must
recover the CPU platform in-process (see utils/testing.force_cpu_devices).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

# XLA:CPU collectives run one thread per virtual device and HARD-KILL the
# process (rendezvous.cc Termination timeout, SIGABRT) if any participant
# fails to reach an all_gather/psum within 40 s.  On this ONE-core host an
# 8-device program's threads are time-sliced, so a heavy sharded dispatch
# (the 64-file catalogue's vmapped chunk masters) can legitimately keep a
# participant off-CPU past the default — measured 2026-08-19: 6-way
# cross_module all_gather, 4/6 arrived, process aborted.  The PRIMARY fix
# is bounding per-dispatch width (parallel/batch.py JT_MAX_BUCKET_FILES);
# these timeout raises are defensive (a 1 s warn-threshold probe on a
# shard_map psum did not fire, so the flags may only reach the
# cross_module rendezvous path, if that).  Must be set before backend init.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    + " --xla_cpu_collective_timeout_seconds=1200"
).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

from jivetalking_tpu.utils.testing import force_cpu_devices  # noqa: E402

force_cpu_devices(8)

# Persistent compilation cache: the metering/DSP kernels recompile per static
# signal length; caching across test runs cuts the suite from minutes to secs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jivetalking_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


# XLA CPU JIT-loads every compiled executable into fresh memory mappings
# and a long pytest process accumulates them toward the kernel's
# vm.max_map_count (65,530 default).  Measured 2026-08-17: the suite sat
# at ~18k maps after the single-device modules, then the 8-device
# shard_map/vmap master modules alone added ~40k more (47k -> 57k and
# climbing), at which point mmap failure surfaced as segfaults variously
# inside LoadedExecutable.serialize(), cache deserialize, or
# backend_compile_and_load for the big multi-device programs (the same
# programs compile and round-trip fine in a fresh process).  Dropping the
# accumulated executables around the heavy modules keeps the map count
# far from the limit; the persistent cache turns the lost recompiles
# into cheap deserialisations.
_BIG_EXECUTABLE_MODULES = {
    "test_parallel", "test_parallel_master", "test_parallel_sequence",
    "test_config5_scale",
}

# Best-effort: raise the map budget itself when the environment allows
# (root in the dev container).  The 64-file catalogue module compiles
# ~30-wide vmapped chunk programs whose mappings alone can crowd the
# 65,530 default even with the cache-dropping below (measured 2026-08-19:
# 'Fatal Python error' segfault inside the b=30 bucket compile).
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        if int(_f.read()) < 262144:
            with open("/proc/sys/vm/max_map_count", "w") as _g:
                _g.write("262144")
except (OSError, ValueError):
    pass


@pytest.fixture(scope="module", autouse=True)
def _release_executable_maps(request):
    import gc

    if request.module.__name__ not in _BIG_EXECUTABLE_MODULES:
        yield
        return
    jax.clear_caches()
    gc.collect()
    try:
        yield
    finally:
        jax.clear_caches()
        gc.collect()


@pytest.fixture(scope="session")
def tmp_audio_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("audio")


def pytest_addoption(parser):
    parser.addoption(
        "--regen-golden", action="store_true", default=False,
        help="regenerate golden report files instead of comparing",
    )
