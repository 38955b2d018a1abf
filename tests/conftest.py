"""Test harness: run JAX on a virtual 8-device CPU mesh so sharding paths are
exercised without TPU hardware (the driver separately compile-checks the
multi-chip path via __graft_entry__.dryrun_multichip)."""

import os

# Force CPU: the environment presets JAX_PLATFORMS=axon (remote TPU tunnel),
# which would round-trip every test op through the tunnel.  Tests must run on
# the local virtual-device CPU mesh; bench.py is what runs on the real chip.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# Persistent compilation cache: the metering/DSP kernels recompile per static
# signal length; caching across test runs cuts the suite from minutes to secs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jivetalking_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)


@pytest.fixture(scope="session")
def tmp_audio_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("audio")
