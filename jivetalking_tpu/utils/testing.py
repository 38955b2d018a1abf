"""Host-platform test harness helpers.

This environment preloads an `axon` PJRT plugin via sitecustomize that (a)
initialises JAX backends at interpreter startup and (b) overrides
`jax_platforms`, so the usual `JAX_PLATFORMS=cpu` +
`--xla_force_host_platform_device_count=N` env recipe is silently ignored
and every op round-trips a remote TPU tunnel.  `force_cpu_devices` recovers
the intended virtual-CPU-mesh setup in-process: re-point the platform
config at cpu, clear the initialised backends, and set the device count
before the cpu client is (re)built."""

from __future__ import annotations


def force_cpu_devices(n: int = 8) -> int:
    """Ensure JAX runs on the host CPU with `n` virtual devices.

    Safe to call multiple times; returns the resulting device count.
    Raises RuntimeError if it cannot deliver at least `n` CPU devices —
    a silent 1-device fallback turns every mesh construction downstream
    into a confusing reshape error (round-1 MULTICHIP gate failure)."""
    import jax
    from jax._src import xla_bridge as xb

    try:
        if jax.config.jax_platforms == "cpu" and len(jax.devices()) >= n:
            return len(jax.devices())
    except Exception:
        pass

    jax.config.update("jax_platforms", "cpu")
    with xb._backend_lock:
        xb._backends.clear()
        if hasattr(xb, "_backend_errors"):
            xb._backend_errors.clear()
        xb._default_backend = None
    try:
        jax.config.update("jax_num_cpu_devices", n)
    except RuntimeError:
        # backends already re-initialised by a concurrent thread; the
        # device count is whatever it is — checked below
        pass
    count = len(jax.devices())
    if count < n:
        raise RuntimeError(
            f"force_cpu_devices({n}) could only deliver {count} device(s) "
            f"on platform {jax.default_backend()!r}; call it BEFORE anything "
            "initialises a JAX backend (jax.devices(), device_put, jit...)"
        )
    return count
