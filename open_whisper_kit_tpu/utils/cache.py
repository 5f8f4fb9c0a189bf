"""Persistent XLA compile cache.

Cold compiles of the fused decode loops go through the remote compile
service and can take minutes on a tunneled TPU; a repo-local on-disk cache
makes every entry point warm-start after the first run. Opt out with
OWK_JAX_CACHE_DIR="" (empty), or point it somewhere shared.
"""

from __future__ import annotations

import os


def enable_compile_cache(default_dir: str | None = None) -> str | None:
    """Enable jax's persistent compilation cache; returns the dir or None.

    Best-effort: failures (read-only fs, old jax) never break the caller.

    Also honors OWK_FORCE_CPU=1: pin the CPU backend before any device
    init. Needed because this image's sitecustomize pins the axon TPU in
    jax.config at import, which beats the JAX_PLATFORMS env var — CLI
    subprocess flows (tools/acceptance.sh --dry-run, CI) use this to run
    device-free.
    """
    import jax

    if os.environ.get("OWK_FORCE_CPU"):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:  # noqa: BLE001
            pass

    cache = os.environ.get("OWK_JAX_CACHE_DIR")
    if cache == "":
        return None
    # TPU-only: the cache exists to amortize the remote TPU compile
    # service. CPU executables are fast to rebuild AND machine-feature
    # fragile — this VM migrates between hosts with different CPU flags,
    # and deserializing an AOT CPU executable built for another host's
    # feature set has segfaulted a test run (XLA warns "machine type ...
    # doesn't match ... could lead to execution errors such as SIGILL").
    try:
        platforms = jax.config.jax_platforms
    except AttributeError:  # very old jax
        platforms = None
    # Only the FIRST platform in the priority list matters: this image's
    # sitecustomize pins "axon,cpu" (TPU with CPU fallback), and the old
    # substring check ("cpu" in "axon,cpu") silently disabled the cache on
    # the real chip — every bench run re-paid minutes of remote compiles.
    first = str(platforms).split(",")[0].strip() if platforms else ""
    if first == "cpu":
        return None
    # The platform list states INTENT; if TPU init already happened and
    # fell back to CPU (dead tunnel), gate on the real backend so the cache
    # never fills with host-fragile CPU executables. Probe without forcing
    # backend init: only consult devices if a backend already exists.
    try:
        from jax._src import xla_bridge as _xb
        if _xb.backends_are_initialized() and \
                jax.devices()[0].platform == "cpu":
            return None
    except Exception:  # noqa: BLE001 - introspection is best-effort
        pass
    if cache is None:
        root = default_dir or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
        cache = root
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        return cache
    except Exception:  # noqa: BLE001 - cache is best-effort
        return None
