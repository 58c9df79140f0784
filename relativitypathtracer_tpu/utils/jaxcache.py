"""Persistent XLA compilation cache for the entry points.

First compiles through the axon TPU relay run ~20-40 s; the round's on-chip
session (bench, frametime sweeps, parity, the viewer) re-compiles the same
renderers in separate processes. A shared on-disk cache collapses every
repeat compile to a cache read. Enabled by the CLI/bench/tools entry points
-- NOT at package import (library users own their config)."""

from __future__ import annotations

import hashlib
import os

DEFAULT_DIR = "/tmp/rpt_jax_cache"


def _host_tag() -> str:
    """Fingerprint of the host CPU microarchitecture.

    XLA:CPU caches AOT machine code; this container's /tmp outlives
    re-scheduling onto different machine types, and loading another host's
    executables warns 'could lead to execution errors such as SIGILL'.
    Keying the cache dir by host keeps entries host-pure. (TPU executables
    are keyed by device kind inside XLA's own cache key already; the extra
    split costs only a first-compile per host.)

    The VM reports a GENERIC brand string ('Intel(R) Xeon(R) Processor @
    2.70GHz') for every machine type, so 'model name' + 'flags' alone
    collide across hosts whose microarch differs; LLVM's host detection
    (which picks codegen hints like prefer-no-scatter) keys off
    family/model/stepping, so those lines must be in the hash too."""
    try:
        with open("/proc/cpuinfo") as f:
            keys = ("vendor_id", "cpu family", "model", "stepping",
                    "model name", "flags")
            lines = [ln for ln in f if ln.startswith(keys)][:6]
        return hashlib.md5("".join(sorted(lines)).encode()).hexdigest()[:10]
    except OSError:  # pragma: no cover - non-Linux
        return "generic"


def enable(path: str | None = None) -> None:
    """Point jax at an on-disk compilation cache (idempotent, best-effort).

    Respects an existing JAX_COMPILATION_CACHE_DIR env var over `path`."""
    import jax

    cache_dir = (os.environ.get("JAX_COMPILATION_CACHE_DIR") or path
                 or f"{DEFAULT_DIR}-{_host_tag()}")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Relay compiles are worth caching even when they're quick.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - older jax without these flags
        pass
