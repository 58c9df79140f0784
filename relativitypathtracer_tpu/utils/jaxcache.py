"""Persistent XLA compilation cache for the entry points.

First compiles through the axon TPU relay run ~20-40 s; the round's on-chip
session (bench, frametime sweeps, parity, the viewer) re-compiles the same
renderers in separate processes. A shared on-disk cache collapses every
repeat compile to a cache read. Enabled by the CLI/bench/tools entry points
-- NOT at package import (library users own their config)."""

from __future__ import annotations

import os

DEFAULT_DIR = "/tmp/rpt_jax_cache"


def enable(path: str | None = None) -> None:
    """Point jax at an on-disk compilation cache (idempotent, best-effort).

    Respects an existing JAX_COMPILATION_CACHE_DIR env var over `path`."""
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR") or path or DEFAULT_DIR
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Relay compiles are worth caching even when they're quick.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - older jax without these flags
        pass
