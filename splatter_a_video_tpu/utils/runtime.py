"""Runtime setup helpers: compilation cache, platform selection.

The reference pays no compile cost (eager CUDA); our jitted pipeline has a
one-time XLA compile (dominated by the 2M-key `lax.sort` at ~1 min). The
persistent compilation cache amortizes it across processes/runs — after the
first run, training starts in seconds.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (idempotent)."""
    import jax

    if path is None:
        path = os.environ.get(
            "SAV_TPU_CACHE_DIR",
            os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"),
        )
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags


def force_cpu(num_devices: int = 8) -> None:
    """Force the CPU backend with N virtual devices (tests / dryruns)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", num_devices)
    except Exception:
        pass
