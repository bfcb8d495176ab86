"""Runtime initialization helpers.

``setup_cache()`` enables JAX's persistent compilation cache.  On
environments where TPU kernels compile through a remote AOT service (or on
any cold start), caching Mosaic/XLA binaries across processes turns
multi-minute first-compiles into ~1s loads.
"""

from __future__ import annotations

import os


def setup_cache(cache_dir: str = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "DISTILLCLIP_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".cache", "jax_cache"),
    )
    cache_dir = os.path.abspath(cache_dir)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
