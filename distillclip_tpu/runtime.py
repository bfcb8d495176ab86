"""Runtime initialization helpers.

``setup_cache()`` enables JAX's persistent compilation cache.  On
environments where TPU kernels compile through a remote AOT service (or on
any cold start), caching Mosaic/XLA binaries across processes turns
multi-minute first-compiles into ~1s loads.

The cache directory is suffixed with a HOST CPU fingerprint: XLA:CPU AOT
executables are machine-specific, and loading an entry compiled on a host
with different CPU features can SIGILL a worker thread mid-collective —
observed as an 8-way all-gather rendezvous hanging until the terminate
timeout aborts the process ("Machine type used for XLA:CPU compilation
doesn't match", cpu_aot_loader.cc).  Same-host processes still share the
cache; a different host simply warms its own subdirectory.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _host_fingerprint() -> str:
    parts = [platform.machine(), platform.processor() or ""]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    parts.append(line.strip())
                    break
    except OSError:
        pass
    return hashlib.sha1(" ".join(parts).encode()).hexdigest()[:10]


def setup_cache(cache_dir: str = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "DISTILLCLIP_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".cache", "jax_cache"),
    )
    cache_dir = os.path.join(os.path.abspath(cache_dir), f"host-{_host_fingerprint()}")
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
