"""Persistent XLA compilation cache — ONE location for every entry point.

Repeat runs (the driver re-runs bench.py every round; the capture queue runs five
tools back-to-back) skip the ~45 s full-scale graph compiles and the ~6 min on-device
init-program compile. The dir is per-backend because CPU-AOT artifacts reloaded under a
different feature baseline print scary (if benign) machine-mismatch warnings when
backends share a cache. Entry points that configured their own dir used to fragment the
cache (bench.py wrote /tmp/diffsim_tpu_jax_cache while the CLI wrote ..._tpu, so each
paid the other's cold compiles — measured as a ~6 min init-program recompile in round 5).
"""

from __future__ import annotations


def enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          f"/tmp/diffsim_tpu_jax_cache_{jax.default_backend()}")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
