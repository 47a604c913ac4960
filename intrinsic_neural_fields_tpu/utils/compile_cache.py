"""Persistent JAX compilation cache for the CLI entry points.

Every CLI invocation is a fresh process, and on the tunneled TPU a cold
compile of the trace/train executables costs minutes through the
remote-compile service — often dominating small jobs (a 6-view 64x64
preprocess spends ~95% of its wall in compiles). JAX's persistent cache
serializes compiled executables to disk keyed on (HLO, compile options,
backend version); the axon PJRT backend supports executable serialization
(verified: cache entries are written and reloaded), so second invocations
skip the tunnel compile entirely.

Opt-out with INF_TPU_JAX_CACHE_DIR=0; override the location with the same
variable. Library imports do NOT enable this — only CLI mains call it, so
embedding applications keep full control of jax.config.
"""
from __future__ import annotations

import os


def enable_persistent_compile_cache():
    """Enable jax's persistent compilation cache for this process."""
    cache_dir = os.environ.get(
        "INF_TPU_JAX_CACHE_DIR",
        os.path.expanduser("~/.cache/intrinsic_neural_fields_tpu/jax"),
    )
    if not cache_dir or cache_dir == "0":
        return None
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache anything that took real compile time; trivial kernels stay out
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
