"""Device (JAX/Pallas) kernels + batched read-rescoring ops.

The TPU compute path: f32 log-space screening for the Poisson-binomial
significance test, batched banded BAQ forward/backward HMM, batched Viterbi
realignment.  Exact confirmation happens on host (lofreq_tpu.core/native).
"""

_jax_cache_set = False


def ensure_jax_cache() -> None:
    """Enable JAX's persistent on-disk compilation cache (once per
    process, before the first compile).  Remote/tunneled backends pay
    minutes per kernel compile; the cache makes every process after the
    first start warm.  Opt out (or relocate) with LOFREQ_TPU_JAX_CACHE
    (""/"0" disables)."""
    global _jax_cache_set
    if _jax_cache_set:
        return
    _jax_cache_set = True
    import os

    d = os.environ.get("LOFREQ_TPU_JAX_CACHE",
                       os.path.expanduser("~/.cache/lofreq_tpu/jax"))
    if not d or d == "0":
        return
    try:
        import jax

        if jax.default_backend() == "cpu":
            # CPU compiles are fast and XLA:CPU AOT cache entries warn
            # (and can SIGILL) on machine-feature drift; the cache only
            # pays for itself on remote/tunneled accelerator backends
            return
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is an optimization; never break the call
        pass
