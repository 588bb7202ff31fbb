"""Device (JAX/Pallas) kernels + batched read-rescoring ops.

The TPU compute path: f32 log-space screening for the Poisson-binomial
significance test, batched banded BAQ forward/backward HMM, batched Viterbi
realignment.  Exact confirmation happens on host (lofreq_tpu.core/native).
"""

_jax_cache_set = False


def ensure_jax_cache() -> None:
    """Configure JAX's persistent on-disk compilation cache — OPT-IN via
    LOFREQ_TPU_JAX_CACHE=<dir> only.

    Default is OFF, deliberately: on the tunneled remote backend this
    framework was benched on, a persistent-cache HIT is the pathological
    path — the XLA compile of the production screen takes 1.4s fresh,
    but loading the deserialized cached executable onto the remote
    service measured 144s-600s+ (the r1-r4 'compile stall' that kept the
    TPU engine dark was exactly this: cache entries existed, every warm
    hit them, and the load hung past every deadline).  Fresh compiles
    are seconds on both tunneled and direct-attached services, so the
    cache buys nothing on the compile axis and risks minutes on the
    load axis.  Deployments whose PJRT backend deserializes quickly can
    opt in with LOFREQ_TPU_JAX_CACHE=~/.cache/lofreq_tpu/jax."""
    global _jax_cache_set
    if _jax_cache_set:
        return
    _jax_cache_set = True
    import os

    d = os.environ.get("LOFREQ_TPU_JAX_CACHE", "")
    if not d or d == "0":
        return
    d = os.path.expanduser(d)
    try:
        import jax

        if jax.default_backend() == "cpu":
            # CPU compiles are fast and XLA:CPU AOT cache entries warn
            # (and can SIGILL) on machine-feature drift
            return
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        # min compile time 0: the measured "compile" wall on remote
        # services is dominated by queueing and the true XLA compile can
        # be <0.5s — the default threshold then never writes the entry
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # cache is an optimization; never break the call
        pass
