#!/usr/bin/env python3
"""Benchmark: pileup-column calling throughput on the device pipeline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The metric is pileup columns/sec through the TPU column-calling step
(quality merge + filters + counts + screening DP) at denv2-like depth.
vs_baseline compares against the single-core C reference path: the exact
pruned Poisson-binomial DP with early exit (csrc/exact_stats.c — the same
algorithm lofreq's snpcaller runs per column) over identical data.
"""

import json
import sys
import time

import numpy as np


def make_batch(B, D, seed=0):
    rng = np.random.default_rng(seed)
    ref_nt4 = rng.integers(0, 4, B).astype(np.int8)
    nt4 = np.where(rng.random((B, D)) < 0.997, ref_nt4[:, None],
                   rng.integers(0, 4, (B, D))).astype(np.int8)
    bq = rng.integers(20, 41, (B, D)).astype(np.int16)
    baq = rng.integers(10, 60, (B, D)).astype(np.int16)
    mq = np.full((B, D), 60, dtype=np.int16)
    sq = np.full((B, D), -1, dtype=np.int16)
    valid = np.ones((B, D), dtype=bool)
    bonf = np.full(B, 30000.0, dtype=np.float32)
    return nt4, bq, baq, mq, sq, valid, ref_nt4, bonf


def bench_device(B=65536, D=2000, iters=5):
    import jax

    from lofreq_tpu.ops.device_call import build_column_call

    # the hand-written Pallas DP kernel is ~3x the XLA scan; fall back to
    # the scan if the remote Mosaic compile is unavailable or hangs (the
    # compile runs in a worker thread with a deadline)
    from concurrent.futures import ThreadPoolExecutor, TimeoutError as _TO

    args = [jax.device_put(a) for a in make_batch(B, D)]

    def _compile(use_pallas):
        f = jax.jit(build_column_call(use_baq=True, use_pallas=use_pallas))
        o = f(*args)
        _ = int(o["num_tested"])  # compile + full sync via host fetch
        return f

    fn = None
    ex = ThreadPoolExecutor(1)
    try:
        fn = ex.submit(_compile, True).result(timeout=240)
    except (_TO, Exception):
        pass
    finally:
        ex.shutdown(wait=False)
    if fn is None:
        fn = _compile(False)
    out = fn(*args)
    _ = int(out["num_tested"])
    times = []
    for _i in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = int(out["num_tested"])  # force completion each step
        times.append(time.perf_counter() - t0)
    return B / float(np.median(times))


def bench_reference_c(B=2048, D=2000):
    """Single-core C baseline: merge quals + sort + exact pruned DP with
    early exit per column — the reference's per-column statistical path."""
    from lofreq_tpu import native
    from lofreq_tpu.core.quals import merge_srcq_mapq_baq_and_bq

    nt4, bq, baq, mq, sq, valid, ref_nt4, bonf = make_batch(B, D, seed=1)
    # warm up the native lib + page cache so the baseline isn't a cold run
    warm = np.sort(merge_srcq_mapq_baq_and_bq(
        sq[:64].reshape(-1), mq[:64].reshape(-1), baq[:64].reshape(-1),
        bq[:64].reshape(-1)).reshape(64, D), axis=1)
    native.poissbin_dp_batch(warm, np.full(64, D, np.int64),
                             np.full(64, 2, np.int64),
                             np.full(64, 30000.0), 0.01)
    t0 = time.perf_counter()
    merged = merge_srcq_mapq_baq_and_bq(
        sq.reshape(-1), mq.reshape(-1), baq.reshape(-1), bq.reshape(-1)
    ).reshape(B, D)
    is_alt = nt4 != ref_nt4[:, None]
    ks = np.maximum(is_alt.sum(axis=1), 1)
    probs = np.sort(merged, axis=1)
    depths = np.full(B, D, dtype=np.int64)
    native.poissbin_dp_batch(probs, depths, np.minimum(ks, 16),
                             np.full(B, 30000.0), 0.01)
    dt = time.perf_counter() - t0
    return B / dt


def main():
    # baseline first: once jax/axon client threads are up they contend
    # with the single-core C run and starve it 5-8x.  Best-of-2 full runs:
    # the first pass warms the native lib + allocator + page cache
    baseline = max(bench_reference_c(), bench_reference_c())
    cols_per_sec = bench_device()
    print(json.dumps({
        "metric": "pileup_columns_per_sec_per_chip",
        "value": round(cols_per_sec, 1),
        "unit": "columns/s (B=65536, depth=2000, merge+filter+count+screen)",
        "vs_baseline": round(cols_per_sec / baseline, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
