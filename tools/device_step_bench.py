#!/usr/bin/env python3
"""Micro-benchmark: fused Pallas column step vs the unfused XLA pipeline.

Measures columns/sec of the fully-on-device column-calling step
(merge + filters + counts + screening DP) at bench shape B x D — the
deployment path for PCIe/ICI-attached chips where packed column tensors
are shipped once and everything else stays on device (VERDICT r1 #5:
target >= 3x the unfused step).

Usage: python tools/device_step_bench.py [B] [D] [iters]
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def make_batch(B, Dd, seed=0):
    rng = np.random.default_rng(seed)
    ref_nt4 = rng.integers(0, 4, B).astype(np.int8)
    nt4 = np.where(rng.random((B, Dd)) < 0.997, ref_nt4[:, None],
                   rng.integers(0, 4, (B, Dd))).astype(np.int8)
    bq = rng.integers(20, 41, (B, Dd)).astype(np.int16)
    baq = rng.integers(10, 60, (B, Dd)).astype(np.int16)
    mq = np.full((B, Dd), 60, dtype=np.int16)
    sq = np.full((B, Dd), -1, dtype=np.int16)
    valid = np.ones((B, Dd), dtype=bool)
    bonf = np.full(B, 30000.0, dtype=np.float32)
    return nt4, bq, baq, mq, sq, valid, ref_nt4, bonf


def _time(fn, args, fetch, iters):
    out = fn(*args)
    _ = fetch(out)  # compile + sync
    times = []
    for _i in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = fetch(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    Dd = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    Dd = -(-Dd // 32) * 32  # fused kernel needs CHUNK_D multiples

    import jax

    from lofreq_tpu.ops.device_call import build_column_call
    from lofreq_tpu.ops.pallas_fused_call import (build_fused_column_call,
                                                  pack_columns_np)

    nt4, bq, baq, mq, sq, valid, ref_nt4, bonf = make_batch(B, Dd)
    packed = pack_columns_np(nt4, bq, baq, mq, sq, valid)

    args_unfused = [jax.device_put(a) for a in
                    (nt4, bq, baq, mq, sq, valid, ref_nt4, bonf)]
    args_fused = [jax.device_put(packed),
                  jax.device_put(ref_nt4.astype(np.int32)),
                  jax.device_put(bonf)]

    fetch = lambda out: int(out["num_tested"])  # noqa: E731
    results = {}
    unfused = jax.jit(build_column_call(use_baq=True, use_pallas=False))
    results["unfused_xla"] = B / _time(unfused, args_unfused, fetch, iters)
    try:
        unf_pl = jax.jit(build_column_call(use_baq=True, use_pallas=True))
        results["unfused_pallas_dp"] = B / _time(unf_pl, args_unfused,
                                                 fetch, iters)
    except Exception as e:
        results["unfused_pallas_dp"] = f"failed: {e}"
    try:
        fused = build_fused_column_call(use_baq=True)
        results["fused_pallas"] = B / _time(fused, args_fused, fetch, iters)
    except Exception as e:
        results["fused_pallas"] = f"failed: {e}"
    out = {k: (round(v, 1) if isinstance(v, float) else v)
           for k, v in results.items()}
    out.update(B=B, D=Dd, unit="cols/s")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
