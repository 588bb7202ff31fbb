#!/usr/bin/env python3
"""Test-case generator/packer for the poissbin golden file."""

import json
import sys

import numpy as np


def make_cases():
    rng = np.random.default_rng(20260816)
    cases = []

    def add(probs, k, bonf, sig):
        probs = np.sort(np.asarray(probs, dtype=np.float64))
        cases.append(
            dict(n=len(probs), k=int(k), bonf=float(bonf), sig=float(sig),
                 probs=[float(x) for x in probs])
        )

    # simple sanity cases
    add([0.001] * 10, 1, 1, 1)
    add([0.01, 0.02, 0.03, 0.2, 0.5], 2, 1, 1)
    # phred-like probs, varying N/K, large bonf (call-like)
    for n in (5, 20, 100, 500, 2000):
        for k in (1, 2, 3, 5, 8):
            if k > n:
                continue
            probs = 10 ** (-rng.uniform(0.6, 6.0, n))
            add(probs, k, 30000, 0.01)
    # early-exit cases (source-qual-like: bonf=1, sig=0.05)
    for n in (30, 75, 150, 1000):
        for k in (1, 2, 4):
            probs = 10 ** (-rng.uniform(0.3, 4.0, n))
            add(probs, k, 1, 0.05)
    # clamp cases: zeros and ones in the prob vector
    add([0.0] * 5 + [0.5] * 5, 2, 1, 1)
    add([1e-320, 1e-300, 0.3, 1.0, 1.0], 3, 1, 1)
    add([0.0, 1.0], 1, 1, 1)
    # big-K consensus-like columns
    probs = 10 ** (-rng.uniform(1.0, 4.0, 300))
    add(probs, 150, 1000, 0.01)
    add(probs, 299, 1000, 0.01)
    # dense high-error
    add(rng.uniform(0.01, 0.99, 50), 10, 1, 0.05)
    # fuzz sweep (round 2): random N/K with q2/q93 phred edges mixed in
    # (q2 = p 0.63, q93 = p 5e-10 — the SANGER clamp endpoints), random
    # bonf/sig incl. borderline-significance regimes that stress the
    # early-exit path (snpcaller.c:950)
    for _ in range(40):
        n = int(rng.integers(2, 3000))
        k = int(rng.integers(1, min(n, 40) + 1))
        probs = 10 ** (-rng.uniform(0.2, 9.3, n))
        edge = rng.random(n)
        probs[edge < 0.05] = 10 ** (-0.2)       # q2
        probs[edge > 0.97] = 10 ** (-9.3)       # q93
        bonf = float(rng.choice([1.0, 3.0, 999.0, 30000.0, 2.7e6]))
        sig = float(rng.choice([0.01, 0.05, 1.0]))
        add(probs, k, bonf, sig)
    # fuzz sweep (round 3): the deep-coverage regimes of the end-to-end
    # bench (N to 8000), K at the KMAX screening clip boundary (16/17),
    # identical-prob pools (maximal eps-comparator ties), and LDBL-range
    # underflow pressure from long runs of q93-like probs
    for _ in range(36):
        kind = rng.random()
        if kind < 0.35:
            n = int(rng.integers(3000, 8001))
            probs = 10 ** (-rng.uniform(0.5, 9.3, n))
            k = int(rng.choice([1, 2, 16, 17, 30]))
        elif kind < 0.6:
            n = int(rng.integers(50, 800))
            probs = np.full(n, float(10 ** (-rng.uniform(0.5, 6.0))))
            k = int(rng.integers(1, 12))
        else:
            n = int(rng.integers(500, 4000))
            probs = np.full(n, 10 ** (-9.3))
            hot = int(rng.integers(0, 8))
            probs[:hot] = 10 ** (-rng.uniform(0.3, 2.0, hot))
            k = int(rng.integers(1, 20))
        k = min(k, n)
        bonf = float(rng.choice([1.0, 3.0, 1.8e6, 1e10]))
        sig = float(rng.choice([0.0001, 0.01, 0.05]))
        add(probs, k, bonf, sig)
    return cases


def emit_input(cases):
    for c in cases:
        print(c["n"], c["k"], c["bonf"], c["sig"],
              " ".join(repr(p) for p in c["probs"]))


def pack(cases_file, golden_file, out_file):
    cases = make_cases()
    with open(golden_file) as fh:
        lines = [l.split() for l in fh if l.strip()]
    assert len(lines) == len(cases), (len(lines), len(cases))
    for c, parts in zip(cases, lines):
        c["pvalue"] = parts[0]
        c["probvec_hex"] = parts[1:]
    with open(out_file, "w") as fh:
        json.dump(cases, fh, indent=1)


if __name__ == "__main__":
    if "--emit-input" in sys.argv:
        emit_input(make_cases())
    elif "--pack" in sys.argv:
        i = sys.argv.index("--pack")
        pack(*sys.argv[i + 1 : i + 4])
    else:
        sys.exit("usage: gen_cases.py --emit-input | --pack cases golden out")
