#!/usr/bin/env python3
"""Cases for the indelqual (BI/BD tag) differential.

Fuzzes homopolymer-rich references and reads with M/=/X/D/I/S/H CIGARs
(incl. reads ending at the reference edge for the rlen-2 clamp, runs
longer than the 18-entry DINDELQ table, and default-mask-skipped
reads), plus uniform mode with ENCODE_Q-clamping qualities.

Usage:
  gen_indelqual_cases.py --emit-input           > cases.txt
  gen_indelqual_cases.py --pack golden.txt ../golden/indelqual.json
"""

import json
import sys

import numpy as np

BASES = "ACGT"
CONSUME_REF = {0: 1, 2: 1, 7: 1, 8: 1}
CONSUME_QRY = {0: 1, 1: 1, 4: 1, 7: 1, 8: 1}
OPSTR = "MIDNSHP=X"


def rand_cigar(rng, kind):
    m = int(rng.integers(5, 16))
    m2 = int(rng.integers(5, 16))
    if kind == 0:
        return [(0, m + m2)]
    if kind == 1:
        return [(0, m), (1, int(rng.integers(1, 4))), (0, m2)]
    if kind == 2:
        return [(0, m), (2, int(rng.integers(1, 4))), (0, m2)]
    if kind == 3:
        return [(4, int(rng.integers(1, 4))), (0, m + m2),
                (4, int(rng.integers(1, 4)))]
    if kind == 4:
        return [(5, 3), (0, m), (1, 2), (0, m2), (2, 2),
                (0, int(rng.integers(3, 8))), (5, 2)]
    if kind == 5:
        return [(7, m), (8, 2), (0, m2)]
    raise ValueError


def make_ref(rng, n=160):
    out = []
    while len(out) < n:
        if rng.random() < 0.4:
            out.extend(rng.choice(list(BASES))
                       * int(rng.integers(2, 26)))  # runs past DINDELQ
        else:
            out.append(BASES[int(rng.integers(0, 4))])
    return "".join(out[:n])


def make_read(rng, ref, kind, at_edge=False):
    cig = rand_cigar(rng, kind)
    rlen = sum(l for op, l in cig if CONSUME_REF.get(op))
    if at_edge:
        pos = len(ref) - rlen  # last M base hits the rlen-2 clamp
    else:
        pos = int(rng.integers(0, max(1, len(ref) - rlen)))
    qlen = sum(l for op, l in cig if CONSUME_QRY.get(op))
    seq = "".join(BASES[int(rng.integers(0, 4))] for _ in range(qlen))
    qual = [int(q) for q in rng.integers(2, 42, qlen)]
    flag = rng.choice([0, 16, 0, 16, 256, 1024, 512])  # mask-skips too
    cigar_s = "".join(f"{l}{OPSTR[op]}" for op, l in cig)
    return dict(flag=int(flag), pos=pos, cigar=cigar_s, seq=seq,
                qual=qual)


def gen_cases():
    rng = np.random.default_rng(321)
    cases = []
    for rep in range(10):
        ref = make_ref(rng)
        reads = [make_read(rng, ref, int(rng.integers(0, 6)),
                           at_edge=(j == 0 and rep % 2 == 0))
                 for j in range(int(rng.integers(3, 10)))]
        cases.append(dict(mode="dindel", iq=0, dq=0, ref=ref,
                          reads=reads))
    for iq, dq in ((40, 35), (0, 0), (93, 94), (-5, 200)):
        ref = make_ref(rng, 80)
        reads = [make_read(rng, ref, int(rng.integers(0, 6)))
                 for _ in range(4)]
        cases.append(dict(mode="uniform", iq=iq, dq=dq, ref=ref,
                          reads=reads))
    return cases


def emit_input(cases, fh):
    for c in cases:
        print(f"CASE {c['mode']} {c['iq']} {c['dq']}", file=fh)
        print(f"REF {c['ref']}", file=fh)
        print(f"NREADS {len(c['reads'])}", file=fh)
        for r in c["reads"]:
            qual33 = "".join(chr(q + 33) for q in r["qual"])
            print(f"READ {r['flag']} {r['pos']} {r['cigar']} "
                  f"{r['seq']} {qual33}", file=fh)


def main():
    if sys.argv[1] == "--emit-input":
        emit_input(gen_cases(), sys.stdout)
    elif sys.argv[1] == "--pack":
        cases = gen_cases()
        lines = [l.rstrip("\n") for l in open(sys.argv[2])]
        total = sum(len(c["reads"]) for c in cases)
        assert len(lines) == total, (len(lines), total)
        i = 0
        packed = []
        for c in cases:
            exp = []
            for _ in c["reads"]:
                bi, bd = lines[i].split(" ")
                exp.append([bi, bd])
                i += 1
            packed.append(dict(**c, expected=exp))
        with open(sys.argv[3], "w") as fh:
            json.dump(packed, fh)
        print(f"wrote {sys.argv[3]}: {len(packed)} cases, {total} reads")
    else:
        raise SystemExit("usage: --emit-input | --pack")


if __name__ == "__main__":
    main()
