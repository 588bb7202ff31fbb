#!/usr/bin/env python3
"""Cases for the viterbi realignment DRIVER differential.

Fuzzes reads around the reference driver's decision points
(lofreq_viterbi.c:107-345): indel-free passthrough, hard-clip
passthrough, unmapped passthrough, Q2 tails (check_Q2/remain with and
without --defqual), soft clips, multi-indel reads, reads near reference
edges, --keepflags tag stripping, --reclip leading/trailing-insert
conversion.

Usage:
  gen_viterbi_driver_cases.py --emit-input       > cases.txt
  gen_viterbi_driver_cases.py --pack golden.txt ../golden/viterbi_driver.json
"""

import json
import sys

import numpy as np

BASES = "ACGT"
CONSUME_REF = {0: 1, 2: 1, 7: 1, 8: 1}
CONSUME_QRY = {0: 1, 1: 1, 4: 1, 7: 1, 8: 1}
OPSTR = "MIDNSHP=X"


def mk_read(rng, ref, kind, q2tail=False):
    m = int(rng.integers(8, 20))
    m2 = int(rng.integers(8, 20))
    if kind == "plain":
        cig = [(0, m + m2)]
    elif kind == "ins":
        cig = [(0, m), (1, int(rng.integers(1, 4))), (0, m2)]
    elif kind == "del":
        cig = [(0, m), (2, int(rng.integers(1, 4))), (0, m2)]
    elif kind == "multi":
        cig = [(0, m), (1, 1), (0, m2), (2, 2),
               (0, int(rng.integers(5, 12)))]
    elif kind == "soft_ins":
        cig = [(4, int(rng.integers(1, 4))), (0, m),
               (2, int(rng.integers(1, 3))), (0, m2),
               (4, int(rng.integers(1, 4)))]
    elif kind == "lead_ins":
        # leading insert: the --reclip conversion target
        cig = [(1, int(rng.integers(1, 3))), (0, m + m2)]
    elif kind == "trail_ins":
        cig = [(0, m + m2), (1, int(rng.integers(1, 3)))]
    elif kind == "hard":
        cig = [(5, 2), (0, m), (1, 1), (0, m2)]
    else:
        raise ValueError(kind)
    rlen = sum(l for op, l in cig if CONSUME_REF.get(op))
    pos = int(rng.integers(4, max(5, len(ref) - rlen - 30)))
    qlen = sum(l for op, l in cig if CONSUME_QRY.get(op))
    # realistic reads: mostly matching the reference (the realigner is
    # only meaningful when the sequence nearly matches), a few errors
    seq = []
    x = pos
    for op, l in cig:
        if op in (0, 7, 8):
            for j in range(l):
                if rng.random() < 0.05:
                    seq.append(BASES[int(rng.integers(0, 4))])
                else:
                    seq.append(ref[x + j])
            x += l
        elif op in (1, 4):
            seq.extend(BASES[int(rng.integers(0, 4))] for _ in range(l))
        elif op == 2:
            x += l
    qual = [int(q) for q in rng.integers(10, 41, qlen)]
    if q2tail:
        t = int(rng.integers(1, max(2, qlen // 3)))
        for j in range(qlen - t, qlen):
            qual[j] = 2
        if rng.random() < 0.3:  # leading Q2 run too
            for j in range(int(rng.integers(1, 4))):
                qual[j] = 2
    flag = int(rng.choice([0, 16]))
    if kind == "unmapped":
        flag |= 4
    cigar_s = "".join(f"{l}{OPSTR[op]}" for op, l in cig)
    return dict(flag=flag, pos=pos, mapq=50, cigar=cigar_s,
                seq="".join(seq), qual=qual)


def gen_cases():
    rng = np.random.default_rng(777)
    kinds = ["plain", "ins", "del", "multi", "soft_ins", "lead_ins",
             "trail_ins", "hard"]
    cases = []
    for keepflags, q2def, reclip in ((0, -1, 0), (1, -1, 0), (0, 20, 0),
                                     (0, -1, 1), (0, 30, 1)):
        for rep in range(5):
            ref = "".join(rng.choice(list(BASES), 200))
            reads = []
            for j in range(int(rng.integers(4, 10))):
                kind = kinds[int(rng.integers(0, len(kinds)))]
                reads.append(mk_read(rng, ref, kind,
                                     q2tail=rng.random() < 0.5))
            cases.append(dict(keepflags=keepflags, q2def=q2def,
                              reclip=reclip, ref=ref, reads=reads))
    return cases


def emit_input(cases, fh):
    for c in cases:
        print(f"CASE {c['keepflags']} {c['q2def']} {c['reclip']}",
              file=fh)
        print(f"REF {c['ref']}", file=fh)
        print(f"NREADS {len(c['reads'])}", file=fh)
        for r in c["reads"]:
            qual33 = "".join(chr(q + 33) for q in r["qual"])
            print(f"READ {r['flag']} {r['pos']} {r['mapq']} "
                  f"{r['cigar']} {r['seq']} {qual33}", file=fh)


def main():
    if sys.argv[1] == "--emit-input":
        emit_input(gen_cases(), sys.stdout)
    elif sys.argv[1] == "--pack":
        cases = gen_cases()
        blocks = open(sys.argv[2]).read().split("ENDCASE\n")
        blocks = [b for b in blocks if b.strip() or b == ""][:len(cases)]
        packed = []
        for c, block in zip(cases, blocks):
            outs = []
            for line in block.splitlines():
                pos, cig, qual, flag = line.split(" ")
                outs.append(dict(pos=int(pos), cigar=cig, qual=qual,
                                 flag=int(flag)))
            assert len(outs) == len(c["reads"]), (len(outs),
                                                  len(c["reads"]))
            packed.append(dict(**c, expected=outs))
        assert len(packed) == len(cases)
        with open(sys.argv[3], "w") as fh:
            json.dump(packed, fh)
        print(f"wrote {sys.argv[3]}: {len(packed)} cases, "
              f"{sum(len(p['expected']) for p in packed)} reads")
    else:
        raise SystemExit("usage: --emit-input | --pack")


if __name__ == "__main__":
    main()
