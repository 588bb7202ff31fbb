#!/usr/bin/env python3
"""Case generator/packer for the source_qual differential oracle.

Fuzzes reads (M/I/D/N/S/X CIGARs — no '=', see oracle_source_qual.c
header), per-base quals around the min_bq boundary, mismatch densities
from clean to junk, def_nm_q modes, and -S ign-position lists (hits on
mismatches, insertion anchors at tpos-1, deletion anchors at tpos).

Usage:
  gen_source_qual_cases.py --emit-input          > cases.txt
  gen_source_qual_cases.py --pack golden.txt ../golden/source_qual.json
"""

import json
import sys

import numpy as np

BASES = "ACGT"
CONSUME_REF = {0: 1, 2: 1, 3: 1, 8: 1}
CONSUME_QRY = {0: 1, 1: 1, 4: 1, 8: 1}
OPSTR = "MIDNSHP=X"


def rand_cigar(rng, kind):
    m = int(rng.integers(6, 20))
    m2 = int(rng.integers(6, 20))
    if kind == "plain":
        return [(0, m + m2)]
    if kind == "ins":
        return [(0, m), (1, int(rng.integers(1, 5))), (0, m2)]
    if kind == "del":
        return [(0, m), (2, int(rng.integers(1, 5))), (0, m2)]
    if kind == "refskip":
        return [(0, m), (3, int(rng.integers(2, 8))), (0, m2)]
    if kind == "soft":
        return [(4, int(rng.integers(1, 6))), (0, m + m2),
                (4, int(rng.integers(1, 6)))]
    if kind == "multi":
        return [(4, 2), (0, m), (1, 2), (0, m2), (2, 3),
                (0, int(rng.integers(4, 9)))]
    if kind == "diff":
        return [(0, m), (8, int(rng.integers(1, 4))), (0, m2)]
    raise ValueError(kind)


def make_read(rng, ref, kind, mism_rate):
    cig = rand_cigar(rng, kind)
    rlen = sum(l for op, l in cig if CONSUME_REF.get(op))
    pos = int(rng.integers(0, max(1, len(ref) - rlen)))
    seq = []
    x = pos
    for op, l in cig:
        if op in (0, 8):
            for j in range(l):
                if op == 8 or rng.random() < mism_rate:
                    seq.append(BASES[int(rng.integers(0, 4))])
                else:
                    seq.append(ref[x + j])
            x += l
        elif op in (1, 4):
            seq.extend(BASES[int(rng.integers(0, 4))] for _ in range(l))
        elif op in (2, 3):
            x += l
    qlen = len(seq)
    # quals straddling the min_bq boundary, incl. exact hits
    qual = rng.integers(1, 42, qlen)
    cigar_s = "".join(f"{l}{OPSTR[op]}" for op, l in cig)
    return dict(pos=pos, cigar=cigar_s, seq="".join(seq),
                qual=[int(q) for q in qual])


def gen_cases():
    rng = np.random.default_rng(55)
    cases = []
    kinds = ["plain", "ins", "del", "refskip", "soft", "multi", "diff"]
    # (def_nm_q, min_bq) — def_nm_q -1 = use actual quals (reference -S
    # default passes DEFAULT_DEF_NM_QUAL); min_bq DEFAULT_MIN_BQ=6 in
    # the production call (plp.c:737)
    confs = [(-1, 6), (20, 6), (-1, 13), (0, 6), (-1, 1)]
    for ci, (def_nm_q, min_bq) in enumerate(confs):
        for rep in range(18):
            ref = "".join(rng.choice(list(BASES), 120))
            nreads = int(rng.integers(2, 8))
            mism = [0.0, 0.02, 0.12, 0.5][rep % 4]
            reads = [make_read(rng, ref,
                               kinds[int(rng.integers(0, len(kinds)))],
                               mism)
                     for _ in range(nreads)]
            # ign list on some cases: cover mismatch sites and indel
            # anchors (ins keyed at tpos-1, del at tpos)
            ign = []
            if rep % 2 == 1:
                pool = set()
                for r in reads:
                    x = r["pos"]
                    ops = []
                    num = ""
                    for ch in r["cigar"]:
                        if ch.isdigit():
                            num += ch
                        else:
                            ops.append((OPSTR.index(ch), int(num)))
                            num = ""
                    for op, l in ops:
                        if op in (0, 8):
                            pool.update(range(x, x + l))
                            x += l
                        elif op == 1:
                            pool.add(x - 1)
                        elif op in (2, 3):
                            pool.add(x)
                            x += l
                pool = sorted(pool)
                k = int(rng.integers(1, max(2, len(pool) // 3)))
                ign = sorted(int(p) for p in
                             rng.choice(pool, size=min(k, len(pool)),
                                        replace=False))
            cases.append(dict(def_nm_q=def_nm_q, min_bq=min_bq,
                              ign=ign, ref=ref, reads=reads))
    return cases


def emit_input(cases, fh):
    for c in cases:
        ign = " ".join(str(p) for p in c["ign"])
        print(f"CASE {c['def_nm_q']} {c['min_bq']} {len(c['ign'])}"
              + (f" {ign}" if ign else ""), file=fh)
        print(f"REF {c['ref']}", file=fh)
        print(f"NREADS {len(c['reads'])}", file=fh)
        for r in c["reads"]:
            qual33 = "".join(chr(q + 33) for q in r["qual"])
            print(f"READ {r['pos']} {r['cigar']} {r['seq']} {qual33}",
                  file=fh)
    return sum(len(c["reads"]) for c in cases)


def main():
    if sys.argv[1] == "--emit-input":
        emit_input(gen_cases(), sys.stdout)
    elif sys.argv[1] == "--emit-split":
        # one file per case: the reference's ign-var hash can only be
        # loaded once per process (var_hash_free_table leaves the static
        # head dangling, plp.c:327-331 — load-once in real lofreq), so
        # the golden script runs the oracle once per case
        import os
        os.makedirs(sys.argv[2], exist_ok=True)
        for i, c in enumerate(gen_cases()):
            with open(os.path.join(sys.argv[2], f"case{i:04d}.txt"),
                      "w") as fh:
                emit_input([c], fh)
        print(len(gen_cases()))
    elif sys.argv[1] == "--pack":
        cases = gen_cases()
        sqs = [int(l) for l in open(sys.argv[2]) if l.strip()]
        total = sum(len(c["reads"]) for c in cases)
        assert len(sqs) == total, (len(sqs), total)
        i = 0
        packed = []
        for c in cases:
            exp = sqs[i : i + len(c["reads"])]
            i += len(c["reads"])
            packed.append(dict(**c, expected=exp))
        with open(sys.argv[3], "w") as fh:
            json.dump(packed, fh)
        print(f"wrote {sys.argv[3]}: {len(packed)} cases, {total} reads")
    else:
        raise SystemExit("usage: --emit-input | --pack golden.txt out.json")


if __name__ == "__main__":
    main()
