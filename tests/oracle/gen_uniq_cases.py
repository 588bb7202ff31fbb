#!/usr/bin/env python3
"""Cases for the per-variant uniq-test differential.

Fuzzes (column, variant) pairs: SNVs with AF from INFO or --uni-freq,
ins/del variants keyed into the event hashes (present, absent, and
near-miss keys), coverage-minus-tails indel rule, zero alt counts,
AF walls, and the detection-limit mode's snpcaller path.

Usage:
  gen_uniq_cases.py --emit-input        > cases.txt
  gen_uniq_cases.py --pack golden.txt ../golden/uniq.json
"""

import json
import sys

import numpy as np

BASES = "ACGT"


def mk_col(rng, ref_base, depth, ins_events, del_events, tails):
    nts = {}
    rest = depth
    order = list(range(4))
    rng.shuffle(order)
    for i in order[:-1]:
        k = int(rng.integers(0, rest + 1)) if rest else 0
        if BASES[i] == ref_base:
            k = max(k, rest // 2)
        nts[i] = min(k, rest)
        rest -= nts[i]
    nts[order[-1]] = rest

    def pool(n):
        return dict(
            bq=[int(q) for q in rng.integers(6, 41, n)],
            baq=[int(q) for q in rng.integers(-1, 41, n)],
            mq=[int(q) for q in rng.choice([0, 20, 50, 60, 255], n)],
            sq=[-1] * n,
        )

    return dict(ref_base=ref_base,
                coverage=depth, tails=tails,
                nt={i: pool(nts.get(i, 0)) for i in range(5)},
                ins_events=ins_events, del_events=del_events)


def rand_event(rng, key):
    n = int(rng.integers(1, 8))
    return dict(key=key,
                q=[int(q) for q in rng.integers(1, 70, n)],
                aq=[-1] * n,
                mq=[int(q) for q in rng.choice([20, 60], n)],
                sq=[-1] * n,
                strand=[int(v) for v in rng.integers(0, 2, n)])


def gen_cases():
    rng = np.random.default_rng(1212)
    cases = []
    for rep in range(90):
        ref_base = str(rng.choice(list(BASES)))
        depth = int(rng.integers(2, 300))
        tails = int(rng.integers(0, max(1, depth // 8)))
        kind = rep % 5
        ins_events, del_events = [], []
        pos = int(rng.integers(0, 5000))
        uni_freq = float(rng.choice([-1.0, -1.0, 0.3, 1.0]))
        det_lim = 1 if kind == 4 else 0
        af = round(float(rng.choice([0.01, 0.08, 0.5, 0.93,
                                     rng.random()])), 6)
        info = f"DP={depth};AF={af:.6f}"
        if kind in (0, 4):  # SNV
            alt = str(rng.choice([b for b in BASES if b != ref_base]))
            refs, alts = ref_base, alt
        elif kind == 1:  # insertion, event present
            seq = "".join(str(rng.choice(list(BASES)))
                          for _ in range(int(rng.integers(1, 4))))
            ins_events.append(rand_event(rng, seq))
            refs, alts = ref_base, ref_base + seq
            info += ";INDEL"
        elif kind == 2:  # deletion, event present or near-miss
            seq = "".join(str(rng.choice(list(BASES)))
                          for _ in range(int(rng.integers(1, 4))))
            if rng.random() < 0.7:
                del_events.append(rand_event(rng, seq))
            else:  # near-miss key in the hash
                del_events.append(rand_event(rng, seq + "A"))
            refs, alts = ref_base + seq, ref_base
            info += ";INDEL"
        else:  # kind 3: SNV with alt absent from pools entirely
            alt = str(rng.choice([b for b in BASES if b != ref_base]))
            refs, alts = ref_base, alt
        col = mk_col(rng, ref_base, depth, ins_events, del_events, tails)
        if kind == 3:
            b = BASES.index(alts)
            col["nt"][b] = dict(bq=[], baq=[], mq=[], sq=[])
        cases.append(dict(uni_freq=uni_freq, det_lim=det_lim,
                          chrom="u1", pos=pos, ref=refs, alt=alts,
                          info=info, col=col))
    return cases


def emit_input(cases, fh):
    for c in cases:
        print(f"CONF {c['uni_freq']} {c['det_lim']}", file=fh)
        print(f"VAR {c['chrom']} {c['pos']} {c['ref']} {c['alt']} "
              f"{c['info']}", file=fh)
        col = c["col"]
        print(f"COL {c['chrom']} {c['pos']} {col['ref_base']} "
              f"{col['coverage']} {col['tails']}", file=fh)
        for i in range(5):
            p = col["nt"][i]
            n = len(p["bq"])
            vals = " ".join(str(v) for v in
                            p["bq"] + p["baq"] + p["mq"] + p["sq"])
            print(f"NT {i} {n}" + (f" {vals}" if n else ""), file=fh)
        for tag, evs in (("IEV", col["ins_events"]),
                         ("DEV", col["del_events"])):
            for e in evs:
                flat = e["q"] + e["aq"] + e["mq"] + e["sq"] + e["strand"]
                print(f"{tag} {e['key']} {len(e['q'])} "
                      + " ".join(str(v) for v in flat), file=fh)
        print("ENDCOL", file=fh)


def main():
    if sys.argv[1] == "--emit-input":
        emit_input(gen_cases(), sys.stdout)
    elif sys.argv[1] == "--pack":
        cases = gen_cases()
        lines = [l.rstrip("\n") for l in open(sys.argv[2])
                 if l.startswith("INFO ")]
        assert len(lines) == len(cases), (len(lines), len(cases))
        packed = [dict(**c, expected=l[5:]) for c, l in
                  zip(cases, lines)]
        with open(sys.argv[3], "w") as fh:
            json.dump(packed, fh)
        print(f"wrote {sys.argv[3]}: {len(packed)} cases")
    else:
        raise SystemExit("usage: --emit-input | --pack")


if __name__ == "__main__":
    main()
