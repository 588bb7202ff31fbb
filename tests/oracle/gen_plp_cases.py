#!/usr/bin/env python3
"""Case generator/packer for the compile_plp_col differential oracle.

Fuzzes read sets (CIGARs with M/I/D/N/S/=/X ops, per-base quals, lb/BI/
BD/ai/ad tags, strands, map quals) and derives each column's
bam_pileup1_t entries with an independent CIGAR walk implementing the
documented htslib pileup semantics (qpos of a deleted column = next
query base; `indel` set on the column preceding the event; is_head at
the read's first reference position; is_del also covers refskips).
Deliberately NOT importing lofreq_tpu: the repo side re-derives its
columns from the same reads through its own engine.

Usage:
  gen_plp_cases.py --emit-input          > cases.txt   (oracle stdin)
  gen_plp_cases.py --pack golden.txt ../golden/plp_col.json
"""

import json
import sys

import numpy as np

MATCHY = (0, 7, 8)  # M, =, X
CONSUME_REF = {0: 1, 2: 1, 3: 1, 7: 1, 8: 1}
CONSUME_QRY = {0: 1, 1: 1, 4: 1, 7: 1, 8: 1}
OPSTR = "MIDNSHP=X"


def pileup_entries(read, pos):
    """The independent htslib-semantics walk: returns None or a dict
    with qpos/indel/is_del/is_head/is_tail/is_refskip for `read` at
    column `pos`."""
    x = read["pos"]
    y = 0
    cig = read["cigar"]
    end = x + sum(l for op, l in cig if CONSUME_REF.get(op))
    if not (read["pos"] <= pos < end):
        return None
    ent = None
    for k, (op, l) in enumerate(cig):
        if op in MATCHY:
            if x <= pos < x + l:
                indel = 0
                if pos == x + l - 1 and k + 1 < len(cig):
                    op2, l2 = cig[k + 1]
                    if op2 == 1:
                        indel = l2
                    elif op2 == 2:
                        indel = -l2
                ent = dict(qpos=y + (pos - x), indel=indel, is_del=0,
                           is_refskip=0)
            x += l
            y += l
        elif op in (2, 3):  # D / N
            if x <= pos < x + l:
                ent = dict(qpos=y, indel=0, is_del=1,
                           is_refskip=1 if op == 3 else 0)
            x += l
        elif op in (1, 4):  # I / S
            y += l
    if ent is None:
        return None
    ent["is_head"] = 1 if pos == read["pos"] else 0
    ent["is_tail"] = 1 if pos == end - 1 else 0
    return ent


def rand_cigar(rng, kind):
    """A valid CIGAR (list of (op, len)) of the requested shape."""
    m = int(rng.integers(4, 14))
    m2 = int(rng.integers(4, 14))
    m3 = int(rng.integers(3, 9))
    if kind == "plain":
        return [(0, m + m2)]
    if kind == "ins":
        return [(0, m), (1, int(rng.integers(1, 5))), (0, m2)]
    if kind == "del":
        return [(0, m), (2, int(rng.integers(1, 5))), (0, m2)]
    if kind == "refskip":
        return [(0, m), (3, int(rng.integers(2, 7))), (0, m2)]
    if kind == "soft":
        return [(4, int(rng.integers(1, 5))), (0, m + m2),
                (4, int(rng.integers(1, 5)))]
    if kind == "multi":
        return [(0, m), (1, int(rng.integers(1, 4))), (0, m2),
                (2, int(rng.integers(1, 4))), (0, m3)]
    if kind == "eqx":
        return [(7, m), (8, int(rng.integers(1, 4))), (0, m2)]
    if kind == "trail_ins":
        return [(0, m + m2), (1, int(rng.integers(1, 4)))]
    raise ValueError(kind)


def make_read(rng, ref, kind, qlo=2, qhi=45):
    cig = rand_cigar(rng, kind)
    rlen = sum(l for op, l in cig if CONSUME_REF.get(op))
    pos = int(rng.integers(0, max(1, len(ref) - rlen)))
    qlen = sum(l for op, l in cig if CONSUME_QRY.get(op))
    bases = "ACGT"
    seq = []
    x = pos
    for op, l in cig:
        if op in MATCHY:
            for j in range(l):
                if op == 8 or rng.random() < 0.12:  # X or mismatch in M
                    seq.append(bases[int(rng.integers(0, 4))])
                else:
                    seq.append(ref[x + j])
            x += l
        elif op in (1, 4):
            seq.extend(bases[int(rng.integers(0, 4))] for _ in range(l))
        elif op in (2, 3):
            x += l
    qual = rng.integers(qlo, qhi + 1, qlen)

    def tagstr(present, lo=0, hi=60):
        if not present:
            return "-"
        return "".join(chr(int(v) + 33)
                       for v in rng.integers(lo, hi + 1, qlen))

    return dict(
        pos=pos,
        cigar=cig,
        seq="".join(seq),
        qual=[int(q) for q in qual],
        flag=16 if rng.random() < 0.5 else 0,
        mq=int(rng.choice([0, 13, 40, 60, 254, 255])),
        lb=tagstr(rng.random() < 0.75),
        BI=tagstr(rng.random() < 0.7),
        BD=tagstr(rng.random() < 0.7),
        ai=tagstr(rng.random() < 0.5),
        ad=tagstr(rng.random() < 0.5),
        sq=int(rng.integers(0, 200)),
    )


def gen_cases():
    rng = np.random.default_rng(20260819)
    bases = "ACGT"
    cases = []
    confs = [
        # (min_plp_bq, min_plp_idq, use_baq, use_sq)
        (3, 0, 1, 0),   # reference call default
        (3, 0, 1, 1),
        (13, 6, 1, 0),
        (3, 0, 0, 0),
        (20, 20, 1, 1),
        (6, 1, 1, 0),
    ]
    kinds = ["plain", "ins", "del", "refskip", "soft", "multi", "eqx",
             "trail_ins"]
    for ci, conf in enumerate(confs):
        for rep in range(5):
            # hrun-rich ref: random + planted homopolymers
            ref = list(rng.choice(list(bases), 80))
            for _ in range(3):
                p = int(rng.integers(0, 70))
                ref[p : p + int(rng.integers(2, 7))] = \
                    [bases[int(rng.integers(0, 4))]] * int(
                        rng.integers(2, 7))
            ref = "".join(ref[:80])
            nreads = int(rng.integers(3, 22))
            reads = [make_read(rng, ref,
                               kinds[int(rng.integers(0, len(kinds)))])
                     for _ in range(nreads)]
            # column picks: indel anchors, del interiors, read
            # start/end, random
            pos_pool = set()
            for r in reads:
                x = r["pos"]
                for k, (op, l) in enumerate(r["cigar"]):
                    if op in MATCHY:
                        if k + 1 < len(r["cigar"]) and \
                                r["cigar"][k + 1][0] in (1, 2):
                            pos_pool.add(x + l - 1)  # indel anchor
                        x += l
                    elif op in (2, 3):
                        pos_pool.add(x)  # del/refskip interior
                        x += l
                pos_pool.add(r["pos"])
                end = r["pos"] + sum(l for op, l in r["cigar"]
                                     if CONSUME_REF.get(op))
                pos_pool.add(end - 1)
            pos_pool = [p for p in pos_pool if 0 <= p < len(ref)]
            rng.shuffle(pos_pool)
            for pos in pos_pool[:4]:
                ents = []
                kept = []
                for r in reads:
                    e = pileup_entries(r, pos)
                    if e is not None:
                        ents.append(e)
                        kept.append(r)
                if not ents:
                    continue
                cases.append(dict(conf=conf, ref=ref, pos=int(pos),
                                  reads=kept, entries=ents,
                                  target=f"t{ci}"))
    return cases


def emit_input(cases, fh):
    for c in cases:
        bq, idq, ub, us = c["conf"]
        print(f"CASE {bq} {idq} {ub} {us} {c['pos']} {c['target']}",
              file=fh)
        print(f"REF {c['ref']}", file=fh)
        print(f"NREADS {len(c['reads'])}", file=fh)
        for r, e in zip(c["reads"], c["entries"]):
            qual33 = "".join(chr(q + 33) for q in r["qual"])
            print(f"READ {r['flag']} {r['mq']} {len(r['seq'])} "
                  f"{r['seq']} {qual33} {r['lb']} {r['BI']} {r['BD']} "
                  f"{r['ai']} {r['ad']} {r['sq']} {e['qpos']} "
                  f"{e['indel']} {e['is_del']} {e['is_head']} "
                  f"{e['is_tail']} {e['is_refskip']}", file=fh)
        print("END", file=fh)


def parse_golden(text):
    out = []
    lines = iter(text.splitlines())
    for line in lines:
        if not line.startswith("COL "):
            continue
        t = line.split()
        col = dict(pos=int(t[1]), ref_base=t[2], cons_base=t[3],
                   coverage_plp=int(t[4]), num_bases=int(t[5]),
                   num_heads=int(t[6]), num_tails=int(t[7]),
                   hrun=int(t[8]), num_ins=int(t[9]), sum_ins=int(t[10]),
                   num_dels=int(t[11]), sum_dels=int(t[12]),
                   num_non_indels=int(t[13]), num_ign_indels=int(t[14]),
                   has_indel_aqs=int(t[15]), nt={}, iev=[], dev=[])
        for line2 in lines:
            w = line2.split()
            if w[0] == "ENDCOL":
                break
            if w[0] in ("FW", "RV"):
                col[w[0].lower()] = [int(v) for v in w[1:]]
            elif w[0] == "NT":
                groups = []
                i = 2
                for _g in range(4):
                    n = int(w[i])
                    groups.append([int(v) for v in w[i + 1 : i + 1 + n]])
                    i += n + 1
                    assert w[i] == "|"
                    i += 1
                col["nt"][w[1]] = groups
            elif w[0] in ("INSQ", "INSM", "INSS", "DELQ", "DELM",
                          "DELS"):
                col[w[0].lower()] = [int(v) for v in w[2:]]
            elif w[0] in ("NIFR", "NDFR"):
                col[w[0].lower()] = [int(w[1]), int(w[2])]
            elif w[0] in ("IEV", "DEV"):
                ev = dict(key=w[1], count=int(w[2]), cons_quals=int(w[3]),
                          fw=int(w[4]), rv=int(w[5]), groups=[])
                i = 6
                for _g in range(4):
                    n = int(w[i])
                    ev["groups"].append(
                        [int(v) for v in w[i + 1 : i + 1 + n]])
                    i += n + 1
                    assert w[i] == "|"
                    i += 1
                col["iev" if w[0] == "IEV" else "dev"].append(ev)
        out.append(col)
    return out


def main():
    if sys.argv[1] == "--emit-input":
        emit_input(gen_cases(), sys.stdout)
    elif sys.argv[1] == "--pack":
        cases = gen_cases()
        golden = parse_golden(open(sys.argv[2]).read())
        assert len(golden) == len(cases), (len(golden), len(cases))
        packed = []
        for c, g in zip(cases, golden):
            packed.append(dict(conf=c["conf"], ref=c["ref"],
                               pos=c["pos"], target=c["target"],
                               reads=[{k: r[k] for k in
                                       ("pos", "cigar", "seq", "qual",
                                        "flag", "mq", "lb", "BI", "BD",
                                        "ai", "ad", "sq")}
                                      for r in c["reads"]],
                               expected=g))
        with open(sys.argv[3], "w") as fh:
            json.dump(packed, fh)
        print(f"wrote {sys.argv[3]}: {len(packed)} cases")
    else:
        raise SystemExit("usage: --emit-input | --pack golden.txt out.json")


if __name__ == "__main__":
    main()
