#!/usr/bin/env python3
"""Case generator/packer for the call_indels differential oracle.

Fuzzes per-column indel-event pools (keys 1-6bp incl. 1-bp A/T poly-AT
suppression triggers, occurrence counts, indel/aln/map/source quals,
strands, non-event pools, coverage/tails, dynamic vs fixed Bonferroni,
min_cov edges) for the reference's call_indels (lofreq_call.c:619-726).

Usage:
  gen_call_indels_cases.py --emit-input          > cases.txt
  gen_call_indels_cases.py --pack golden.txt ../golden/call_indels.json
"""

import json
import random
import sys

BASES = "ACGT"


def rand_key(rng, atish):
    if atish or rng.random() < 0.35:
        return rng.choice("AT")
    n = rng.randrange(1, 7)
    return "".join(rng.choice(BASES) for _ in range(n))


def rand_event(rng, key, lowcount=False, strong=False):
    if strong:
        # high-count, high-qual: drives the pvalue significant so the
        # report_var emission path (AF/SB/DP4/qual formatting) is hit
        n = rng.randrange(12, 30)
        return dict(
            key=key,
            q=[rng.randrange(55, 80) for _ in range(n)],
            aq=[rng.randrange(40, 70) for _ in range(n)],
            mq=[rng.choice([50, 60]) for _ in range(n)],
            sq=[rng.randrange(40, 120) for _ in range(n)],
            strand=[rng.randrange(0, 2) for _ in range(n)],
        )
    n = rng.randrange(1, 4) if lowcount else rng.randrange(1, 11)
    return dict(
        key=key,
        # q >= 1: a 0 indel qual is err-prob 1.0, which trips the
        # reference's own log-space assert (snpcaller.c:920) — dindel
        # never emits 0
        q=[rng.randrange(1, 80) for _ in range(n)],
        # aq -1 = tag absent (has_indel_aqs stays off for the column
        # only if EVERY occurrence lacks it)
        aq=[(-1 if rng.random() < 0.3 else rng.randrange(0, 70))
            for _ in range(n)],
        mq=[rng.choice([0, 13, 37, 60, 255]) for _ in range(n)],
        sq=[rng.randrange(-1, 120) for _ in range(n)],
        strand=[rng.randrange(0, 2) for _ in range(n)],
    )


def gen_cases():
    rng = random.Random(77)
    cases = []
    confs = [
        # (use_mq, use_sq, use_idaq, dyn, bonf0, sig, min_cov)
        (1, 0, 1, 1, 1, 0.01, 10),      # reference call defaults
        (1, 0, 1, 1, 137, 0.01, 10),    # mid-ladder dyn bonf
        (1, 1, 1, 1, 1, 0.01, 10),      # source quals on
        (1, 0, 0, 1, 1, 0.01, 10),      # no idaq
        (0, 0, 1, 0, 20000, 0.05, 1),   # fixed bonf, no mq
        (1, 0, 1, 1, 1, 0.01, 150),     # min_cov gate edge
    ]
    for conf in confs:
        for rep in range(16):
            # poly-AT suppression needs BOTH +X and -X (X in AT) at
            # af < 0.05: make low-count A/T pairs sometimes
            polyat = rep % 3 == 0
            ins_events = []
            del_events = []
            keys_i = set()
            keys_d = set()
            strongish = rep % 4 == 1
            for j in range(rng.randrange(0, 3)):
                k = rand_key(rng, polyat)
                if k not in keys_i:
                    keys_i.add(k)
                    ins_events.append(rand_event(rng, k, polyat,
                                                 strong=strongish and j == 0))
            for j in range(rng.randrange(0, 3)):
                k = rand_key(rng, polyat)
                if k not in keys_d:
                    keys_d.add(k)
                    del_events.append(rand_event(rng, k, polyat,
                                                 strong=strongish and j == 0))
            num_ins = sum(len(e["q"]) for e in ins_events)
            num_dels = sum(len(e["q"]) for e in del_events)
            num_non = rng.randrange(5, 160)
            # real-pileup invariant: coverage_plp counts every pileup
            # entry, so it bounds the err-prob pool the reference
            # allocates (plp_to_ins_errprobs mallocs coverage_plp
            # doubles, snpcaller.c:506) — entries lost to the idq gate
            # make coverage strictly larger
            cov = num_ins + num_dels + num_non + rng.randrange(0, 5)
            tails = rng.randrange(0, max(1, cov // 10))
            # non-event pools: ins pool fed by del-event + non-indel
            # rows; del pool by ins-event + non-indel rows
            n_insp = num_dels + num_non
            n_delp = num_ins + num_non
            inq = [rng.randrange(1, 70) for _ in range(n_insp)]
            inm = [rng.choice([0, 20, 50, 60, 255]) for _ in range(n_insp)]
            dnq = [rng.randrange(1, 70) for _ in range(n_delp)]
            dnm = [rng.choice([0, 20, 50, 60, 255]) for _ in range(n_delp)]
            nifr = [rng.randrange(0, n_insp + 1)]
            nifr.append(n_insp - nifr[0])
            ndfr = [rng.randrange(0, n_delp + 1)]
            ndfr.append(n_delp - ndfr[0])
            cases.append(dict(
                conf=list(conf),
                target=f"c{len(cases)}",
                pos=rng.randrange(0, 100000),
                ref_base=rng.choice(BASES),
                coverage_plp=cov, num_heads=rng.randrange(0, 4),
                num_tails=tails, num_ins=num_ins, num_dels=num_dels,
                num_non_indels=num_non, hrun=rng.randrange(0, 9),
                nifr=nifr, ndfr=ndfr,
                inq=inq, inm=inm, dnq=dnq, dnm=dnm,
                ins_events=ins_events, del_events=del_events,
            ))
    return cases


def emit_input(cases, fh):
    for c in cases:
        print("CONF " + " ".join(str(v) for v in c["conf"]), file=fh)
        print(f"COL {c['target']} {c['pos']} {c['ref_base']} "
              f"{c['coverage_plp']} {c['num_heads']} {c['num_tails']} "
              f"{c['num_ins']} {c['num_dels']} {c['num_non_indels']} "
              f"{c['hrun']}", file=fh)
        print(f"NIFR {c['nifr'][0]} {c['nifr'][1]}", file=fh)
        print(f"NDFR {c['ndfr'][0]} {c['ndfr'][1]}", file=fh)
        for tag, key in (("INQ", "inq"), ("INM", "inm"),
                         ("DNQ", "dnq"), ("DNM", "dnm")):
            vals = " ".join(str(v) for v in c[key])
            print(f"{tag} {len(c[key])} {vals}", file=fh)
        for tag, evs in (("IEV", c["ins_events"]),
                         ("DEV", c["del_events"])):
            for e in evs:
                flat = e["q"] + e["aq"] + e["mq"] + e["sq"] + e["strand"]
                print(f"{tag} {e['key']} {len(e['q'])} "
                      + " ".join(str(v) for v in flat), file=fh)
        print("ENDCOL", file=fh)


def parse_golden(text):
    out = []
    cur = None
    for line in text.splitlines():
        if line.startswith("CASE "):
            cur = dict(bonf_before=int(line.split()[1]), vars=[])
        elif line.startswith("ENDCASE "):
            w = line.split()
            cur["bonf_after"] = int(w[1])
            cur["num_tests_total"] = int(w[2])
            out.append(cur)
            cur = None
        elif cur is not None and line.strip():
            # VCF row: CHROM POS ID REF ALT QUAL FILTER INFO
            w = line.rstrip("\n").split("\t")
            cur["vars"].append(dict(chrom=w[0], pos=int(w[1]),
                                    ref=w[3], alt=w[4], qual=w[5],
                                    info=w[7]))
    return out


def main():
    if sys.argv[1] == "--emit-input":
        emit_input(gen_cases(), sys.stdout)
    elif sys.argv[1] == "--pack":
        cases = gen_cases()
        golden = parse_golden(open(sys.argv[2]).read())
        assert len(golden) == len(cases), (len(golden), len(cases))
        packed = [dict(case=c, expected=g) for c, g in zip(cases, golden)]
        with open(sys.argv[3], "w") as fh:
            json.dump(packed, fh)
        print(f"wrote {sys.argv[3]}: {len(packed)} cases; "
              f"{sum(len(g['vars']) for g in golden)} emitted vars")
    else:
        raise SystemExit("usage: --emit-input | --pack golden.txt out.json")


if __name__ == "__main__":
    main()
