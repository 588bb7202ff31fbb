#!/usr/bin/env python3
"""Case generator/packer for the column-level call_snvs differential golden
(tests/golden/call_snvs.json).  Cases exercise plp_to_errprobs + snpcaller
at the same level as the reference's call_snvs (lofreq_call.c:735-877):
randomized columns over depth/alt-count/quality distributions including the
q2/q93 edges, MQ 0/255, missing (-1) BAQ/SQ, and every def_alt_bq mode."""

import json
import sys

import numpy as np

FLAG_BAQ, FLAG_MQ, FLAG_SQ = 1, 2, 4


def make_cases():
    rng = np.random.default_rng(20260817)
    cases = []

    def add(ref_idx, conf, quads):
        """quads: list of 4 lists of (bq, baq, mq, sq)."""
        cases.append(dict(ref_idx=int(ref_idx), conf=conf,
                          quads=[[list(map(int, q)) for q in g]
                                 for g in quads]))

    def rand_quads(rng, n_per_nt4, bq_lo=2, bq_hi=41, baq_mode="normal",
                   mq_mode="normal", sq_mode="absent"):
        groups = []
        for n in n_per_nt4:
            g = []
            for _ in range(n):
                bq = int(rng.integers(bq_lo, bq_hi + 1))
                if rng.random() < 0.05:
                    bq = 2
                if rng.random() < 0.03:
                    bq = 93
                if baq_mode == "normal":
                    baq = int(rng.integers(0, 64))
                elif baq_mode == "missing":
                    baq = -1
                else:
                    baq = int(rng.integers(-1, 94))
                if mq_mode == "normal":
                    mq = int(rng.integers(0, 61))
                    if rng.random() < 0.05:
                        mq = 255
                    if rng.random() < 0.05:
                        mq = 0
                else:
                    mq = -1
                if sq_mode == "absent":
                    sq = -1
                else:
                    sq = int(rng.integers(-1, 94))
                g.append((bq, baq, mq, sq))
            groups.append(g)
        return groups

    base_conf = dict(min_bq=6, min_alt_bq=6, def_alt_bq=0, min_jq=0,
                     min_alt_jq=0, def_alt_jq=0,
                     flag=FLAG_BAQ | FLAG_MQ, bonf=3, sig=0.01)

    # default-flag randomized columns across depth/alt-count regimes
    for depth in (10, 40, 150, 600, 2000):
        for trial in range(4):
            ref = int(rng.integers(0, 4))
            n_alt = [0, 0, 0, 0]
            n_alt[ref] = depth
            n_altbases = int(rng.integers(0, 4))
            for _ in range(n_altbases):
                b = int(rng.integers(0, 4))
                if b == ref:
                    continue
                k = int(rng.integers(1, max(2, depth // 10)))
                n_alt[b] += k
                n_alt[ref] = max(0, n_alt[ref] - k)
            conf = dict(base_conf)
            conf["bonf"] = int(rng.choice([1, 3, 300, 30000, 10**7]))
            conf["sig"] = float(rng.choice([0.01, 0.05, 1.0]))
            add(ref, conf, rand_quads(rng, n_alt))

    # every flag combination on a mid-depth column
    for flag in range(8):
        ref = 1
        n = [5, 60, 3, 0]
        conf = dict(base_conf, flag=flag)
        add(ref, conf, rand_quads(rng, n, sq_mode="present",
                                  baq_mode="mixed"))

    # def_alt_bq modes: -1 (ref median), 0 (keep), >0 (overwrite)
    for dab in (-1, 0, 17, 30):
        ref = 2
        n = [4, 0, 80, 2]
        conf = dict(base_conf, def_alt_bq=dab)
        add(ref, conf, rand_quads(rng, n))
    # -1 median with NO ref bases left (avg_ref_bq stays -1)
    conf = dict(base_conf, def_alt_bq=-1)
    add(0, conf, rand_quads(rng, [0, 6, 3, 0]))

    # jq thresholds + def_alt_jq overwrite
    for mjq, majq, dajq in ((13, 0, 0), (0, 20, 0), (0, 0, 25),
                            (10, 15, 20)):
        conf = dict(base_conf, min_jq=mjq, min_alt_jq=majq, def_alt_jq=dajq)
        add(3, conf, rand_quads(rng, [2, 5, 1, 70], sq_mode="present",
                                baq_mode="mixed",
                                ))

    # bq filter edges: min_bq/min_alt_bq interplay incl. all-filtered
    for mbq, mabq in ((6, 6), (20, 25), (0, 0), (40, 45)):
        conf = dict(base_conf, min_bq=mbq, min_alt_bq=mabq)
        add(0, conf, rand_quads(rng, [50, 4, 2, 0], bq_lo=2, bq_hi=41))

    # q2-dominated column (Illumina low-qual tail)
    g = rand_quads(rng, [90, 8, 0, 0], bq_lo=2, bq_hi=2)
    add(0, dict(base_conf), g)
    # q93-saturated high conf
    g = rand_quads(rng, [200, 5, 0, 0], bq_lo=93, bq_hi=93)
    add(0, dict(base_conf), g)
    # no alt bases at all (NOALT path: pvalues stay LDBL_MAX)
    add(1, dict(base_conf), rand_quads(rng, [0, 30, 0, 0]))
    # single read
    add(2, dict(base_conf), rand_quads(rng, [0, 0, 1, 0]))
    # ref==alt-free deep column with huge bonf (nothing significant)
    conf = dict(base_conf, bonf=10**9)
    add(3, conf, rand_quads(rng, [10, 10, 10, 1500]))

    # fuzz: fully random confs and columns
    for _ in range(40):
        ref = int(rng.integers(0, 4))
        n = [int(rng.integers(0, 60)) for _ in range(4)]
        n[ref] += int(rng.integers(0, 300))
        conf = dict(
            min_bq=int(rng.integers(0, 20)),
            min_alt_bq=int(rng.integers(0, 25)),
            def_alt_bq=int(rng.choice([-1, 0, 0, 13, 27])),
            min_jq=int(rng.choice([0, 0, 8, 15])),
            min_alt_jq=int(rng.choice([0, 0, 10, 18])),
            def_alt_jq=int(rng.choice([0, 0, 0, 22])),
            flag=int(rng.integers(0, 8)),
            bonf=int(rng.choice([1, 3, 666, 123456, 10**8])),
            sig=float(rng.choice([0.001, 0.01, 0.05, 0.5])),
        )
        add(ref, conf, rand_quads(rng, n, sq_mode="present",
                                  baq_mode="mixed"))

    # fuzz (round 3): very deep columns (the screening + bonf regimes the
    # end-to-end bench runs at), MQ0-dominated pools (the 0.5 errprob
    # special), borderline-significance bonf ladders, and columns where
    # every alt survives/dies on the min_alt_bq knife edge
    for _ in range(40):
        ref = int(rng.integers(0, 4))
        kind = rng.random()
        if kind < 0.35:
            n = [0, 0, 0, 0]
            n[ref] = int(rng.integers(800, 3000))
            for b in range(4):
                if b != ref and rng.random() < 0.7:
                    n[b] = int(rng.integers(1, 25))
        elif kind < 0.6:
            n = [int(rng.integers(0, 30)) for _ in range(4)]
            n[ref] += int(rng.integers(50, 400))
        else:
            n = [int(rng.integers(1, 8)) for _ in range(4)]
        conf = dict(
            min_bq=int(rng.choice([0, 6, 6, 13])),
            min_alt_bq=int(rng.choice([0, 6, 18, 30])),
            def_alt_bq=int(rng.choice([-1, 0, 0, 40])),
            min_jq=int(rng.choice([0, 0, 12])),
            min_alt_jq=int(rng.choice([0, 0, 16])),
            def_alt_jq=int(rng.choice([0, 0, 30])),
            flag=int(rng.integers(0, 8)),
            bonf=int(rng.choice([1, 3, 3333, 10**6, 6 * 10**6, 10**10])),
            sig=float(rng.choice([0.0001, 0.01, 0.05])),
        )
        mq_dom = rng.random() < 0.3
        g = rand_quads(rng, n, sq_mode="present", baq_mode="mixed")
        if mq_dom:                      # MQ0 floors err prob at 0.5
            g = [[(bq, baq, 0 if rng.random() < 0.8 else mq, sq)
                  for (bq, baq, mq, sq) in grp] for grp in g]
        add(ref, conf, g)
    return cases


def emit_input(cases):
    for c in cases:
        conf = c["conf"]
        head = [c["ref_idx"], conf["min_bq"], conf["min_alt_bq"],
                conf["def_alt_bq"], conf["min_jq"], conf["min_alt_jq"],
                conf["def_alt_jq"], conf["flag"], conf["bonf"], conf["sig"]]
        counts = [len(g) for g in c["quads"]]
        flat = [str(v) for g in c["quads"] for q in g for v in q]
        print(" ".join(str(x) for x in head + counts + flat))


def pack(golden_file, out_file):
    cases = make_cases()
    with open(golden_file) as fh:
        lines = [l.split() for l in fh if l.strip()]
    assert len(lines) == len(cases), (len(lines), len(cases))
    for c, parts in zip(cases, lines):
        c["num_err_probs"] = int(parts[0])
        c["alt_counts"] = [int(x) for x in parts[1:4]]
        c["alt_raw_counts"] = [int(x) for x in parts[4:7]]
        c["xor_hash"] = parts[7]
        c["pvalues"] = parts[8:11]
    with open(out_file, "w") as fh:
        json.dump(cases, fh, indent=1)
    print(f"wrote {out_file} ({len(cases)} cases)")


if __name__ == "__main__":
    if "--emit-input" in sys.argv:
        emit_input(make_cases())
    elif "--pack" in sys.argv:
        i = sys.argv.index("--pack")
        pack(*sys.argv[i + 1 : i + 3])
    else:
        sys.exit("usage: gen_call_snvs_cases.py --emit-input | "
                 "--pack golden out")
