#!/usr/bin/env python3
"""Generate Viterbi realignment golden file from the reference."""

import json
import os
import subprocess
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference/src/lofreq"


def build(tmp):
    exe = os.path.join(tmp, "oracle_viterbi")
    subprocess.run(
        ["gcc", "-std=gnu99", "-O2", "-o", exe,
         os.path.join(HERE, "oracle_viterbi.c"),
         os.path.join(REF, "viterbi.c"), os.path.join(REF, "utils.c"),
         os.path.join(REF, "log.c"),
         "-I" + REF, "-I/root/reference/src/uthash", "-lm"],
        check=True,
    )
    return exe


def make_cases():
    rng = np.random.default_rng(99)
    cases = []

    def add(ref, query, quals=None, q2def=20):
        if quals is None:
            quals = rng.integers(15, 40, len(query))
        bq = "".join(chr(int(q) + 33) for q in quals)
        cases.append(dict(ref=ref, query=query, bqual=bq, q2def=q2def))

    # the reference's own self-test (viterbi.c:336)
    add("CCATATGG", "CCATGG", quals=[30] * 6)
    # simple shifts / indels in random sequence
    for _ in range(25):
        L = int(rng.integers(40, 80))
        ref = "".join(rng.choice(list("ACGT"), L + 20))
        q = list(ref[10 : 10 + L])
        r = rng.random()
        if r < 0.4:  # deletion in read
            at = int(rng.integers(5, L - 8))
            dl = int(rng.integers(1, 4))
            q = q[:at] + q[at + dl :]
        elif r < 0.8:  # insertion in read
            at = int(rng.integers(5, L - 8))
            il = int(rng.integers(1, 4))
            q = q[:at] + list(rng.choice(list("ACGT"), il)) + q[at:]
        else:  # mismatches only
            for _m in range(2):
                at = int(rng.integers(0, len(q)))
                q[at] = str(rng.choice(list("ACGT")))
        add(ref, "".join(q))
    # homopolymer region: misplaced indel should left-align
    add("AACCCCCCGGTT" + "ACGT" * 5, "AACCCCCGGTT" + "ACGT" * 5)
    add("AATTTTTTGG" + "GCTA" * 6, "AATTTTTTTGG" + "GCTA" * 6)
    # Q2 quals
    add("ACGTACGTACGTACGTACGT", "ACGTACGACGTACGTACGT",
        quals=[2] * 5 + [30] * 14, q2def=25)
    # fuzz sweep (round 2): multiple indels per read, long reads, q2
    # walls mixed with high quals, repeat-rich contexts, varied q2def
    for _ in range(40):
        L = int(rng.integers(50, 140))
        if rng.random() < 0.3:  # repeat-rich reference
            unit = "".join(rng.choice(list("ACGT"),
                                      int(rng.integers(1, 4))))
            ref = (unit * (L // len(unit) + 24))[: L + 24]
        else:
            ref = "".join(rng.choice(list("ACGT"), L + 24))
        q = list(ref[12 : 12 + L])
        for _ev in range(int(rng.integers(1, 4))):
            if len(q) < 20:
                break
            at = int(rng.integers(5, len(q) - 8))
            if rng.random() < 0.5:
                q = q[:at] + q[at + int(rng.integers(1, 5)):]
            else:
                q = q[:at] + list(rng.choice(list("ACGT"),
                                             int(rng.integers(1, 5)))) + q[at:]
        for _m in range(int(rng.integers(0, 4))):
            at = int(rng.integers(0, len(q)))
            q[at] = str(rng.choice(list("ACGT")))
        quals = rng.choice([2, 2, 17, 30, 40], len(q)).astype(int)
        add(ref, "".join(q), quals=list(quals),
            q2def=int(rng.choice([20, 25, 2])))
    # fuzz sweep (round 3): the traceback/left-align extremes the lane
    # kernels made observable — shifts reaching alignment position 0
    # (the left_align sentinel path), tiny reads, heavy repeat tracts
    # with large indels, all-q2 bodies, degenerate query~ref lengths
    for _ in range(40):
        r = rng.random()
        if r < 0.3:
            # indel at/near the first aligned base: shift walk hits col 0
            unit = "".join(rng.choice(list("ACGT"), 2))
            tract = unit * int(rng.integers(4, 9))
            tail = "".join(rng.choice(list("ACGT"), int(rng.integers(20, 50))))
            ref = tract + tail
            if rng.random() < 0.5:
                q = ref[len(unit):]              # deletion at the very start
            else:
                q = unit + ref                   # insertion at the very start
            q = q[: int(rng.integers(15, min(len(q), 60)))]
        elif r < 0.5:
            # tiny reads
            L = int(rng.integers(6, 15))
            ref = "".join(rng.choice(list("ACGT"), L + 12))
            q = ref[5 : 5 + L]
            if rng.random() < 0.6 and L > 8:
                at = int(rng.integers(2, L - 4))
                q = q[:at] + q[at + 1:]
        else:
            # long homopolymer with a large misplaced indel
            base = str(rng.choice(list("ACGT")))
            hp = base * int(rng.integers(8, 16))
            left = "".join(rng.choice(list("ACGT"), 15))
            right = "".join(rng.choice(list("ACGT"), 25))
            ref = left + hp + right
            dl = int(rng.integers(2, 6))
            cut = len(left) + int(rng.integers(0, len(hp) - dl))
            q = (ref[8:cut] + ref[cut + dl:])[:90]
        if len(q) < 5:
            continue
        if rng.random() < 0.3:
            quals = [2] * len(q)                 # all-q2 body
        else:
            quals = list(rng.choice([2, 20, 40, 60], len(q)).astype(int))
        add(ref, "".join(q) if not isinstance(q, str) else q,
            quals=quals, q2def=int(rng.choice([2, 18, 30])))
    return cases


def main():
    cases = make_cases()
    with tempfile.TemporaryDirectory() as tmp:
        exe = build(tmp)
        inp = "".join(f"{c['ref']}\t{c['query']}\t{c['bqual']}\t{c['q2def']}\n"
                      for c in cases)
        out = subprocess.run([exe], input=inp, capture_output=True, text=True,
                             check=True)
        lines = out.stdout.strip("\n").split("\n")
        assert len(lines) == len(cases)
        for c, line in zip(cases, lines):
            shift, aln = line.split("\t")
            c["shift"] = int(shift)
            c["aln"] = aln
    with open(os.path.join(HERE, "..", "golden", "viterbi.json"), "w") as fh:
        json.dump(cases, fh, indent=1)
    print(f"wrote {len(cases)} viterbi golden cases")


if __name__ == "__main__":
    main()
