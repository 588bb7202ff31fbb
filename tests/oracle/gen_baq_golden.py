#!/usr/bin/env python3
"""Generate BAQ/IDAQ golden file from the reference implementation."""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REF = "/root/reference/src/lofreq"


def build_oracle(tmp):
    exe = os.path.join(tmp, "oracle_baq")
    subprocess.run(
        ["gcc", "-std=gnu99", "-O2", "-o", exe,
         os.path.join(HERE, "oracle_baq.c"),
         os.path.join(REF, "bam_md_ext.c"),
         os.path.join(REF, "kprobaln_ext.c"),
         "-I" + os.path.join(HERE, "mini_hts"),
         "-I" + REF, "-I/root/reference/src/uthash", "-lm"],
        check=True,
    )
    return exe


def make_cases():
    rng = np.random.default_rng(42)
    genome = "".join(rng.choice(list("ACGT"), 3000))
    cases = []

    def read_from(pos, cigar_ops, mutate=(), quals=None):
        """Build (seq, cigar string) following ref with given ops."""
        seq = []
        x = pos
        cig = []
        for op, l in cigar_ops:
            cig.append(f"{l}{op}")
            if op in "M=X":
                seq.append(genome[x : x + l])
                x += l
            elif op == "I":
                seq.append("".join(rng.choice(list("ACGT"), l)))
            elif op == "D":
                x += l
            elif op == "S":
                seq.append("".join(rng.choice(list("ACGT"), l)))
        seq = list("".join(seq))
        for qpos, base in mutate:
            seq[qpos] = base
        seq = "".join(seq)
        if quals is None:
            quals = rng.integers(10, 41, len(seq))
        qual_s = "".join(chr(q + 33) for q in quals)
        return seq, "".join(cig), qual_s

    def add(pos, ops, mutate=(), ext=1):
        seq, cig, qual = read_from(pos, ops, mutate)
        cases.append(dict(pos=pos, cigar=cig, seq=seq, qual=qual, ext=ext))

    # perfect matches
    add(100, [("M", 50)])
    add(200, [("M", 100)], ext=1)
    add(200, [("M", 100)], ext=0)
    # mismatches
    add(300, [("M", 75)], mutate=[(10, "A"), (40, "T")])
    # insertion / deletion reads
    add(400, [("M", 30), ("I", 2), ("M", 40)])
    add(500, [("M", 25), ("D", 3), ("M", 45)])
    add(600, [("M", 20), ("I", 1), ("M", 20), ("D", 2), ("M", 30)])
    # soft clips
    add(700, [("S", 5), ("M", 60), ("S", 4)])
    add(800, [("S", 10), ("M", 30), ("I", 3), ("M", 35)])
    # homopolymer region: engineer repeats then indel inside
    add(900, [("M", 10), ("D", 1), ("M", 50)])
    add(1000, [("M", 40), ("I", 4), ("M", 20)])
    # long indels
    add(1100, [("M", 30), ("D", 17), ("M", 30)])  # >16: idaq skip path
    add(1200, [("M", 30), ("I", 17), ("M", 30)])
    # read near contig end
    add(2960, [("M", 35)])
    # low quals incl q2
    seq, cig, _ = read_from(1400, [("M", 60)])
    qual = "".join(chr(int(q) + 33) for q in
                   np.clip(np.r_[np.full(5, 2), np.arange(10, 65)], 2, 60))
    cases.append(dict(pos=1400, cigar=cig, seq=seq, qual=qual, ext=1))
    # many random reads
    for _ in range(30):
        pos = int(rng.integers(0, 2500))
        ops = [("M", int(rng.integers(20, 60)))]
        if rng.random() < 0.5:
            ops += [("I" if rng.random() < 0.5 else "D",
                     int(rng.integers(1, 5))),
                    ("M", int(rng.integers(10, 40)))]
        nmut = int(rng.integers(0, 3))
        qlen = sum(l for op, l in ops if op in "MIS")
        mutate = [(int(rng.integers(0, qlen)), str(rng.choice(list("ACGT"))))
                  for _ in range(nmut)]
        add(pos, ops, mutate)
    # fuzz sweep (round 2): multi-op cigars with clips on both ends,
    # adjacent/mixed indels, long reads, extreme quals, both ext modes
    for _ in range(40):
        pos = int(rng.integers(0, 2200))
        ops = []
        if rng.random() < 0.4:
            ops.append(("S", int(rng.integers(1, 12))))
        ops.append(("M", int(rng.integers(15, 120))))
        for _k in range(int(rng.integers(0, 3))):
            ops.append(("I" if rng.random() < 0.5 else "D",
                        int(rng.integers(1, 8))))
            ops.append(("M", int(rng.integers(5, 50))))
        if rng.random() < 0.4:
            ops.append(("S", int(rng.integers(1, 8))))
        qlen = sum(l for op, l in ops if op in "MIS")
        nmut = int(rng.integers(0, 5))
        mutate = [(int(rng.integers(0, qlen)), str(rng.choice(list("ACGT"))))
                  for _ in range(nmut)]
        seq, cig, _ = read_from(pos, ops, mutate)
        if rng.random() < 0.3:  # extreme qual profiles incl q2/q60 walls
            q = rng.choice([2, 5, 20, 40, 60], qlen,
                           p=[0.2, 0.2, 0.2, 0.2, 0.2])
        else:
            q = rng.integers(2, 61, qlen)
        qual = "".join(chr(int(x) + 33) for x in q)
        cases.append(dict(pos=pos, cigar=cig, seq=seq, qual=qual,
                          ext=int(rng.random() < 0.7)))
    # fuzz sweep (round 3): the band-geometry extremes — contig-start
    # window clips (xb -> 0), contig-end overhangs (xe -> ref_len), wide
    # bands from 6-20bp indels (incl. the >16 idaq-skip wall), reads over
    # the N patch, adjacent ins+del, and q93 quality caps
    genome = genome[:2600] + "N" * 30 + genome[2630:]
    for _ in range(50):
        r = rng.random()
        if r < 0.2:
            pos = int(rng.integers(0, 6))           # window clips at 0
        elif r < 0.4:
            pos = int(rng.integers(2550, 2640))     # spans the N patch
        elif r < 0.6:
            pos = int(rng.integers(2900, 2985))     # hangs off the end
        else:
            pos = int(rng.integers(0, 2500))
        ops = [("M", int(rng.integers(10, 70)))]
        kind = rng.random()
        if kind < 0.35:
            ops += [("I" if rng.random() < 0.5 else "D",
                     int(rng.integers(6, 21))),
                    ("M", int(rng.integers(10, 40)))]
        elif kind < 0.6:                            # adjacent ins + del
            ops += [("I", int(rng.integers(1, 6))),
                    ("D", int(rng.integers(1, 6))),
                    ("M", int(rng.integers(10, 40)))]
        # clamp the ops to the contig (a valid alignment never extends
        # past the reference end; the window clip xe->ref_len is still
        # exercised by reads ENDING within bw/2 of the contig end)
        span = sum(l for op, l in ops if op in "MD")
        if pos + span > 2999:
            over = pos + span - 2999
            op_l, l_l = ops[-1]
            if op_l != "M" or l_l - over < 5:
                continue
            ops[-1] = ("M", l_l - over)
        seq, cig, _ = read_from(pos, ops)
        qlen = len(seq)
        if qlen < 5:
            continue
        nmut = int(rng.integers(0, 4))
        seq = list(seq)
        for _m in range(nmut):
            seq[int(rng.integers(0, qlen))] = str(rng.choice(list("ACGTN")))
        seq = "".join(seq)
        if rng.random() < 0.4:                      # q93 walls
            q = rng.choice([2, 30, 93], qlen, p=[0.25, 0.4, 0.35])
        else:
            q = rng.integers(2, 94, qlen)
        qual = "".join(chr(int(x) + 33) for x in q)
        cases.append(dict(pos=pos, cigar=cig, seq=seq, qual=qual,
                          ext=int(rng.random() < 0.7)))
    return genome, cases


def main():
    genome, cases = make_cases()
    with tempfile.TemporaryDirectory() as tmp:
        exe = build_oracle(tmp)
        inp = "".join(
            f"{genome}\t{c['pos']}\t{c['cigar']}\t{c['seq']}\t{c['qual']}\t{c['ext']}\n"
            for c in cases
        )
        out = subprocess.run([exe], input=inp, capture_output=True,
                             text=True, check=True)
        lines = out.stdout.strip("\n").split("\n")
        assert len(lines) == len(cases), (len(lines), len(cases))
        for c, line in zip(cases, lines):
            lb, ai, ad = line.split("\t")
            c["lb"] = lb
            c["ai"] = ai
            c["ad"] = ad
    with open(os.path.join(HERE, "..", "golden", "baq.json"), "w") as fh:
        json.dump({"genome": genome, "cases": cases}, fh, indent=1)
    print(f"wrote {len(cases)} baq golden cases")


if __name__ == "__main__":
    sys.exit(main())
