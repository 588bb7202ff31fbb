#!/usr/bin/env python3
"""Cases for the whole-subcommand `call` differential.

Each case is a fuzzed (reference FASTA, position-sorted read set,
argument set) triple.  The reads are expressed in the oracle's "minisam"
text format (see oracle_call_e2e.c); the same text is converted to a
real BAM on the framework side by the consuming test.

Coverage axes: SNVs across AFs (incl. consensus vars), ins/del events
(incl. poly-AT / homopolymer context for the hrun suppression), soft
clips, orphan/paired flags, MQ extremes (0/255/cap), Q2 bases,
secondary/dup/qcfail/unmapped reads, BI/BD presence/absence,
precomputed-lb + --del-baq redo, --call-indels/--only-indels, -B/-N/-e,
-s source qual (+ -S ign.vcf), BED masking, -r regions, fixed vs
dynamic Bonferroni, -a/-C/-q/-Q variations, --illumina-1.3,
--no-default-filter, and multi-chromosome inputs.

Usage:
  gen_call_e2e_cases.py --run <oracle_binary> <out.json>
"""

import json
import os
import subprocess
import sys
import tempfile

import numpy as np

BASES = "ACGT"


def mk_ref(rng, n, homopoly=False):
    seq = [str(rng.choice(list(BASES))) for _ in range(n)]
    if homopoly:
        # sprinkle homopolymer runs (poly-AT indel-suppression context)
        for _ in range(max(2, n // 150)):
            start = int(rng.integers(0, n - 12))
            base = str(rng.choice(list("AT")))
            ln = int(rng.integers(4, 10))
            for i in range(start, min(start + ln, n)):
                seq[i] = base
    return "".join(seq)


def qual_str(rng, n, q2_run=False):
    q = rng.integers(8, 41, n)
    if q2_run and n > 10:
        s = int(rng.integers(0, n - 5))
        q[s:s + int(rng.integers(2, 6))] = 2
    return "".join(chr(33 + int(v)) for v in q)


def mk_read(rng, name, chrom, ref, variants, opts):
    """One read: returns minisam line or None."""
    n = len(ref)
    rlen = int(rng.integers(40, min(81, n)))
    start = int(rng.integers(0, n - rlen))
    # build alignment walking the reference
    cig = []
    seq = []
    x = start
    remaining = rlen
    lead_clip = int(rng.integers(0, 9)) if rng.random() < 0.25 else 0
    tail_clip = int(rng.integers(0, 9)) if rng.random() < 0.25 else 0
    if lead_clip:
        cig.append((lead_clip, "S"))
        seq.append("".join(str(rng.choice(list(BASES)))
                           for _ in range(lead_clip)))
    while remaining > 0 and x < n:
        # choose next op
        did_indel = False
        if opts.get("indels") and remaining > 12 and rng.random() < 0.12 \
                and cig and cig[-1][1] == "M" and cig[-1][0] >= 5:
            if rng.random() < 0.5:  # insertion
                il = int(rng.integers(1, 4))
                ins = "".join(str(rng.choice(list(BASES)))
                              for _ in range(il))
                cig.append((il, "I"))
                seq.append(ins)
                remaining -= il
                did_indel = True
            else:  # deletion
                dl = int(rng.integers(1, 4))
                if x + dl < n:
                    cig.append((dl, "D"))
                    x += dl
                    did_indel = True
        if did_indel:
            continue
        ml = min(remaining, int(rng.integers(8, 40)), n - x)
        if ml <= 0:
            break
        # truncate the M chunk at a planted indel anchor so the indel
        # can actually be applied (it anchors at a chunk's last base)
        if opts.get("indels"):
            for q in range(x, x + ml - 1):
                v = variants.get(q)
                if v is not None and v["kind"] in ("ins", "del"):
                    ml = q - x + 1
                    break
        chunk = list(ref[x:x + ml])
        for i in range(ml):
            p = x + i
            v = variants.get(p)
            if v is not None and rng.random() < v["af"]:
                if v["kind"] == "snv":
                    chunk[i] = v["alt"]
            elif rng.random() < 0.002:  # background error
                chunk[i] = str(rng.choice(
                    [b for b in BASES if b != chunk[i]]))
        # planned indel variants: applied at the last base of an M chunk
        lastp = x + ml - 1
        v = variants.get(lastp)
        if (v is not None and v["kind"] in ("ins", "del")
                and opts.get("indels") and remaining - ml > 4
                and rng.random() < v["af"]):
            cig.append((ml, "M"))
            seq.append("".join(chunk))
            x += ml
            remaining -= ml
            if v["kind"] == "ins":
                cig.append((len(v["seq"]), "I"))
                seq.append(v["seq"])
                remaining -= len(v["seq"])
            else:
                dl = len(v["seq"])
                if x + dl < n:
                    cig.append((dl, "D"))
                    x += dl
            continue
        if cig and cig[-1][1] == "M":
            cig[-1] = (cig[-1][0] + ml, "M")
        else:
            cig.append((ml, "M"))
        seq.append("".join(chunk))
        x += ml
        remaining -= ml
    if not any(op == "M" for _l, op in cig):
        return None
    # strip trailing D (aligners never emit them)
    while cig and cig[-1][1] == "D":
        cig.pop()
    if tail_clip:
        cig.append((tail_clip, "S"))
        seq.append("".join(str(rng.choice(list(BASES)))
                           for _ in range(tail_clip)))
    seq_s = "".join(seq)
    cig_s = "".join(f"{l}{op}" for l, op in cig)
    q = qual_str(rng, len(seq_s), q2_run=rng.random() < 0.1)

    flag = 0
    if rng.random() < 0.5:
        flag |= 16  # reverse
    pairing = opts.get("pairing", "mixed")
    if pairing != "none" and rng.random() < 0.7:
        flag |= 1  # paired
        if rng.random() < (0.15 if pairing == "orphan_heavy" else 0.9):
            pass  # orphan: paired but not proper
        else:
            flag |= 2  # proper pair
    r = rng.random()
    if r < 0.02:
        flag |= 4  # unmapped -> filtered
    elif r < 0.04:
        flag |= 256  # secondary
    elif r < 0.06:
        flag |= 1024  # duplicate
    elif r < 0.07:
        flag |= 512  # qcfail
    mapq = int(rng.choice([0, 13, 20, 30, 44, 60, 254],
                          p=[.05, .1, .15, .2, .2, .25, .05]))
    tags = []
    if opts.get("bi_bd"):
        tags.append("BI:Z:" + "".join(
            chr(33 + int(v)) for v in rng.integers(15, 41, len(seq_s))))
        tags.append("BD:Z:" + "".join(
            chr(33 + int(v)) for v in rng.integers(15, 41, len(seq_s))))
    line = f"{name} {flag} {chrom} {start} {mapq} {cig_s} {seq_s} {q}"
    if tags:
        line += " " + " ".join(tags)
    return (chrom, start, line)


def mk_case(rng, idx, spec):
    nchrom = spec.get("nchrom", 1)
    chroms = []
    fa_lines = []
    for ci in range(nchrom):
        n = int(rng.integers(spec.get("min_len", 250),
                             spec.get("max_len", 700)))
        ref = mk_ref(rng, n, homopoly=spec.get("indels", False))
        name = f"c{ci + 1}"
        chroms.append((name, ref))
        fa_lines.append(f">{name}")
        for i in range(0, n, 70):
            fa_lines.append(ref[i:i + 70])
    # plant variants per chrom
    variants = {}
    for name, ref in chroms:
        v = {}
        nvar = int(rng.integers(2, 7))
        for _ in range(nvar):
            p = int(rng.integers(10, len(ref) - 10))
            af = float(rng.choice([0.03, 0.08, 0.2, 0.5, 0.95]))
            kind = "snv"
            if spec.get("indels") and rng.random() < 0.45:
                kind = "ins" if rng.random() < 0.5 else "del"
            if kind == "snv":
                alt = str(rng.choice([b for b in BASES if b != ref[p]]))
                v[p] = dict(kind=kind, af=af, alt=alt)
            elif kind == "ins":
                il = int(rng.integers(1, 4))
                # half the time duplicate the next ref base(s): hrun context
                if rng.random() < 0.5 and p + 1 + il <= len(ref):
                    seq = ref[p + 1:p + 1 + il]
                else:
                    seq = "".join(str(rng.choice(list(BASES)))
                                  for _ in range(il))
                v[p] = dict(kind=kind, af=af, seq=seq)
            else:
                dl = int(rng.integers(1, 4))
                if p + 1 + dl < len(ref):
                    v[p] = dict(kind=kind, af=af, seq=ref[p + 1:p + 1 + dl])
        variants[name] = v

    depth = spec.get("depth", 30)
    lines = []
    ridx = 0
    for name, ref in chroms:
        nreads = max(4, depth * len(ref) // 60)
        for _ in range(nreads):
            r = mk_read(rng, f"r{ridx}", name, ref, variants[name], spec)
            if r:
                lines.append(r)
                ridx += 1
    lines.sort(key=lambda t: (t[0], t[1]))
    minisam = "\n".join([f"@SQ {name} {len(ref)}" for name, ref in chroms]
                        + [l for _c, _p, l in lines]) + "\n"

    files = {"ref.fa": "\n".join(fa_lines) + "\n", "in.bam": minisam}
    args = list(spec["args"])
    if spec.get("bed"):
        ivs = []
        for name, ref in chroms:
            k = int(rng.integers(1, 4))
            for _ in range(k):
                b = int(rng.integers(0, max(1, len(ref) - 60)))
                e = b + int(rng.integers(30, 200))
                ivs.append(f"{name}\t{b}\t{min(e, len(ref))}")
            files["t.bed"] = "\n".join(ivs) + "\n"
        args += ["-l", "t.bed"]
    if spec.get("region"):
        name, ref = chroms[0]
        b = int(rng.integers(1, max(2, len(ref) // 2)))
        e = b + int(rng.integers(50, len(ref)))
        args += ["-r", f"{name}:{b}-{min(e, len(ref))}"]
    if spec.get("ign_vcf"):
        # known-variant list: mixture of planted and random positions
        rows = []
        for name, ref in chroms:
            ps = sorted(set(
                list(variants[name])[:2]
                + [int(rng.integers(0, len(ref))) for _ in range(3)]))
            for p in ps:
                alt = str(rng.choice([b for b in BASES if b != ref[p]]))
                rows.append(f"{name}\t{p + 1}\t.\t{ref[p]}\t{alt}\t.\t.\t.")
        files["ign.vcf"] = ("##fileformat=VCFv4.0\n#CHROM\tPOS\tID\tREF\t"
                            "ALT\tQUAL\tFILTER\tINFO\n"
                            + "\n".join(rows) + "\n")
        args += ["-S", "ign.vcf"]
    args += ["-f", "ref.fa", "-o", "out.vcf", "in.bam"]
    return dict(name=f"case{idx:03d}_{spec['tag']}", args=args,
                files=files)


def gen_cases():
    rng = np.random.default_rng(40404)
    specs = []

    def add(tag, n, **kw):
        for _ in range(n):
            specs.append(dict(tag=tag, **kw))

    # SNV-only default call (the workhorse)
    add("default", 8, args=[])
    # indel calling (reference best-practice config)
    add("indels", 8, args=["--call-indels"], indels=True, bi_bd=True)
    add("only_indels", 2, args=["--call-indels", "--only-indels"],
        indels=True, bi_bd=True)
    # indels without BI/BD tags (default-qual fallback + wo_idaq warning)
    add("indels_nobibd", 2, args=["--call-indels"], indels=True)
    # no BAQ / no MQ / no extended BAQ
    add("nobaq", 3, args=["-B"])
    add("nomq", 2, args=["-N"])
    add("nobaq_nomq", 2, args=["-B", "-N"])
    add("noextbaq", 2, args=["--no-ext-baq"])
    # source quality
    add("srcq", 3, args=["-s"])
    add("srcq_ign", 3, args=["-s"], ign_vcf=True)
    # region + BED masking
    add("region", 3, args=[], region=True)
    add("bed", 3, args=[], bed=True)
    add("region_bed", 2, args=[], region=True, bed=True, indels=True,
        bi_bd=True)
    # orphan handling
    add("use_orphan", 2, args=["--use-orphan"], pairing="orphan_heavy")
    add("orphans_off", 2, args=[], pairing="orphan_heavy")
    # bonferroni / significance / coverage knobs
    add("fixed_bonf", 2, args=["-b", "1000"])
    add("sig05", 2, args=["-a", "0.05"])
    add("sig001", 1, args=["-a", "0.001"])
    add("mincov", 2, args=["-C", "10"], depth=18)
    add("minbq", 2, args=["-q", "20", "-Q", "25"])
    add("defaltbq", 1, args=["-R", "30"])
    add("jq", 1, args=["-j", "10", "-J", "10"])
    add("illumina13", 1, args=["--illumina-1.3"])
    add("nodefault", 2, args=["--no-default-filter"])
    add("nodefault_fixed", 1, args=["--no-default-filter", "-b", "500"])
    add("maxmq", 1, args=["-M", "40"])
    add("minmq", 1, args=["-m", "20"])
    # multi-chromosome (ref re-fetch path)
    add("multichrom", 3, args=[], nchrom=3, max_len=700)
    add("multichrom_indels", 2, args=["--call-indels"], nchrom=2,
        indels=True, bi_bd=True, max_len=700)
    # deep column
    add("deep", 1, args=[], depth=150, min_len=200, max_len=300)

    rng_cases = []
    for i, spec in enumerate(specs):
        rng_cases.append(mk_case(rng, i, spec))
    return rng_cases


def run_oracle(oracle, case):
    with tempfile.TemporaryDirectory() as td:
        for fn, content in case["files"].items():
            with open(os.path.join(td, fn), "w") as fh:
                fh.write(content)
        p = subprocess.run([oracle] + case["args"], cwd=td,
                           capture_output=True, text=True, timeout=600)
        if p.returncode != 0:
            sys.stderr.write(p.stderr)
            raise SystemExit(f"oracle failed on {case['name']} "
                             f"(rc={p.returncode})")
        with open(os.path.join(td, "out.vcf")) as fh:
            vcf = fh.read()
        counts = [None, None]
        for line in p.stderr.splitlines():
            if "substitution tests performed" in line:
                counts[0] = int(line.rsplit(":", 1)[1])
            elif "indel tests performed" in line:
                counts[1] = int(line.rsplit(":", 1)[1])
        return vcf, counts


def main():
    assert sys.argv[1] == "--run"
    oracle, out_json = sys.argv[2], sys.argv[3]
    cases = gen_cases()
    packed = []
    nvars = 0
    for case in cases:
        vcf, counts = run_oracle(oracle, case)
        nvars += sum(1 for l in vcf.splitlines() if not l.startswith("#"))
        packed.append(dict(**case, expected_vcf=vcf,
                           expected_counts=counts))
    with open(out_json, "w") as fh:
        json.dump(packed, fh)
    print(f"wrote {out_json}: {len(packed)} cases, {nvars} variant rows")


if __name__ == "__main__":
    main()
