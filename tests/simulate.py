"""Read simulator for end-to-end tests: the stand-in for the reference's
denv2/ecoli datasets (which live outside its repo, tests/run_all.sh:9-12).

Generates a random genome, plants SNVs/indels at known allele frequencies,
samples reads with a per-base quality error model, and writes
coordinate-sorted BAM + FASTA + truth VCF.
"""

from __future__ import annotations

import numpy as np

from lofreq_tpu.io.bai import build_bai
from lofreq_tpu.io.bam import BamHeader, BamRead, BamWriter, FPAIRED, FPROPER_PAIR, FREVERSE
from lofreq_tpu.io.fasta import write_fasta

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def simulate(
    tmpdir,
    genome_len=8000,
    depth=1000,
    read_len=100,
    snvs=((0.005, 4), (0.01, 6), (0.05, 6), (0.2, 6), (1.0, 4)),
    indels=(),
    qual_range=(28, 38),
    seed=7,
    chrom="sim1",
):
    """Returns dict with paths + truth list [(pos, ref, alt, af)]."""
    rng = np.random.default_rng(seed)
    genome = BASES[rng.integers(0, 4, genome_len)]

    # plant variants at well-separated positions away from edges
    margin = read_len + 10
    n_vars = sum(n for _af, n in snvs) + sum(n for _af, n, _l, _k in indels)
    cand = rng.permutation(np.arange(margin, genome_len - margin))
    positions = []
    taken = np.zeros(genome_len, dtype=bool)
    for p in cand:
        if len(positions) == n_vars:
            break
        if not taken[max(0, p - 20) : p + 20].any():
            positions.append(int(p))
            taken[p] = True
    positions = sorted(positions)
    rng.shuffle(positions)

    truth = []
    snv_spec = []  # (pos, alt_code, af)
    idx = 0
    for af, count in snvs:
        for _ in range(count):
            pos = positions[idx]
            idx += 1
            ref_b = genome[pos]
            alt_b = ref_b
            while alt_b == ref_b:
                alt_b = BASES[rng.integers(0, 4)]
            snv_spec.append((pos, alt_b, af))
            truth.append((pos, chr(ref_b), chr(alt_b), af, "snv"))
    indel_spec = []  # (pos, kind, seq, af)
    for af, count, length, kind in indels:
        for _ in range(count):
            pos = positions[idx]
            idx += 1
            if kind == "ins":
                seq = BASES[rng.integers(0, 4, length)].tobytes().decode()
                indel_spec.append((pos, "ins", seq, af))
                truth.append((pos, chr(genome[pos]),
                              chr(genome[pos]) + seq, af, "ins"))
            else:
                seq = genome[pos + 1 : pos + 1 + length].tobytes().decode()
                indel_spec.append((pos, "del", seq, af))
                truth.append((pos, chr(genome[pos]) + seq,
                              chr(genome[pos]), af, "del"))

    n_reads = int(genome_len * depth / read_len)
    header = BamHeader("@HD\tVN:1.6\tSO:coordinate\n", [(chrom, genome_len)])
    starts = np.sort(rng.integers(0, genome_len - read_len, n_reads))
    qlo, qhi = qual_range

    reads = []
    for i, start in enumerate(starts):
        r = BamRead()
        r.qname = f"sim{i}"
        r.tid = 0
        r.flag = FREVERSE if rng.random() < 0.5 else 0
        r.mapq = 60
        base = genome[start : start + read_len].copy()
        cigar = f"{read_len}M"
        shift = 0
        # apply variants carried by this read
        for pos, alt_b, af in snv_spec:
            if start <= pos < start + read_len and rng.random() < af:
                base[pos - start] = alt_b
        ins_done = del_done = None
        for pos, kind, seq, af in indel_spec:
            if start <= pos < start + read_len - len(seq) - 2 \
                    and pos - start >= 1 and rng.random() < af:
                if kind == "ins" and ins_done is None:
                    ins_done = (pos - start, seq)
                elif kind == "del" and del_done is None:
                    del_done = (pos - start, len(seq))
        if ins_done is not None and del_done is None:
            at, seq = ins_done
            base = np.concatenate([
                base[: at + 1],
                np.frombuffer(seq.encode(), dtype=np.uint8),
                base[at + 1 : read_len - len(seq)],
            ])
            cigar = f"{at+1}M{len(seq)}I{read_len - len(seq) - at - 1}M"
        elif del_done is not None and ins_done is None:
            at, dl = del_done
            ext = genome[start + read_len : start + read_len + dl]
            base = np.concatenate([base[: at + 1], base[at + 1 + dl :], ext])
            base = base[:read_len]
            m2 = len(base) - (at + 1)
            cigar = f"{at+1}M{dl}D{m2}M"
        _ = shift
        qual = rng.integers(qlo, qhi + 1, len(base)).astype(np.uint8)
        # sequencing errors (cast first: -uint8 would wrap around!)
        errp = 10.0 ** (-qual.astype(np.float64) / 10.0)
        err = rng.random(len(base)) < errp
        for j in np.nonzero(err)[0]:
            b = base[j]
            while b == base[j]:
                b = BASES[rng.integers(0, 4)]
            base[j] = b
        r.pos = int(start)
        r.seq = base.tobytes()
        r.qual = qual
        r.set_cigar_string(cigar)
        reads.append(r)

    # realized alt counts per truth entry (sampling varies around AF)
    realized = []
    for pos, ref_s, alt_s, af, kind in truth:
        cnt = 0
        dp = 0
        if kind == "snv":
            alt_code = ord(alt_s)
            for r, start in zip(reads, starts):
                i = pos - r.pos
                if 0 <= i < len(r.seq) and len(r.cigar) == 1:
                    dp += 1
                    if r.seq[i] == alt_code:
                        cnt += 1
        realized.append((pos, ref_s, alt_s, af, kind, cnt, dp))
    truth = realized

    fa_path = f"{tmpdir}/ref.fa"
    bam_path = f"{tmpdir}/reads.bam"
    write_fasta(fa_path, {chrom: genome.tobytes().decode()})
    with BamWriter(bam_path, header) as w:
        for r in reads:
            w.write(r)
    build_bai(bam_path)
    return dict(fa=fa_path, bam=bam_path, truth=truth, chrom=chrom,
                genome=genome.tobytes())
