"""`indelqual`: insert per-base indel qualities (BI/BD tags) into a BAM.

Two modes as in the reference (lofreq_indelqual.c):
  * uniform iq[,dq]: same value for every base
  * dindel: Illumina-specific qualities from the homopolymer-length lookup
    table DINDELQ ("!MMMLKEC@=<;:988776"), indexed by the run length at the
    next reference position (dindel_fetch_func, lofreq_indelqual.c:136-215).
"""

from __future__ import annotations

import numpy as np

from .. import defaults as D
from ..io.bam import (
    BamReader,
    BamWriter,
    CDEL,
    CDIFF,
    CEQUAL,
    CHARD_CLIP,
    CINS,
    CMATCH,
    CSOFT_CLIP,
    FDUP,
    FQCFAIL,
    FSECONDARY,
    FUNMAP,
    read_sam,
    write_sam,
)

DINDELQ = "!MMMLKEC@=<;:988776"  # 1-based 18


def encode_q(q: int) -> str:
    return chr(33 if q < 33 else (126 if q > 126 else q))


def find_homopolymers(ref: bytes) -> np.ndarray:
    """hpcount[i] = run length at run starts, 1 elsewhere."""
    a = np.frombuffer(ref, dtype=np.uint8)
    L = len(a)
    if L == 0:
        return np.zeros(0, dtype=np.int64)
    change = np.nonzero(a[1:] != a[:-1])[0] + 1
    starts = np.concatenate([[0], change])
    lens = np.diff(np.concatenate([starts, [L]]))
    out = np.ones(L, dtype=np.int64)
    out[starts] = lens
    return out


def dindel_quals(read, hpcount: np.ndarray, rlen: int) -> str:
    """Per-base indel-quality string for one read."""
    out = []
    x = read.pos
    for op, l in read.cigar_ops():
        if op in (CMATCH, CEQUAL, CDIFF):
            for _ in range(l):
                if x > rlen - 2:
                    out.append(DINDELQ[0])
                else:
                    hp = hpcount[x + 1]
                    out.append(DINDELQ[0] if hp > 18 else DINDELQ[hp])
                x += 1
        elif op == CHARD_CLIP:
            pass
        elif op == CDEL:
            x += l
        elif op in (CINS, CSOFT_CLIP):
            out.extend(DINDELQ[0] * l)
        else:
            raise ValueError(f"unknown cigar op {op} in read {read.qname}")
    return "".join(out)


def run_indelqual(bam_in, bam_out, uniform=None, dindel=False, ref_path=None):
    """uniform: (iq, dq) ints, or dindel=True with ref_path."""
    rdr = BamReader(bam_in)
    wtr = BamWriter(bam_out, rdr.header)
    hp_cache = {}
    fa = None
    if dindel:
        from ..io.fasta import Fasta

        fa = Fasta(ref_path)
    count = 0
    for r in rdr:
        count += 1
        if uniform is not None:
            iq, dq = uniform
            iq_s = encode_q(iq + 33) * r.l_qseq
            dq_s = encode_q(dq + 33) * r.l_qseq
            r.del_tag(D.BI_TAG)
            r.set_tag(D.BI_TAG, "Z", iq_s)
            r.del_tag(D.BD_TAG)
            r.set_tag(D.BD_TAG, "Z", dq_s)
        else:
            if r.flag & (FUNMAP | FSECONDARY | FQCFAIL | FDUP):
                wtr.write(r)
                continue
            chrom = rdr.header.name(r.tid)
            if chrom not in hp_cache:
                ref = fa.fetch(chrom)
                hp_cache[chrom] = (find_homopolymers(ref), len(ref))
            hp, rlen = hp_cache[chrom]
            q = dindel_quals(r, hp, rlen)
            r.del_tag(D.BI_TAG)
            r.set_tag(D.BI_TAG, "Z", q)
            r.del_tag(D.BD_TAG)
            r.set_tag(D.BD_TAG, "Z", q)
        wtr.write(r)
    wtr.close()
    rdr.close()
    return count


def run_alnqual(bam_in, bam_out, ref_path, baq=True, ext_baq=True, idaq=True,
                redo_baq=False, redo_idaq=False):
    """`alnqual`: attach lb/ai/ad tags (lofreq_alnqual.c)."""
    from ..io.fasta import Fasta
    from ..ops.baq import add_alnqual_tags

    fa = Fasta(ref_path)
    rdr = BamReader(bam_in)
    wtr = BamWriter(bam_out, rdr.header)
    chunk = []
    chunk_tid = None

    def flush():
        if not chunk:
            return
        ref = fa.fetch(rdr.header.name(chunk_tid))
        add_alnqual_tags(chunk, ref, baq=baq, ext_baq=ext_baq, idaq=idaq,
                         redo_baq=redo_baq, redo_idaq=redo_idaq)
        for r in chunk:
            wtr.write(r)
        chunk.clear()

    for r in rdr:
        if r.is_unmapped or r.tid < 0:
            flush()
            wtr.write(r)
            continue
        if chunk_tid is not None and r.tid != chunk_tid:
            flush()
        chunk_tid = r.tid
        chunk.append(r)
        if len(chunk) >= 2000:
            flush()
    flush()
    wtr.close()
    rdr.close()
