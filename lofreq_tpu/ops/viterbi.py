"""Viterbi realignment of reads with indels (`lofreq viterbi` equivalent).

ctypes bridge to csrc/realign.c plus the read-level driver logic of
lofreq_viterbi.c:107-345: extract softclip-free query + quals, replace Q2
quals by the read median, realign against a +-RWIN reference window, rebuild
the cigar (re-attaching soft clips) and shift the position if needed.
"""

from __future__ import annotations

import ctypes
import threading

import numpy as np

from ..io.bam import (
    CDEL,
    CDIFF,
    CEQUAL,
    CHARD_CLIP,
    CINS,
    CMATCH,
    CSOFT_CLIP,
    FUNMAP,
)

from .._native_build import get_native_lib

RWIN = 10

_lock = threading.Lock()
_lib = None


def _get_lib():
    global _lib
    with _lock:
        if _lib is None:
            lib = get_native_lib()
            lib.lfq_viterbi_one.argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
                ctypes.c_int, ctypes.c_char_p,
            ]
            lib.lfq_viterbi_one.restype = ctypes.c_int
            _lib = lib
    return _lib


def viterbi_align(ref_win: bytes, query: bytes, bqual_sanger: bytes,
                  q2default: int):
    """Returns (shift, aln_state_string)."""
    lib = _get_lib()
    buf = ctypes.create_string_buffer(len(query) + len(ref_win) + 4)
    shift = lib.lfq_viterbi_one(ref_win, query, bqual_sanger,
                                int(q2default), buf)
    return shift, buf.value.decode()


_OPMAP = {"M": CMATCH, "I": CINS, "D": CDEL}


def realign_read(r, ref: bytes, q2default: int = -1):
    """Realign one read in place.  Returns True if the read was modified
    (or examined); False if passed through untouched (no indels/hardclip)."""
    if r.flag & FUNMAP:
        return False
    query = []
    bqual = []
    x = r.pos
    indels = 0
    for op, l in r.cigar_ops():
        if op in (CMATCH, CEQUAL, CDIFF):
            pass
        elif op == CHARD_CLIP:
            return False
        elif op == CDEL:
            indels += 1
        elif op == CINS:
            indels += 1
        elif op == CSOFT_CLIP:
            pass
        else:
            return False
    if indels == 0:
        return False
    y = 0
    for op, l in r.cigar_ops():
        if op in (CMATCH, CEQUAL, CDIFF, CINS):
            query.append(r.seq[y : y + l])
            bqual.append((np.asarray(r.qual[y : y + l]) + 33)
                         .astype(np.uint8).tobytes())
            y += l
            if op != CINS:
                x += l
        elif op == CSOFT_CLIP:
            y += l
        elif op == CDEL:
            x += l
    query = b"".join(query)
    bqual = b"".join(bqual)

    phreds = np.frombuffer(bqual, dtype=np.uint8).astype(np.int64) - 33
    non_q2 = phreds[phreds != 2]
    if len(non_q2) == 0:
        return False  # all Q2: write as-is (lofreq_viterbi.c:220-242)
    q2d = q2default
    if q2d < 0:
        vals = np.sort(non_q2)
        n = len(vals)
        if n % 2 == 0:
            q2d = int((vals[n // 2] + vals[n // 2 - 1]) / 2.0)
        else:
            q2d = int(vals[n // 2])

    lower = max(r.pos - RWIN, 0)
    upper = min(x + RWIN, len(ref))
    ref_win = ref[lower:upper]

    shift, aln = viterbi_align(ref_win, query, bqual, q2d)
    if not aln:
        return False

    new_cigar = []
    ops = r.cigar_ops()
    if ops and ops[0][0] == CSOFT_CLIP:
        new_cigar.append((ops[0][1] << 4) | CSOFT_CLIP)
    cur = _OPMAP[aln[0]]
    cnt = 1
    for ch in aln[1:]:
        op = _OPMAP[ch]
        if op != cur:
            new_cigar.append((cnt << 4) | cur)
            cur = op
            cnt = 1
        else:
            cnt += 1
    new_cigar.append((cnt << 4) | cur)
    if len(ops) > 1 and ops[-1][0] == CSOFT_CLIP:
        new_cigar.append((ops[-1][1] << 4) | CSOFT_CLIP)

    if shift - (r.pos - lower) != 0:
        r.pos = r.pos + (shift - (r.pos - lower))
    r.cigar = np.array(new_cigar, dtype=np.uint32)
    return True


def run_viterbi(bam_in, bam_out, ref_path, q2default: int = -1,
                del_flags: bool = True):
    """`lofreq viterbi` over a whole BAM (output order = input order,
    likely unsorted afterwards, as in the reference).

    Raw fast path: only reads with indels are decoded and realigned
    (lofreq_viterbi.c:188-219 skips the rest anyway); everything else is
    streamed through as raw record bytes with at most an aux-tag splice
    for the NM/MC/MD/AS removal — no per-read decode/re-encode."""
    from ..io import bam as bamio
    from ..io.bam import BamReader, BamWriter, decode_record
    from ..io.fasta import Fasta

    strip = {b"NM", b"MC", b"MD", b"AS"} if del_flags else None
    fa = Fasta(ref_path)
    rdr = BamReader(bam_in)
    wtr = BamWriter(bam_out, rdr.header)
    ref_cache = {}
    n_realigned = 0
    for raw in rdr.iter_raw():
        if strip:
            raw = bamio.raw_strip_tags(raw, strip)
        f = bamio.raw_fields(raw)
        tid, flag, n_cigar = f[0], f[6], f[5]
        if not (flag & FUNMAP) and tid >= 0 and n_cigar:
            # cigar op = low nibble of each u32's first byte; n_cigar is
            # tiny, so a bytes walk beats a numpy round-trip
            cig_off = 32 + f[2]
            has_indel = False
            for j in range(n_cigar):
                op = raw[cig_off + 4 * j] & 0xF
                if op == CINS or op == CDEL:
                    has_indel = True
                    break
            if has_indel:
                # indel read: full decode -> realign -> re-encode
                r = decode_record(raw)
                chrom = rdr.header.name(r.tid)
                if chrom not in ref_cache:
                    ref_cache[chrom] = fa.fetch(chrom)
                if realign_read(r, ref_cache[chrom], q2default):
                    n_realigned += 1
                wtr.write(r)
                continue
        wtr.write_raw(raw)
    wtr.close()
    rdr.close()
    return n_realigned
