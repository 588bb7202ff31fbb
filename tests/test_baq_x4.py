"""x4-vs-scalar bit-identity of the banded glocal HMM.

csrc/baq.c runs groups of four same-geometry reads through glocal_x4
(one read per SIMD lane); remainders take the scalar glocal.  Because
thread striping (and therefore grouping) varies, the two paths MUST be
bit-identical or results would depend on the thread count.  This fuzzes
the kernel pair directly over random geometries (including degenerate
bands, N bases, q0/q93 walls) and A/Bs the whole batch path via the
LOFREQ_BAQ_X4 switch.
"""

import ctypes
import os
import subprocess
import sys

import numpy as np
import pytest

from lofreq_tpu._native_build import get_native_lib

_u8 = ctypes.POINTER(ctypes.c_uint8)
_i32 = ctypes.POINTER(ctypes.c_int)
_f64 = ctypes.POINTER(ctypes.c_double)


def _lib():
    lib = get_native_lib()
    for name in ("lfq_glocal_dbg_pd", "lfq_glocal_x4_dbg",
                 "lfq_glocal_x8_dbg"):
        getattr(lib, name).argtypes = [
            _u8, ctypes.c_int, _u8, ctypes.c_int, _u8,
            ctypes.c_double, ctypes.c_double, ctypes.c_int,
            _i32, _u8, _f64, ctypes.c_int,
        ]
    return lib


def _ptr(a, typ):
    return a.ctypes.data_as(typ)


def _run_scalar(lib, rc, qc, iq, lq, lref, bw, pd_stride):
    state = np.full(lq, -7, dtype=np.int32)
    q = np.zeros(lq, dtype=np.uint8)
    pd = np.full((lq + 1) * pd_stride, 0.0)
    r = lib.lfq_glocal_dbg_pd(
        _ptr(rc, _u8), lref, _ptr(qc, _u8), lq, _ptr(iq, _u8),
        1e-5, 0.4, bw, _ptr(state, _i32), _ptr(q, _u8),
        _ptr(pd, _f64), pd_stride,
    )
    return r, state, q, pd


@pytest.mark.parametrize("lanes", [4, 8])
@pytest.mark.parametrize("seed", range(8))
def test_glocal_xw_bit_identical_fuzz(seed, lanes):
    lib = _lib()
    fn = (lib.lfq_glocal_x4_dbg if lanes == 4 else lib.lfq_glocal_x8_dbg)
    rng = np.random.default_rng(seed * 2 + lanes)
    for case in range(40):
        # geometry shared by the 4 lanes, incl. degenerate shapes
        lq = int(rng.integers(1, 180))
        delta = int(rng.integers(-4, 9))
        lref = max(1, lq + delta)
        bw = int(rng.choice([1, 2, 7, 7, 7, 13, 31]))
        bw_eff = min(max(lref, lq), bw)
        bw_eff = max(bw_eff, abs(lref - lq))
        pd_stride = (bw_eff * 2 + 1) * 3 + 6

        rc4 = rng.integers(0, 5, (lanes, lref)).astype(np.uint8)  # incl. N
        qc4 = rng.integers(0, 5, (lanes, lq)).astype(np.uint8)
        iq4 = rng.choice(
            np.array([0, 2, 3, 17, 30, 41, 93], dtype=np.uint8),
            (lanes, lq),
        )
        # make half the lanes realistic (query ~= ref diagonal)
        for lane in range(0, lanes, 2):
            n = min(lq, lref)
            qc4[lane, :n] = rc4[lane, :n]

        st4 = np.full(lanes * lq, -7, dtype=np.int32)
        q4 = np.zeros(lanes * lq, dtype=np.uint8)
        pd4 = np.zeros(lanes * (lq + 1) * pd_stride)
        r4 = fn(
            _ptr(np.ascontiguousarray(rc4), _u8), lref,
            _ptr(np.ascontiguousarray(qc4), _u8), lq,
            _ptr(np.ascontiguousarray(iq4), _u8),
            1e-5, 0.4, bw, _ptr(st4, _i32), _ptr(q4, _u8),
            _ptr(pd4, _f64), pd_stride,
        )
        for lane in range(lanes):
            rs, st, q, pd = _run_scalar(
                lib, np.ascontiguousarray(rc4[lane]),
                np.ascontiguousarray(qc4[lane]),
                np.ascontiguousarray(iq4[lane]), lq, lref, bw, pd_stride)
            assert rs == r4
            ctx = f"seed={seed} case={case} lane={lane} lq={lq} " \
                  f"lref={lref} bw={bw}"
            assert (st4[lane * lq:(lane + 1) * lq] == st).all(), ctx
            assert (q4[lane * lq:(lane + 1) * lq] == q).all(), ctx
            cells = (lq + 1) * pd_stride
            got = pd4[lane * cells:(lane + 1) * cells]
            # compare only in-band cells (out-of-band scratch cells are
            # never read by compute_idaq and may hold stale lane data)
            x = np.maximum(np.arange(1, lq + 1) - bw_eff, 0)
            for i in range(1, lq + 1):
                beg = max(1, i - bw_eff)
                end = min(lref, i + bw_eff)
                lo = (beg - x[i - 1] + 1) * 3
                hi = (end - x[i - 1] + 1) * 3 + 3
                row_a = got[i * pd_stride + lo:i * pd_stride + hi]
                row_b = pd[i * pd_stride + lo:i * pd_stride + hi]
                # bitwise equality: degenerate inputs (q=0 walls with a
                # zero row sum, as in the reference) legitimately produce
                # NaNs, which must still match bit-for-bit
                assert (row_a.view(np.int64) == row_b.view(np.int64)).all(), \
                    ctx + f" pd row {i}"


def test_batch_x4_switch_identical(tmp_path):
    """Whole lfq_baq_batch path: grouped-x4 vs forced-scalar, same bytes."""
    code = r"""
import numpy as np, os, sys, hashlib, ctypes
sys.path.insert(0, %(repo)r)
from lofreq_tpu.ops import baq_hmm as bh
lib = bh._get_lib()
rng = np.random.default_rng(5)
REFLEN = 40_000
ref = rng.choice(list(b"ACGT"), REFLEN).astype(np.uint8).tobytes()
N = 4000
pos_l, cig_list, cigar_start = [], [], [0]
seqs = bytearray(); quals_l = []
seq_start = [0]
refarr = np.frombuffer(ref, np.uint8)
for i in range(N):
    rl = int(rng.choice([60, 100, 100, 100, 151]))
    p = int(rng.integers(0, REFLEN - rl - 30))
    r = rng.random()
    if r < 0.7: cig = [(rl << 4) | 0]
    elif r < 0.8: cig = [((rl//2) << 4) | 0, (2 << 4) | 1, ((rl - rl//2 - 2) << 4) | 0]
    elif r < 0.9: cig = [((rl//2) << 4) | 0, (3 << 4) | 2, ((rl - rl//2) << 4) | 0]
    else: cig = [(5 << 4) | 4, ((rl - 5) << 4) | 0]
    pos_l.append(p); cig_list += cig; cigar_start.append(len(cig_list))
    s = refarr[p:p+rl].copy()
    mut = rng.random(rl) < 0.03
    s[mut] = rng.choice(list(b"ACGT"), int(mut.sum()))
    seqs += s.tobytes()
    quals_l.append(rng.integers(2, 41, rl).astype(np.uint8))
    seq_start.append(seq_start[-1] + rl)
pos = np.array(pos_l, np.int64)
cigars = np.array(cig_list, np.uint32)
cigar_start = np.array(cigar_start, np.int64)
seq_start = np.array(seq_start, np.int64)
quals = np.concatenate(quals_l)
want = np.ones(N, np.uint8)
total = seq_start[-1] + N
outs = [np.zeros(total, np.uint8) for _ in range(3)]
flags = np.zeros(N, np.uint8)
lib.lfq_baq_batch(ref, REFLEN, N,
    pos.ctypes.data_as(bh._i64), cigars.ctypes.data_as(bh._u32),
    cigar_start.ctypes.data_as(bh._i64), bytes(seqs),
    quals.ctypes.data_as(bh._u8), seq_start.ctypes.data_as(bh._i64),
    want.ctypes.data_as(bh._u8), want.ctypes.data_as(bh._u8),
    1, bh.PAR_D, bh.PAR_E,
    outs[0].ctypes.data_as(bh._u8), outs[1].ctypes.data_as(bh._u8),
    outs[2].ctypes.data_as(bh._u8), flags.ctypes.data_as(bh._u8))
h = hashlib.md5(b"".join(o.tobytes() for o in outs) + flags.tobytes())
print(h.hexdigest())
""" % {"repo": os.path.dirname(os.path.dirname(os.path.abspath(__file__)))}
    digests = {}
    for x4 in ("1", "0"):
        env = dict(os.environ, LOFREQ_BAQ_X4=x4, LOFREQ_NATIVE_THREADS="3")
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, check=True)
        digests[x4] = out.stdout.strip().splitlines()[-1]
    assert digests["1"] == digests["0"]
