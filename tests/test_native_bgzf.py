"""Native multithreaded BGZF inflater (csrc/bgzf.c) vs the Python reader.

The native path must be byte-identical to BgzfReader over every access
pattern raw_records_for_region uses: whole-stream from a virtual offset,
and [vbeg, vend) chunk ranges with arbitrary within-block uoffsets.
"""

import os
import struct

import numpy as np
import pytest

from lofreq_tpu.io.bgzf import (
    BgzfReader,
    BgzfWriter,
    native_extract_voffsets,
)


@pytest.fixture(scope="module")
def bgzf_file(tmp_path_factory):
    """A multi-block BGZF file with known payload + its block voffsets."""
    rng = np.random.default_rng(11)
    path = tmp_path_factory.mktemp("bgzf") / "t.bgzf"
    payload = rng.integers(0, 256, size=300_000, dtype=np.uint8).tobytes()
    with BgzfWriter(str(path)) as w:
        # uneven writes -> uneven block boundaries
        off = 0
        for n in (1, 37, 65_000, 70_000, 64_000, 100_000, 962):
            w.write(payload[off:off + n])
            w.flush_block()
            off += n
        w.write(payload[off:])
    return str(path), payload


def _block_voffsets(path):
    """(coffset, cum_payload) per block, via the Python reader."""
    out = []
    with open(path, "rb") as fh:
        cum = 0
        while True:
            co = fh.tell()
            head = fh.read(12)
            if not head:
                break
            xlen = struct.unpack_from("<H", head, 10)[0]
            extra = fh.read(xlen)
            o = 0
            bsize = None
            while o + 4 <= xlen:
                si1, si2, slen = struct.unpack_from("<BBH", extra, o)
                if si1 == 66 and si2 == 67 and slen == 2:
                    bsize = struct.unpack_from("<H", extra, o + 4)[0] + 1
                o += 4 + slen
            fh.seek(co + bsize - 4)
            isize = struct.unpack("<I", fh.read(4))[0]
            out.append((co, cum))
            cum += isize
    return out


def test_whole_stream_identity(bgzf_file):
    path, payload = bgzf_file
    got = native_extract_voffsets(path, 0, None)
    assert got is not None and got == payload


def test_whole_stream_from_mid_voffset(bgzf_file):
    path, payload = bgzf_file
    blocks = _block_voffsets(path)
    co, cum = blocks[2]
    for uoff in (0, 1, 17):
        v = (co << 16) | uoff
        got = native_extract_voffsets(path, v, None)
        assert got == payload[cum + uoff:]


def test_chunk_ranges_identity(bgzf_file):
    path, payload = bgzf_file
    blocks = _block_voffsets(path)
    rdr = BgzfReader(path)
    cases = []
    # same-block, cross-block, uend=0 (end at block start), long spans
    for (i, ub), (j, ue) in [((0, 0), (0, 1)), ((0, 1), (1, 0)),
                             ((1, 5), (3, 9)), ((0, 0), (len(blocks) - 1, 0)),
                             ((2, 30), (4, 0)), ((3, 0), (5, 500))]:
        cases.append(((blocks[i][0] << 16) | ub,
                      (blocks[j][0] << 16) | ue))
    for vbeg, vend in cases:
        got = native_extract_voffsets(path, vbeg, vend)
        rdr.seek_virtual(vbeg)
        want = rdr.read_until_voffset(vend)
        assert got == want, (vbeg, vend)


def test_empty_and_inverted_ranges(bgzf_file):
    path, _ = bgzf_file
    blocks = _block_voffsets(path)
    v = blocks[1][0] << 16
    assert native_extract_voffsets(path, v, v) == b""
    assert native_extract_voffsets(path, (v | 9), (v | 4)) == b""


def test_corrupt_stream_falls_back_to_none(tmp_path):
    p = tmp_path / "bad.bin"
    p.write_bytes(b"\x1f\x8b" + os.urandom(4000))
    assert native_extract_voffsets(str(p), 0, None) is None


def test_plain_gzip_rejected(tmp_path):
    import gzip

    p = tmp_path / "plain.gz"
    with gzip.open(p, "wb") as fh:
        fh.write(b"x" * 100_000)
    # no BC subfield -> scan fails -> None (callers fall back)
    assert native_extract_voffsets(str(p), 0, None) is None


def test_region_pipeline_uses_native_and_matches(tmp_path):
    """raw_records_for_region through the native path == Python path."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from simulate_fast import simulate_fast

    art = simulate_fast(str(tmp_path), genome_len=8_000, depth=60, seed=5)
    from lofreq_tpu.io.bai import BaiIndex
    from lofreq_tpu.io.bam import BamReader
    from lofreq_tpu.pileup.native_ingest import raw_records_for_region

    rdr = BamReader(art["bam"])
    got = raw_records_for_region(rdr, 0, 1000, 5000)
    idx = BaiIndex.load(art["bam"] + ".bai")
    parts = []
    for cbeg, cend in idx.query(0, 1000, 5000):
        rdr._bgzf.seek_virtual(cbeg)
        parts.append(rdr._bgzf.read_until_voffset(cend))
    assert got == b"".join(parts)


def test_span_cache_sequential_overlapping_windows(bgzf_file):
    """The last-span cache must be invisible: random overlapping
    ascending (and some backward) voffset ranges give byte-identical
    results to the Python reader."""
    import numpy as np

    from lofreq_tpu.io import bgzf as B

    path, _ = bgzf_file
    blocks = _block_voffsets(path)
    rdr = BgzfReader(path)
    rng = np.random.default_rng(3)
    B._SPAN_CACHE.clear()
    nb = len(blocks)
    total = bgzf_file[1]
    sizes = [blocks[k + 1][1] - blocks[k][1] for k in range(nb - 1)]
    sizes.append(len(total) - blocks[-1][1])
    for _ in range(60):
        i = int(rng.integers(0, nb - 1))
        j = int(rng.integers(i, nb))
        # valid voffsets only: uoffset must lie within the block payload
        # (a real BAI never emits otherwise; native returns None there
        # and callers fall back to the Python reader)
        ub = int(rng.integers(0, 40)) % max(sizes[i], 1)
        ue = int(rng.integers(0, 40)) % max(sizes[j], 1)
        if j == i and ue < ub:
            ub, ue = ue, ub
        vbeg = (blocks[i][0] << 16) | ub
        vend = (blocks[j][0] << 16) | ue
        got = B.native_extract_voffsets(path, vbeg, vend)
        rdr.seek_virtual(vbeg)
        want = rdr.read_until_voffset(vend)
        assert got == want, (i, j, ub, ue)
    # whole-stream after cache is warm
    assert B.native_extract_voffsets(path, 0, None) == bgzf_file[1]


def test_native_extract_multi_matches_per_chunk(tmp_path):
    """Window-style multi-chunk extraction == per-chunk Python reads."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from simulate_fast import simulate_fast

    from lofreq_tpu.io import bgzf as B
    from lofreq_tpu.io.bai import BaiIndex
    from lofreq_tpu.io.bam import BamReader

    art = simulate_fast(str(tmp_path), genome_len=30_000, depth=120,
                        seed=13)
    rdr = BamReader(art["bam"])
    idx = BaiIndex.load(art["bam"] + ".bai")
    B._SPAN_CACHE.clear()
    for b, e in [(0, 8000), (5000, 14000), (12000, 30000), (100, 300)]:
        chunks = idx.query(0, b, e)
        got = B.native_extract_multi(art["bam"], chunks)
        parts = []
        for cbeg, cend in chunks:
            rdr._bgzf.seek_virtual(cbeg)
            parts.append(rdr._bgzf.read_until_voffset(cend))
        want = b"".join(parts)
        assert got == want, (b, e)
