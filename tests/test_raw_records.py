"""Raw-record helpers (io/bam.py): layout, aux walking, tag splicing.

The read-level tools stream raw BAM record blocks and edit aux bytes in
place; these tests pin the walker against every tag type (including B
arrays and H hex strings, which the simulated BAMs never produce) by
round-tripping through the object encoder.
"""

import numpy as np

from lofreq_tpu.io import bam as bamio
from lofreq_tpu.io.bam import (
    BamRead,
    decode_record,
    encode_record,
)


def _mk_read(tags):
    r = BamRead()
    r.tid = 1
    r.pos = 1234
    r.mapq = 37
    r.flag = 0
    r.mtid = -1
    r.mpos = -1
    r.tlen = 0
    r.qname = "read/1"
    r.cigar = np.array([(5 << 4) | 4, (90 << 4) | 0, (2 << 4) | 1,
                        (3 << 4) | 2, (5 << 4) | 0], dtype=np.uint32)
    n = 102  # 5S 90M 2I 5M query bases
    rng = np.random.default_rng(7)
    r.seq = rng.choice(list(b"ACGTN"), n).astype(np.uint8).tobytes()
    r.qual = rng.integers(0, 42, n).astype(np.uint8)
    for tag, (tc, val) in tags.items():
        r.set_tag(tag, tc, val)
    return r


ALL_TAGS = {
    "NM": ("i", 3),
    "X0": ("c", -7),
    "X1": ("C", 250),
    "X2": ("s", -30000),
    "X3": ("S", 60000),
    "X4": ("I", 4000000000),
    "XF": ("f", 0.25),
    "XA": ("A", "T"),
    "MD": ("Z", "10A5^GG3"),
    "XH": ("H", "1AFF"),
    "XB": ("B", ("i", [1, -2, 300000])),
    "XC": ("B", ("c", [-1, 2, 3])),
    "XS": ("B", ("f", [0.5, -1.5])),
    "AS": ("i", 77),
}


def test_raw_layout_and_fields():
    r = _mk_read(ALL_TAGS)
    buf = encode_record(r)[4:]  # strip block_size
    f = bamio.raw_fields(buf)
    assert (f[0], f[1], f[3], f[6]) == (1, 1234, 37, 0)
    cigar_off, n_cigar, seq_off, qual_off, aux_off, l_seq = \
        bamio.raw_layout(buf)
    assert n_cigar == 5 and l_seq == 102
    assert (bamio.raw_cigar(buf) == r.cigar).all()
    assert bamio.raw_seq_ascii(buf) == decode_record(buf).seq
    assert (bamio.raw_qual(buf) == r.qual).all()


def test_raw_find_and_strip_every_type():
    r = _mk_read(ALL_TAGS)
    buf = encode_record(r)[4:]
    found = bamio.raw_find_tags(
        buf, {t.encode() for t in ALL_TAGS})
    assert set(found) == {t.encode() for t in ALL_TAGS}

    # strip each tag individually; the decoded record must equal the
    # object-path deletion
    for tag in ALL_TAGS:
        stripped = bamio.raw_strip_tags(buf, {tag.encode()})
        want = _mk_read(ALL_TAGS)
        want.del_tag(tag)
        got = decode_record(stripped)
        assert got.tags == want.tags, tag
        assert got.tag_order == want.tag_order, tag

    # strip a set at once (the viterbi NM/MC/MD/AS case)
    stripped = bamio.raw_strip_tags(buf, {b"NM", b"MD", b"AS", b"MC"})
    got = decode_record(stripped)
    assert "NM" not in got.tags and "MD" not in got.tags \
        and "AS" not in got.tags
    assert got.tags["XB"] == ALL_TAGS["XB"]

    # stripping absent tags returns the same object (no copy)
    assert bamio.raw_strip_tags(buf, {b"zz"}) is buf


def test_raw_append_tags_roundtrip():
    r = _mk_read({"NM": ("i", 1)})
    buf = encode_record(r)[4:]
    out = bamio.raw_append_tags(
        buf, bamio.encode_z_tag(b"lb", b"IIII") +
        bamio.encode_z_tag(b"ai", b"~~~~"))
    got = decode_record(out)
    assert got.tags["lb"] == ("Z", "IIII")
    assert got.tags["ai"] == ("Z", "~~~~")
    assert got.tag_order == ["NM", "lb", "ai"]


def test_raw_strip_tags_no_aux():
    r = _mk_read({})
    buf = encode_record(r)[4:]
    assert bamio.raw_strip_tags(buf, {b"NM"}) is buf
    assert bamio.raw_find_tags(buf, {b"NM"}) == {}
