"""pysam stand-in for driving the reference's lofreq2_bias.py
UNMODIFIED (tests/oracle/gen_bias_cases.py): a pure-data Samfile whose
reads come from the JSON sidecar named by $READS_JSON — no dependency
on this repo's IO, so the oracle side stays independent.

Implements exactly the API surface the script touches
(lofreq2_bias.py:152,197-256): Samfile(path), fetch(reference=, start=,
end=) and per-read .flag/.mapq/.aligned_pairs/.query/.qqual.  Fuzz
reads carry no soft clips, so pysam's query-excludes-clips quirk is
unobservable and full-sequence .query is faithful.
"""

import json
import os

_CONSUME_Q = {"M": True, "I": True, "S": True, "=": True, "X": True}
_CONSUME_R = {"M": True, "D": True, "N": True, "=": True, "X": True}


def _cigar_ops(s):
    ops, n = [], ""
    for ch in s:
        if ch.isdigit():
            n += ch
        else:
            ops.append((int(n), ch))
            n = ""
    return ops


class AlignedRead(object):
    def __init__(self, d):
        self.flag = d["flag"]
        self.mapq = d["mapq"]
        self.pos = d["pos"]
        self.query = d["seq"]
        self.qqual = d["qual"]
        self._cigar = d["cigar"]

    @property
    def aligned_pairs(self):
        pairs = []
        q, r = 0, self.pos
        for ln, op in _cigar_ops(self._cigar):
            for _ in range(ln):
                cq = _CONSUME_Q.get(op, False)
                cr = _CONSUME_R.get(op, False)
                if cq and cr:
                    pairs.append((q, r))
                    q += 1
                    r += 1
                elif cq:
                    pairs.append((q, None))
                    q += 1
                elif cr:
                    pairs.append((None, r))
                    r += 1
        return pairs

    def _ref_span(self):
        end = self.pos
        for ln, op in _cigar_ops(self._cigar):
            if _CONSUME_R.get(op, False):
                end += ln
        return self.pos, end

    @property
    def rlen(self):
        return len(self.query)


class Samfile(object):
    def __init__(self, path, mode="rb"):
        with open(os.environ["READS_JSON"]) as fh:
            self._reads = json.load(fh)

    def fetch(self, reference=None, start=None, end=None):
        for d in self._reads:
            if d["chrom"] != reference:
                continue
            r = AlignedRead(d)
            b, e = r._ref_span()
            if e > start and b < end:
                yield r
