"""plp_summary format parity: byte-for-byte against the REFERENCE's own
plp_summary (lofreq_call.c:438-599), compiled unmodified by
tests/oracle/gen_plpsum_golden.sh into tests/golden/plpsum.json."""

import io
import json
import os

import numpy as np

from lofreq_tpu.pileup.engine import IndelEvent
from lofreq_tpu.pipelines.plp_summary import _print_batch

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "plpsum.json")
NT4_IDX = {c: i for i, c in enumerate("ACGTN")}


class _Batch:
    """Single-column stand-in exposing exactly what _print_batch reads."""

    def __init__(self, case):
        c = case
        self.target = c["target"]
        self.positions = np.array([c["pos"]])
        self.ref_nt4 = np.array([NT4_IDX[c["ref"]]])
        cons = c["cons"]
        if cons[0] in "+-":
            self.cons_indel = [(cons[0], cons[1:])]
            self.cons_nt4 = np.array([0])
        else:
            self.cons_indel = [None]
            self.cons_nt4 = np.array([NT4_IDX[cons]])
        self.fw_counts = np.array([c["fw"]])
        self.rv_counts = np.array([c["rv"]])
        self.num_heads = np.array([c["heads"]])
        self.num_tails = np.array([c["tails"]])
        self.num_ins = np.array([c["num_ins"]])
        self.num_dels = np.array([c["num_dels"]])
        self.hrun = np.array([c["hrun"]])
        b_nt4, b_bq, b_baq, b_mq, b_sq = [], [], [], [], []
        for i in range(5):
            d = c["nts"].get(str(i))
            if not d:
                continue
            for j in range(len(d["bq"])):
                b_nt4.append(i)
                b_bq.append(d["bq"][j])
                b_baq.append(d["baq"][j])
                b_mq.append(d["mq"][j])
                b_sq.append(d["sq"][j])
        self.col_start = np.array([0, len(b_nt4)])
        self.b_nt4 = np.array(b_nt4, dtype=np.int64)
        self.b_bq = np.array(b_bq, dtype=np.int64)
        self.b_baq = np.array(b_baq, dtype=np.int64)
        self.b_mq = np.array(b_mq, dtype=np.int64)
        self.b_sq = np.array(b_sq, dtype=np.int64)
        self._ins_neq = (np.array(c["ins_neq"]["q"]),
                         np.array(c["ins_neq"]["mq"]), None)
        self._del_neq = (np.array(c["del_neq"]["q"]),
                         np.array(c["del_neq"]["mq"]), None)

        def evmap(evs):
            m = {}
            for e in evs:
                m[e["key"]] = IndelEvent(
                    key=e["key"], count=len(e["q"]), quals=list(e["q"]),
                    aln_quals=list(e["aq"]), map_quals=list(e["mq"]),
                    source_quals=list(e["sq"]))
            return m

        self.ins_events = [evmap(c["ins_events"])]
        self.del_events = [evmap(c["del_events"])]

    def ins_neq_at(self, c):
        return self._ins_neq

    def del_neq_at(self, c):
        return self._del_neq


class _Conf:
    def __init__(self, use_baq, use_sq):
        self.use_baq = bool(use_baq)
        self.use_sq = bool(use_sq)


def test_plpsum_matches_reference_bytes():
    with open(GOLDEN) as fh:
        cases = json.load(fh)
    assert len(cases) >= 40
    for k, entry in enumerate(cases):
        case = entry["case"]
        batch = _Batch(case)
        buf = io.StringIO()
        _print_batch(batch, _Conf(**case["conf"]), buf)
        assert buf.getvalue() == entry["text"], (
            k, case["conf"], buf.getvalue(), entry["text"])
