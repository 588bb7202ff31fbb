"""Deep-column robustness: the reference's default max-depth is 1e6
(defaults.h:60) and amplicon data routinely piles 10^5 reads on one
position.  The packed exact-DP matrices are depth-bucketed
(caller._depth_chunks) so one deep column can't inflate a whole
4096-column chunk to its depth; this pins both the bucketing math and
an end-to-end >=100k-depth call with bounded memory."""

import os

import numpy as np
import pytest

from lofreq_tpu.call.caller import PACK_MAX_COLS, _depth_chunks


def test_depth_chunks_bound_memory():
    rng = np.random.default_rng(7)
    depths = rng.integers(50, 2000, 5000)
    depths[123] = 500_000   # one amplicon-class column
    depths[4567] = 120_000
    budget = 64 << 20
    chunks = _depth_chunks(depths, budget=budget)
    seen = np.concatenate(chunks)
    # a partition: every column exactly once
    assert sorted(seen.tolist()) == list(range(len(depths)))
    for sel in chunks:
        dmax = int(depths[sel].max())
        assert len(sel) <= PACK_MAX_COLS
        assert len(sel) * dmax * 8 <= budget or len(sel) == 1
    # the deep columns sit in small tail chunks, not with the crowd
    deep_chunk = next(sel for sel in chunks if 123 in sel)
    assert len(deep_chunk) * 500_000 * 8 <= budget or len(deep_chunk) == 1


def test_depth_chunks_edge_cases():
    assert _depth_chunks(np.array([], dtype=np.int64)) == []
    one = _depth_chunks(np.array([10_000_000]))
    assert len(one) == 1 and one[0].tolist() == [0]
    flat = _depth_chunks(np.full(10_000, 100))
    assert sum(len(s) for s in flat) == 10_000
    assert all(len(s) <= PACK_MAX_COLS for s in flat)


@pytest.mark.skipif(os.environ.get("LOFREQ_TPU_SCALE_TESTS") != "1",
                    reason="deep e2e is minutes of CPU; set "
                           "LOFREQ_TPU_SCALE_TESTS=1")
def test_call_at_100k_depth(tmp_path):
    """End-to-end `call` with a ~120k-deep pileup: completes with
    bounded RSS and calls the planted variant (plp.c:1391-1392 depth
    cap semantics are exercised with the reference 1e6 default)."""
    import resource

    from lofreq_tpu.call.caller import VarcallConf
    from lofreq_tpu.io.bai import build_bai
    from lofreq_tpu.io.bam import BamHeader, BamRead, BamWriter, FREVERSE
    from lofreq_tpu.io.fasta import write_fasta
    from lofreq_tpu.pipelines.call_pipeline import run_call

    rng = np.random.default_rng(11)
    glen, rlen, nreads = 400, 100, 120_000
    genome = np.frombuffer(b"ACGT", np.uint8)[rng.integers(0, 4, glen)]
    fa = str(tmp_path / "ref.fa")
    write_fasta(fa, {"d1": genome.tobytes().decode()})
    vp = 200
    alt = b"T" if genome[vp] != ord("T") else b"A"
    bam = str(tmp_path / "deep.bam")
    header = BamHeader("@HD\tVN:1.6\tSO:coordinate\n", [("d1", glen)])
    starts = np.sort(rng.integers(0, glen - rlen, nreads))
    with BamWriter(bam, header) as w:
        for i, s in enumerate(starts):
            r = BamRead()
            r.qname = f"d{i}"
            r.tid = 0
            r.pos = int(s)
            r.flag = FREVERSE if rng.random() < 0.5 else 0
            r.mapq = 60
            seq = genome[s:s + rlen].copy()
            if s <= vp < s + rlen and rng.random() < 0.10:
                seq[vp - s] = alt[0]
            r.seq = seq.tobytes()
            r.qual = rng.integers(30, 39, rlen).astype(np.uint8)
            r.set_cigar_string(f"{rlen}M")
            w.write(r)
    build_bai(bam)
    res = run_call(bam, fa, vconf=VarcallConf(use_device_screen=False,
                                              use_device_baq=False))
    assert any(v.pos == vp and v.alt == alt.decode() for v in res.vars)
    rss_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    assert rss_gb < 12, f"deep call RSS {rss_gb:.1f} GB"
