"""Fused-path indel mode: the native column sweep + sparse per-event
attach (fast_columns._attach_indels) must reproduce the pure-Python
engine's indel calls exactly (plp.c:1017-1272 + lofreq_call.c:618-726),
and the batched indel DP must match the per-event reference order."""

import numpy as np
import pytest

from simulate import simulate

from lofreq_tpu.call.caller import VarcallConf
from lofreq_tpu.pileup.engine import PileupConf, get_hrun_array, \
    hrun_at_positions
from lofreq_tpu.pipelines.call_pipeline import run_call


def _vars_key(vs):
    return [(v.pos, v.ref, v.alt, v.qual, v.info) for v in vs]


def _run(art, fused, monkeypatch, **kw):
    if not fused:
        # force the pure-Python engine path
        from lofreq_tpu.pileup import fast_columns

        monkeypatch.setattr(fast_columns, "supports_fused",
                            lambda vconf: False)
        import lofreq_tpu.pipelines.call_pipeline as cp

        monkeypatch.setattr(cp, "supports_fused", lambda vconf: False,
                            raising=False)
    return run_call(
        art["bam"], art["fa"],
        vconf=VarcallConf(use_device_screen=False, use_device_baq=False,
                          no_indels=False),
        pconf=PileupConf(collect_indels=True), **kw)


def _with_indelqual(art, tmp_path):
    from lofreq_tpu.cli import main

    qbam = str(tmp_path / "iq.bam")
    assert main(["indelqual", "--uniform", "45,45", "-o", qbam,
                 art["bam"]]) == 0
    assert main(["index", qbam]) == 0
    art = dict(art)
    art["bam"] = qbam
    return art


def test_fused_indel_mode_matches_python_engine(tmp_path, monkeypatch):
    art = simulate(
        str(tmp_path), genome_len=30000, depth=80, seed=11,
        indels=((0.5, 6, 3, "ins"), (0.35, 6, 4, "del"),
                (0.1, 6, 2, "ins"), (0.07, 6, 3, "del")),
    )
    art = _with_indelqual(art, tmp_path)
    ref = _run(art, fused=False, monkeypatch=monkeypatch)
    monkeypatch.undo()
    fused = _run(art, fused=True, monkeypatch=monkeypatch)
    assert ref.stats.num_indel_tests > 0
    assert any("INDEL" in v.info for v in ref.vars)
    assert _vars_key(ref.vars) == _vars_key(fused.vars)
    assert ref.stats.num_indel_tests == fused.stats.num_indel_tests
    assert ref.stats.num_snv_tests == fused.stats.num_snv_tests


def test_fused_indel_mode_max_depth(tmp_path, monkeypatch):
    """Depth capping must pick the same first-N rows per column in both
    engines (bam_mplp_set_maxcnt semantics)."""
    art = simulate(
        str(tmp_path), genome_len=12000, depth=120, seed=29,
        indels=((0.4, 4, 3, "ins"), (0.3, 4, 2, "del")),
    )
    art = _with_indelqual(art, tmp_path)
    import copy

    pc = PileupConf(collect_indels=True, max_depth=50)
    vc = VarcallConf(use_device_screen=False, use_device_baq=False,
                     no_indels=False)
    from lofreq_tpu.pileup import fast_columns
    import lofreq_tpu.pipelines.call_pipeline as cp

    fused = run_call(art["bam"], art["fa"], vconf=copy.copy(vc),
                     pconf=pc)
    monkeypatch.setattr(fast_columns, "supports_fused", lambda v: False)
    monkeypatch.setattr(cp, "supports_fused", lambda v: False,
                        raising=False)
    ref = run_call(art["bam"], art["fa"], vconf=copy.copy(vc), pconf=pc)
    assert _vars_key(ref.vars) == _vars_key(fused.vars)
    assert ref.stats.num_indel_tests == fused.stats.num_indel_tests


def test_hrun_sparse_matches_vectorized():
    rng = np.random.default_rng(0)
    ref = bytes(rng.choice(list(b"ACGT"), 5000).astype(np.uint8))
    full = get_hrun_array(ref)
    pos = np.concatenate([rng.integers(0, 5000, 300),
                          [0, 1, 4998, 4999]])
    sparse = hrun_at_positions(ref, pos)
    assert np.array_equal(sparse, full[pos])


@pytest.mark.parametrize("seed", [3, 17, 41, 59])
def test_fused_indel_sparse_attach_random_sweep(tmp_path, monkeypatch, seed):
    """Randomized fused-vs-python-engine identity for the sparse-attach
    indel path: varied depths, indel mixes (incl. homopolymer-adjacent
    poly-AT candidates), only-indels mode, and source-qual off/on-ish
    configs.  The fused path must match the row engine on variants, test
    counters and INFO strings."""
    import copy

    rng = np.random.default_rng(seed)
    depth = int(rng.choice([60, 150, 400]))
    glen = int(rng.choice([8000, 15000]))
    n_ins = int(rng.integers(1, 4))
    n_del = int(rng.integers(1, 4))
    indels = tuple(
        [(float(rng.uniform(0.08, 0.6)), 3, int(rng.integers(1, 5)), "ins")
         for _ in range(n_ins)]
        + [(float(rng.uniform(0.08, 0.6)), 3, int(rng.integers(1, 5)), "del")
           for _ in range(n_del)])
    art = simulate(str(tmp_path), genome_len=glen, depth=depth,
                   seed=seed + 100, indels=indels)
    art = _with_indelqual(art, tmp_path)
    only_indels = bool(seed % 2)
    vc = VarcallConf(use_device_screen=False, use_device_baq=False,
                     no_indels=False, only_indels=only_indels)
    pc = PileupConf(collect_indels=True)
    fused = run_call(art["bam"], art["fa"], vconf=copy.copy(vc),
                     pconf=copy.copy(pc))
    from lofreq_tpu.pileup import fast_columns
    import lofreq_tpu.pipelines.call_pipeline as cp

    monkeypatch.setattr(fast_columns, "supports_fused", lambda v: False)
    monkeypatch.setattr(cp, "supports_fused", lambda v: False,
                        raising=False)
    ref = run_call(art["bam"], art["fa"], vconf=copy.copy(vc),
                   pconf=copy.copy(pc))
    assert ref.stats.num_indel_tests > 0
    assert _vars_key(ref.vars) == _vars_key(fused.vars)
    assert ref.stats.num_indel_tests == fused.stats.num_indel_tests
    assert ref.stats.num_snv_tests == fused.stats.num_snv_tests


def test_fused_indel_mode_window_boundaries(tmp_path, monkeypatch):
    """Indel events at/near window boundaries: the sparse event re-ingest
    is per window, so a small forced window sweeps events across
    boundaries.  Fused small-window == fused default-window == python
    engine."""
    import copy

    import lofreq_tpu.pipelines.call_pipeline as cp

    art = simulate(
        str(tmp_path), genome_len=24000, depth=100, seed=33,
        indels=((0.5, 10, 3, "ins"), (0.4, 10, 2, "del")),
    )
    art = _with_indelqual(art, tmp_path)
    vc = VarcallConf(use_device_screen=False, use_device_baq=False,
                     no_indels=False)
    pc = PileupConf(collect_indels=True)
    big = run_call(art["bam"], art["fa"], vconf=copy.copy(vc),
                   pconf=copy.copy(pc))
    monkeypatch.setattr(cp, "WINDOW", 7000)
    small = run_call(art["bam"], art["fa"], vconf=copy.copy(vc),
                     pconf=copy.copy(pc))
    monkeypatch.undo()
    assert big.stats.num_indel_tests > 0
    assert _vars_key(big.vars) == _vars_key(small.vars)
    assert big.stats.num_indel_tests == small.stats.num_indel_tests
    assert big.stats.num_snv_tests == small.stats.num_snv_tests
