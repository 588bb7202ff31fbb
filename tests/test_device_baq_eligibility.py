"""Device-BAQ eligibility matrix: which configs run the device-BAQ
screening mode and why the rest cannot (VarcallConf.device_baq_on +
the call pipeline's BED gate).

The fused device-BAQ screen requires BAQ-independent column selection
(default joint-qual filters), the fused SNV column path, and no BED —
everything else silently (and correctly) takes the exact C BAQ.  This
pins the matrix so a gating regression can't silently widen or narrow
coverage; docs/DEVICE_STEP.md carries the same table.
"""

import pytest

from lofreq_tpu.call.caller import VarcallConf
from lofreq_tpu.pileup.engine import PileupConf

# (description, vconf kwargs, pconf kwargs, eligible?)
MATRIX = [
    ("default SNV call", {}, {}, True),
    ("forced on", {"use_device_baq": True}, {}, True),
    ("forced off", {"use_device_baq": False}, {}, False),
    # --call-indels is eligible: BAQ feeds only the SNV merge; IDAQ is
    # computed by the exact C HMM regardless of a spliced device BAQ
    ("indel mode (--call-indels)", {"no_indels": False}, {}, True),
    ("only-indels", {"no_indels": False, "only_indels": True}, {}, False),
    ("BAQ off (-B)", {}, {"use_baq": False}, False),
    ("min_jq set (-j)", {"min_jq": 10}, {}, False),
    ("min_alt_jq set (-J)", {"min_alt_jq": 10}, {}, False),
    # median-ref-bq alt override needs per-column medians: no fused path
    ("def_alt_bq -1 (median mode)", {"def_alt_bq": -1}, {}, False),
    # non-default quality knobs that the fused path DOES cover
    ("min_bq raised", {"min_bq": 20}, {}, True),
    ("min_alt_bq raised", {"min_alt_bq": 25}, {}, True),
    ("def_alt_bq fixed", {"def_alt_bq": 30}, {}, True),
    ("source quals on (-s)", {"use_sq": True}, {"use_sq": True}, True),
    ("mapq off (-N)", {"use_mq": False}, {}, True),
]


@pytest.mark.parametrize("desc,vkw,pkw,want", MATRIX,
                         ids=[m[0] for m in MATRIX])
def test_eligibility(desc, vkw, pkw, want):
    # force the would-be-dynamic gates ON so the matrix tests only the
    # CONFIG gating (the device/link/throughput gates are runtime
    # concerns, tested in test_device_baq.py)
    vkw = dict(vkw)
    vkw.setdefault("use_device_baq", True)
    vconf = VarcallConf(**vkw)
    pconf = PileupConf(**pkw)
    assert vconf.device_baq_on(pconf) == want, desc


def test_bed_disables_in_pipeline(tmp_path):
    """The pipeline gate: a BED region list forces the exact path even
    for an otherwise-eligible config (call_pipeline.py requires
    pconf.bed is None before constructing the runner)."""
    import inspect

    from lofreq_tpu.pipelines import call_pipeline

    src = inspect.getsource(call_pipeline.run_call)
    assert "pconf.bed is None" in src
