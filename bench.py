#!/usr/bin/env python3
"""End-to-end benchmark: full BAM -> VCF `call` on the default TPU engine.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value      = pileup columns/sec through the COMPLETE default `call`
             pipeline (BGZF decode -> native ingest/BAQ -> fused column
             build -> device screen [-> device BAQ on fat links] -> exact
             confirmation -> VCF records) on a synthetic BAM, steady
             state (kernel compiles amortized by a warm-up region).
vs_baseline = wall-clock ratio vs the reference-equivalent single-core
             path: same pipeline, one host thread, no device (the
             bit-identical re-implementation of C LoFreq's call flow —
             the compiled reference itself needs htslib, absent here).
             Both runs must produce identical VCF records.

BASELINE.md driver metric: "pileup columns/sec; end-to-end wall-clock vs
C LoFreq".  NB on axon the chip sits behind a ~37 MB/s tunnel with ~29 ms
RPC overhead — transfer-heavy device stages (device screen, device BAQ)
auto-disable on such links (ops/device_baq.py:link_bandwidth_mbs,
ops/screen.py:device_screen_default); PCIe/ICI-attached deployments
engage them.  After the 8-lane SIMD BAQ rewrite the host engine runs
22k cols/s at this shape, faster than shipping the screen's traffic
through the tunnel (14.8k) — identical VCF either way (test-asserted).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

GENOME = int(os.environ.get("LOFREQ_BENCH_GENOME", 200_000))
DEPTH = int(os.environ.get("LOFREQ_BENCH_DEPTH", 800))
REPO = os.path.dirname(os.path.abspath(__file__))


def simulate(tmpdir):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from simulate_fast import simulate_fast

    return simulate_fast(tmpdir, genome_len=GENOME, depth=DEPTH, seed=3)


def baseline_single_core(art):
    """Single-core, device-off run in a fresh process (reference-equivalent
    C path; run before this process touches jax so its client threads
    can't steal the core)."""
    code = (
        "import sys, time, json\n"
        f"sys.path.insert(0, {REPO!r})\n"
        "from lofreq_tpu.call.caller import VarcallConf\n"
        "from lofreq_tpu.pipelines.call_pipeline import run_call\n"
        "t0 = time.time()\n"
        f"res = run_call({art['bam']!r}, {art['fa']!r},\n"
        "    vconf=VarcallConf(use_device_screen=False,\n"
        "                      use_device_baq=False))\n"
        "print(json.dumps({'wall': time.time() - t0,\n"
        "    'vars': [(v.pos, v.ref, v.alt, v.qual, v.info)"
        " for v in res.vars],\n"
        "    'tests': res.stats.num_snv_tests}))\n"
    )
    env = dict(os.environ, LOFREQ_NATIVE_THREADS="1")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def device_run(art):
    """Default call (TPU engine), warmed then timed in-process."""
    os.environ.setdefault("LOFREQ_TPU_COMPILE_DEADLINE", "240")
    from lofreq_tpu.call.caller import VarcallConf
    from lofreq_tpu.pipelines.call_pipeline import run_call

    chrom = art["chrom"]
    # warm-up: same depth/read-length -> compiles the same kernel buckets
    run_call(art["bam"], art["fa"], region=f"{chrom}:1-6000",
             vconf=VarcallConf())
    ncols = []

    def progress(_c, pos):
        ncols[:] = [pos]

    t0 = time.time()
    res = run_call(art["bam"], art["fa"], vconf=VarcallConf(),
                   progress=progress)
    wall = time.time() - t0
    # lists, not tuples: the baseline's came through a JSON round-trip
    return dict(wall=wall,
                vars=[[v.pos, v.ref, v.alt, v.qual, v.info]
                      for v in res.vars],
                tests=res.stats.num_snv_tests)


def main():
    with tempfile.TemporaryDirectory() as td:
        art = simulate(td)
        base = baseline_single_core(art)
        dev = device_run(art)
        if base["vars"] != dev["vars"] or base["tests"] != dev["tests"]:
            print(json.dumps({"metric": "end_to_end_call_columns_per_sec",
                              "value": 0, "unit": "MISMATCH vs baseline",
                              "vs_baseline": 0}))
            return 1
        cols_per_sec = GENOME / dev["wall"]
        print(json.dumps({
            "metric": "end_to_end_call_columns_per_sec",
            "value": round(cols_per_sec, 1),
            "unit": (f"cols/s, {GENOME//1000}kb@{DEPTH}x BAM->VCF, default "
                     "call (device stages auto-gate on measured link "
                     "bandwidth; on this tunneled chip the host engine "
                     "wins), steady state, identical VCF; vs_baseline = "
                     "wall ratio vs single-core path"),
            "vs_baseline": round(base["wall"] / dev["wall"], 2),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
