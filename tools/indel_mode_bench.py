#!/usr/bin/env python3
"""End-to-end `call --call-indels` throughput (the reference
best-practice mode, snakemake/Snakefile:124-144): simulate a BAM with
planted SNVs AND indels, add Dindel BI/BD quals (`indelqual --dindel`),
then time the full indel-mode call — screening engine on, identity vs
the all-exact path asserted.

Fills VERDICT r3 weak #7 ("no indel-mode end-to-end number exists").

Usage: python tools/indel_mode_bench.py [genome_len] [depth] [runs]
Prints one JSON line with cols/s + the indel/SNV call split.
"""

import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    genome = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 300
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from simulate import simulate

    from lofreq_tpu.call.caller import VarcallConf
    from lofreq_tpu.core import stagetimer
    from lofreq_tpu.pileup.engine import PileupConf
    from lofreq_tpu.pipelines.call_pipeline import run_call
    from lofreq_tpu.pipelines.indelqual import run_indelqual

    def confs():
        """--call-indels configuration (cli.confs_from_args with
        call_indels=True, everything else at defaults)."""
        v = VarcallConf(no_indels=False, use_idaq=True)
        p = PileupConf(use_idaq=True, collect_indels=True)
        return v, p

    with tempfile.TemporaryDirectory() as td:
        t0 = time.time()
        art = simulate(
            td, genome_len=genome, depth=depth, seed=11,
            snvs=((0.05, 10), (0.3, 10)),
            indels=((0.10, 6, 2, "ins"), (0.25, 6, 3, "del")))
        sim_s = time.time() - t0
        iq_bam = os.path.join(td, "iq.bam")
        t0 = time.time()
        run_indelqual(art["bam"], iq_bam, dindel=True, ref_path=art["fa"])
        from lofreq_tpu.io.bai import build_bai

        build_bai(iq_bam)
        prep_s = time.time() - t0

        vconf, pconf = confs()
        run_call(iq_bam, art["fa"], vconf=vconf, pconf=pconf,
                 region=f"{art['chrom']}:1-6000")  # warm-up
        walls = []
        res = None
        for _ in range(runs):
            vconf, pconf = confs()
            stagetimer.reset()
            t0 = time.time()
            res = run_call(iq_bam, art["fa"], vconf=vconf, pconf=pconf)
            walls.append(time.time() - t0)
        stages = stagetimer.report()

        # identity oracle: all-exact path (screening engine off);
        # try/finally so a raising oracle run can't leak the override
        # and silently disable the screening engine process-wide
        os.environ["LOFREQ_TPU_BAQ_SCREEN"] = "0"
        try:
            vconf, pconf = confs()
            exact = run_call(iq_bam, art["fa"], vconf=vconf, pconf=pconf)
        finally:
            del os.environ["LOFREQ_TPU_BAQ_SCREEN"]
        a = [(v.pos, v.ref, v.alt, v.qual, v.info) for v in res.vars]
        b = [(v.pos, v.ref, v.alt, v.qual, v.info) for v in exact.vars]
        ok = (a == b and res.stats.num_snv_tests == exact.stats.num_snv_tests
              and res.stats.num_indel_tests == exact.stats.num_indel_tests)

        med = statistics.median(walls)
        n_indel = sum(1 for v in res.vars if "INDEL" in v.info)
        print(json.dumps({
            "metric": "indel_mode_call_columns_per_sec",
            "value": round(genome / med, 1),
            "unit": (f"cols/s, {genome//1000}kb@{depth}x --call-indels "
                     f"(BI/BD via indelqual --dindel), median of {runs}, "
                     f"min {genome / max(walls):.0f} / "
                     f"max {genome / min(walls):.0f}; "
                     f"identical to all-exact path: {ok}"),
            "runs_wall_s": [round(w, 3) for w in walls],
            "median_run_stages_s": {k: round(v, 3)
                                    for k, v in sorted(stages.items())},
            "n_vars": len(res.vars), "n_indel_vars": n_indel,
            "snv_tests": res.stats.num_snv_tests,
            "indel_tests": res.stats.num_indel_tests,
            "sim_s": round(sim_s, 1), "prep_s": round(prep_s, 1),
        }))
    sys.stdout.flush()
    os._exit(0 if ok else 1)


if __name__ == "__main__":
    sys.exit(main())
