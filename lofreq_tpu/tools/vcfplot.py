"""VCF statistics plots — equivalent of lofreq2_vcfplot.py.

Produces a multi-panel PDF/PNG: AF histogram, QUAL vs AF scatter, DP
histogram, SB distribution and substitution-type counts.  matplotlib is
optional; a text summary is emitted when it's unavailable.
"""

from __future__ import annotations

import sys
from collections import Counter

from ..io.vcf import VcfReader


def _collect(vcf_in):
    afs, quals, dps, sbs = [], [], [], []
    subst = Counter()
    n_indel = 0
    with VcfReader(vcf_in) as rdr:
        for v in rdr:
            found, af = v.info_value("AF")
            if found and af:
                afs.append(float(af))
            if v.qual != -1:
                quals.append(v.qual)
            found, dp = v.info_value("DP")
            if found and dp:
                dps.append(int(dp))
            found, sb = v.info_value("SB")
            if found and sb:
                sbs.append(int(sb))
            if v.is_indel():
                n_indel += 1
            elif v.ref and v.alt:
                subst[f"{v.ref}>{v.alt}"] += 1
    return dict(afs=afs, quals=quals, dps=dps, sbs=sbs, subst=subst,
                n_indel=n_indel)


def vcfplot(vcf_in, out_path, summary_only=False, stream=None):
    stats = _collect(vcf_in)
    stream = stream or sys.stderr
    n = len(stats["afs"])
    stream.write(f"#vars-with-AF: {n}  indels: {stats['n_indel']}\n")
    if n:
        import numpy as np

        stream.write(f"AF: median {np.median(stats['afs']):.4f} "
                     f"min {min(stats['afs']):.4f} "
                     f"max {max(stats['afs']):.4f}\n")
    for k, v in sorted(stats["subst"].items()):
        stream.write(f"subst {k}: {v}\n")
    if summary_only:
        return stats
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        stream.write("matplotlib unavailable; text summary only\n")
        return stats

    fig, axes = plt.subplots(2, 3, figsize=(15, 8))
    if stats["afs"]:
        axes[0, 0].hist(stats["afs"], bins=50)
        axes[0, 0].set_xlabel("AF")
        axes[0, 0].set_title("Allele frequencies")
        axes[0, 0].set_yscale("log")
    if stats["afs"] and stats["quals"]:
        k = min(len(stats["afs"]), len(stats["quals"]))
        axes[0, 1].scatter(stats["afs"][:k], stats["quals"][:k], s=4)
        axes[0, 1].set_xlabel("AF")
        axes[0, 1].set_ylabel("QUAL")
        axes[0, 1].set_title("Quality vs AF")
    if stats["dps"]:
        axes[0, 2].hist(stats["dps"], bins=50)
        axes[0, 2].set_xlabel("DP")
        axes[0, 2].set_title("Coverage")
    if stats["sbs"]:
        axes[1, 0].hist(stats["sbs"], bins=50)
        axes[1, 0].set_xlabel("SB phred")
        axes[1, 0].set_title("Strand bias")
    if stats["subst"]:
        keys = sorted(stats["subst"])
        axes[1, 1].bar(range(len(keys)), [stats["subst"][k] for k in keys])
        axes[1, 1].set_xticks(range(len(keys)))
        axes[1, 1].set_xticklabels(keys, rotation=90, fontsize=7)
        axes[1, 1].set_title("Substitution types")
    axes[1, 2].axis("off")
    axes[1, 2].text(0.1, 0.5,
                    f"variants: {len(stats['quals'])}\n"
                    f"indels: {stats['n_indel']}")
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return stats
