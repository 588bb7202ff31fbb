#!/bin/bash
# Regenerate tests/golden/tools.json: differential goldens from the
# reference's own pure-python tools, run unmodified:
#   - lofreq2_indel_ovlp.py  (overlapping-indel resolution)
#   - lofreq2_add_fake_gt.py (FORMAT=GT + fake sample columns)
#   - lofreq_star.multiple_testing + lofreq_star.fdr (Bonferroni /
#     Holm-Bonferroni corrections and the FDR index selection)
# Requires the reference checkout at /root/reference (read-only).
set -euo pipefail
cd "$(dirname "$0")"
python3 gen_tools_cases.py ../golden/tools.json
