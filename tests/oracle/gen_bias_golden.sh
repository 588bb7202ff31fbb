#!/bin/bash
# Regenerate tests/golden/bias.json: the reference's lofreq2_bias.py
# run unmodified over pure-data shims (bias_shims/) on fuzzed cases.
# Requires the reference checkout at /root/reference (read-only).
set -euo pipefail
cd "$(dirname "$0")"
python3 gen_bias_cases.py ../golden/bias.json
