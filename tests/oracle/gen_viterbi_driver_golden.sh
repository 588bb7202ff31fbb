#!/bin/bash
# Regenerate tests/golden/viterbi_driver.json: realignment-driver
# differential golden from the reference's own main_viterbi/fetch_func
# (lofreq_viterbi.c), linked unmodified over the in-memory sam shim.
# Requires the reference checkout at /root/reference (read-only).
set -euo pipefail
cd "$(dirname "$0")"
REF=/root/reference/src/lofreq
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

mkdir -p "$TMP/htslib"

gcc -std=gnu99 -O2 -DNDEBUG -DMINI_HTS_NO_IO_STUBS \
    -o "$TMP/oracle_viterbi_driver" \
    oracle_viterbi_driver.c "$REF/lofreq_viterbi.c" "$REF/viterbi.c" \
    "$REF/utils.c" "$REF/log.c" \
    -Imini_hts -I"$TMP" -I/root/reference/src/uthash -I"$REF" -lm \
    2> "$TMP/err" || { cat "$TMP/err"; exit 1; }

python3 gen_viterbi_driver_cases.py --emit-input > "$TMP/cases.txt"
"$TMP/oracle_viterbi_driver" < "$TMP/cases.txt" > "$TMP/golden.txt"
python3 gen_viterbi_driver_cases.py --pack "$TMP/golden.txt" \
    ../golden/viterbi_driver.json
