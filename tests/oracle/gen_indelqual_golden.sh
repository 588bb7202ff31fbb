#!/bin/bash
# Regenerate tests/golden/indelqual.json: indelqual differential golden
# from the reference's own add_dindel/add_uniform (lofreq_indelqual.c),
# linked unmodified over an in-memory sam shim.
# Requires the reference checkout at /root/reference (read-only).
set -euo pipefail
cd "$(dirname "$0")"
REF=/root/reference/src/lofreq
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

mkdir -p "$TMP/htslib"

gcc -std=gnu99 -O2 -DNDEBUG -DMINI_HTS_NO_IO_STUBS -o "$TMP/oracle_indelqual" \
    oracle_indelqual.c "$REF/lofreq_indelqual.c" \
    "$REF/utils.c" "$REF/log.c" \
    -Imini_hts -I"$TMP" -I/root/reference/src/uthash -I"$REF" -lm \
    2> "$TMP/err" || { cat "$TMP/err"; exit 1; }

python3 gen_indelqual_cases.py --emit-input > "$TMP/cases.txt"
"$TMP/oracle_indelqual" < "$TMP/cases.txt" > "$TMP/golden.txt"
python3 gen_indelqual_cases.py --pack "$TMP/golden.txt" \
    ../golden/indelqual.json
