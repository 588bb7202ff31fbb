#!/bin/bash
# Regenerate tests/golden/call_snvs.json: column-level differential golden
# from the reference's own plp_to_errprobs + snpcaller (lofreq_call.c:735).
# Requires the reference checkout at /root/reference (read-only).
set -euo pipefail
cd "$(dirname "$0")"
REF=/root/reference/src/lofreq
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

mkdir -p "$TMP/htslib"
cat > "$TMP/htslib/bgzf.h" <<'EOF'
typedef struct BGZF BGZF;
EOF
cat > "$TMP/htslib/faidx.h" <<'EOF'
typedef struct faidx_t faidx_t;
EOF

gcc -std=gnu99 -O2 -o "$TMP/oracle_call_snvs" oracle_call_snvs.c \
    "$REF/snpcaller.c" "$REF/utils.c" "$REF/log.c" \
    -I"$TMP" -I/root/reference/src/uthash -I"$REF" -lm

python3 gen_call_snvs_cases.py --emit-input > "$TMP/cases.txt"
"$TMP/oracle_call_snvs" < "$TMP/cases.txt" > "$TMP/golden.txt"
python3 gen_call_snvs_cases.py --pack "$TMP/golden.txt" \
    ../golden/call_snvs.json
