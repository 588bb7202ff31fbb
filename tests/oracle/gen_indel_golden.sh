#!/bin/bash
# Regenerate tests/golden/indel_errprobs.json from the reference
# implementation (read-only at /root/reference).
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
cat > "$TMP/nt4stub.c" <<'EOF'
const char *bam_nt4_rev_table = "ACGTN";
const unsigned char bam_nt4_table[256] = {0};
EOF

gcc -std=gnu99 -O2 -o "$TMP/oracle_indel" oracle_indel.c "$TMP/nt4stub.c" \
    "$REF/snpcaller.c" "$REF/utils.c" "$REF/log.c" \
    -I"$TMP" -I/root/reference/src/uthash -I"$REF" -lm

python3 gen_indel_cases.py --emit-input > "$TMP/cases.txt"
"$TMP/oracle_indel" < "$TMP/cases.txt" > "$TMP/golden.txt"
python3 gen_indel_cases.py --pack "$TMP/cases.txt" "$TMP/golden.txt" \
    ../golden/indel_errprobs.json
