#!/bin/bash
# Regenerate tests/golden/poissbin.json from the reference implementation.
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
cat > "$TMP/nt4stub.c" <<'EOF'
const char *bam_nt4_rev_table = "ACGTN";
const unsigned char bam_nt4_table[256] = {0};
EOF

gcc -std=gnu99 -O2 -o "$TMP/oracle_gen" oracle_gen.c "$TMP/nt4stub.c" \
    "$REF/snpcaller.c" "$REF/utils.c" "$REF/log.c" \
    -I"$TMP" -I/root/reference/src/uthash -I"$REF" -lm

python3 gen_cases.py --emit-input > "$TMP/cases.txt"
"$TMP/oracle_gen" < "$TMP/cases.txt" > "$TMP/golden.txt"
python3 gen_cases.py --pack "$TMP/cases.txt" "$TMP/golden.txt" \
    ../golden/poissbin.json
echo "wrote ../golden/poissbin.json"
