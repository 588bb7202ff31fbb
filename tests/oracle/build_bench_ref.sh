#!/bin/bash
# Build the single-core reference-C timing driver (bench_ref.c) against
# the reference's own snpcaller/BAQ sources.  Requires the read-only
# reference checkout at /root/reference.  Writes the binary to $1
# (default: ./bench_ref under a tmpdir is the caller's job).
set -euo pipefail
cd "$(dirname "$0")"
OUT=${1:-bench_ref}
REF=/root/reference/src/lofreq
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

mkdir -p "$TMP/htslib"
cat > "$TMP/htslib/bgzf.h" <<'EOF'
typedef struct BGZF BGZF;
EOF

gcc -std=gnu99 -O2 -o "$OUT" bench_ref.c \
    "$REF/snpcaller.c" "$REF/utils.c" "$REF/log.c" \
    "$REF/bam_md_ext.c" "$REF/kprobaln_ext.c" \
    -Imini_hts -I"$TMP" -I/root/reference/src/uthash -I"$REF" -lm
echo "built $OUT"
