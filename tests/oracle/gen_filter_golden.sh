#!/bin/bash
# Regenerate tests/golden/filter.json: whole-subcommand differential
# golden from the reference's own main_filter (lofreq_filter.c), linked
# unmodified and driven file-to-file over fuzzed VCFs x argument sets.
# Requires the reference checkout at /root/reference (read-only).
set -euo pipefail
cd "$(dirname "$0")"
REF=/root/reference/src/lofreq
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

mkdir -p "$TMP/htslib"
cat > "$TMP/htslib/bgzf.h" <<'HEOF'
#ifndef STUB_BGZF_H
#define STUB_BGZF_H
#include <stdlib.h>
#include <sys/types.h>
#include "htslib/kstring.h"
typedef struct BGZF BGZF;
static BGZF *bgzf_open(const char *path, const char *mode) { abort(); }
static int bgzf_close(BGZF *fp) { abort(); }
static int bgzf_flush(BGZF *fp) { abort(); }
static int bgzf_getline(BGZF *fp, int delim, kstring_t *str) { abort(); }
static int64_t bgzf_seek(BGZF *fp, int64_t pos, int whence) { abort(); }
static ssize_t bgzf_write(BGZF *fp, const void *data, size_t length)
    { abort(); }
#endif
HEOF
cat > "$TMP/htslib/kstring.h" <<'HEOF'
#ifndef STUB_KSTRING_H
#define STUB_KSTRING_H
#include <stddef.h>
typedef struct { size_t l, m; char *s; } kstring_t;
#endif
HEOF
echo "/* empty */" > "$TMP/htslib/kseq.h"
cat > "$TMP/htslib/tbx.h" <<'HEOF'
#include <stdlib.h>
typedef struct tbx_conf_t_ { int dummy; } tbx_conf_t;
static const tbx_conf_t tbx_conf_vcf;
static int tbx_index_build(const char *fn, int min_shift,
                           const tbx_conf_t *conf) { abort(); }
HEOF

gcc -std=gnu99 -O2 -DNDEBUG -o "$TMP/oracle_filter" oracle_filter.c \
    "$REF/lofreq_filter.c" "$REF/vcf.c" "$REF/multtest.c" \
    "$REF/utils.c" "$REF/log.c" \
    -I"$TMP" -I/root/reference/src/uthash -I"$REF" -lm -lz \
    2> "$TMP/err" || { cat "$TMP/err"; exit 1; }

python3 gen_filter_cases.py --run "$TMP/oracle_filter" ../golden/filter.json
