#!/bin/bash
# Regenerate tests/golden/source_qual.json: per-read source-quality
# differential golden from the reference's own source_qual
# (plp.c:428-593) + count_cigar_ops (samutils.c:437-614), linked
# unmodified.  Requires the reference checkout at /root/reference.
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
cat > "$TMP/htslib/kseq.h" <<'HEOF'
/* vcf.c includes this but uses nothing from it */
HEOF
cat > "$TMP/htslib/tbx.h" <<'HEOF'
#include <stdlib.h>
typedef struct tbx_conf_t_ { int dummy; } tbx_conf_t;
static const tbx_conf_t tbx_conf_vcf;
static int tbx_index_build(const char *fn, int min_shift,
                           const tbx_conf_t *conf) { abort(); }
HEOF
cat > "$TMP/stubs.c" <<'HEOF'
#include <stdlib.h>
void *bed_read(const char *fn) { abort(); }
void bed_destroy(void *h) { abort(); }
int bed_overlap(const void *h, const char *c, int b, int e) { abort(); }
HEOF

gcc -std=gnu99 -O2 -DNDEBUG -o "$TMP/oracle_source_qual" oracle_source_qual.c \
    "$REF/plp.c" "$REF/vcf.c" "$REF/samutils.c" "$REF/snpcaller.c" \
    "$REF/bam_md_ext.c" "$REF/kprobaln_ext.c" \
    "$REF/utils.c" "$REF/log.c" "$TMP/stubs.c" \
    -Imini_hts -I"$TMP" -I/root/reference/src/uthash -I"$REF" -lm \
    2> "$TMP/err" || { cat "$TMP/err"; exit 1; }

# one oracle invocation per case: the reference's ign-var hash is
# load-once-per-process (see gen_source_qual_cases.py --emit-split)
python3 gen_source_qual_cases.py --emit-split "$TMP/cases" > /dev/null
: > "$TMP/golden.txt"
for f in "$TMP"/cases/case*.txt; do
    "$TMP/oracle_source_qual" < "$f" >> "$TMP/golden.txt"
done
python3 gen_source_qual_cases.py --pack "$TMP/golden.txt" \
    ../golden/source_qual.json
echo "wrote ../golden/source_qual.json"
