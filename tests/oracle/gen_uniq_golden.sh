#!/bin/bash
# Regenerate tests/golden/uniq.json: per-variant uniq-test differential
# golden from the reference s own uniq_snv (lofreq_uniq.c:222-397),
# linked unmodified (incl. binom.c + dcdflib).
# Requires the reference checkout at /root/reference (read-only).
set -euo pipefail
cd "$(dirname "$0")"
REF=/root/reference/src/lofreq
TMP=$(mktemp -d)
trap "rm -rf $TMP" EXIT

mkdir -p "$TMP/htslib"
cat > "$TMP/htslib/bgzf.h" <<"HEOF"
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
echo "/* empty */" > "$TMP/htslib/kseq.h"
cat > "$TMP/htslib/tbx.h" <<"HEOF"
#include <stdlib.h>
typedef struct tbx_conf_t_ { int dummy; } tbx_conf_t;
static const tbx_conf_t tbx_conf_vcf;
static int tbx_index_build(const char *fn, int min_shift,
                           const tbx_conf_t *conf) { abort(); }
HEOF
cat > "$TMP/stubs.c" <<"HEOF"
#include <stdlib.h>
void *bed_read(const char *fn) { abort(); }
void bed_destroy(void *h) { abort(); }
int bed_overlap(const void *h, const char *c, int b, int e) { abort(); }
HEOF

gcc -std=gnu99 -O2 -DNDEBUG -o "$TMP/oracle_uniq" oracle_uniq.c \
    "$REF/lofreq_uniq.c" "$REF/plp.c" "$REF/vcf.c" "$REF/samutils.c" \
    "$REF/snpcaller.c" "$REF/bam_md_ext.c" "$REF/kprobaln_ext.c" \
    "$REF/binom.c" "$REF/multtest.c" /root/reference/src/cdflib90/dcdflib.c \
    /root/reference/src/cdflib90/ipmpar.c \
    "$REF/utils.c" "$REF/log.c" "$TMP/stubs.c" \
    -Imini_hts -I"$TMP" -I/root/reference/src/uthash \
    -I/root/reference/src/cdflib90 -I"$REF" -lm \
    2> "$TMP/err" || { cat "$TMP/err"; exit 1; }

python3 gen_uniq_cases.py --emit-input > "$TMP/cases.txt"
"$TMP/oracle_uniq" < "$TMP/cases.txt" > "$TMP/golden.txt"
python3 gen_uniq_cases.py --pack "$TMP/golden.txt" ../golden/uniq.json
