#!/bin/bash
# Regenerate tests/golden/call_indels.json: per-column indel-caller
# differential golden from the reference's own call_indels
# (lofreq_call.c:619-726) + report_var emission, linked unmodified.
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
# stubs for lofreq_call.c link deps outside the call_indels path
cat > "$TMP/stubs.c" <<'HEOF'
#include <stdlib.h>
const char *bam_nt4_rev_table = "ACGTN";
const unsigned char bam_nt4_table[256] = {
    ['A'] = 0, ['C'] = 1, ['G'] = 2, ['T'] = 3,
};
int mpileup(const void *a, int (*b)(void*, const void*), void *c,
            const int d, const char **e) { abort(); }
void *bed_read(const char *fn) { abort(); }
void bed_destroy(void *h) { abort(); }
int bed_overlap(const void *h, const char *c, int b, int e) { abort(); }
void *fai_load(const char *fn) { abort(); }
void fai_destroy(void *f) { abort(); }
char *faidx_fetch_seq(void *f, const char *n, int s, int e, int *l)
    { abort(); }
int faidx_nseq(const void *f) { abort(); }
const char *faidx_iseq(const void *f, int i) { abort(); }
int faidx_seq_len(const void *f, const char *s) { abort(); }
void init_mplp_conf(void *c) { abort(); }
void dump_mplp_conf(const void *c) { abort(); }
int source_qual_load_ign_vcf(const char *f, void *b) { abort(); }
void source_qual_free_ign_vars(void) { abort(); }
HEOF

gcc -std=gnu99 -O2 -DNDEBUG -o "$TMP/oracle_call_indels" oracle_call_indels.c \
    "$REF/lofreq_call.c" "$REF/snpcaller.c" "$REF/vcf.c" "$REF/utils.c" \
    "$REF/log.c" "$REF/fet.c" "$TMP/stubs.c" \
    -Imini_hts -I"$TMP" -I/root/reference/src/uthash -I"$REF" -lm -lz \
    2> "$TMP/err" || { cat "$TMP/err"; exit 1; }

python3 gen_call_indels_cases.py --emit-input > "$TMP/cases.txt"
"$TMP/oracle_call_indels" < "$TMP/cases.txt" > "$TMP/golden.txt"
python3 gen_call_indels_cases.py --pack "$TMP/golden.txt" \
    ../golden/call_indels.json
echo "wrote ../golden/call_indels.json"
