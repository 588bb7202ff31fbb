#!/bin/bash
# Regenerate tests/golden/vcfset.json: whole-subcommand differential
# golden from the reference's own main_vcfset (lofreq_vcfset.c), linked
# unmodified over a plain-text tabix shim (see oracle_vcfset.c header).
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
/* plain-text tabix SHIM for the vcfset differential (see tbx_shim.c):
 * loads the whole vcf2 into memory and answers exact-position region
 * queries — the reference's own loop re-checks positions afterwards. */
#ifndef SHIM_TBX_H
#define SHIM_TBX_H
#include "htslib/kstring.h"
typedef struct { int dummy; } tbx_conf_t;
static const tbx_conf_t tbx_conf_vcf;
typedef struct tbx_shim tbx_t;
typedef struct htsfile_shim htsFile;
typedef struct hts_itr_shim hts_itr_t;
htsFile *hts_open(const char *fn, const char *mode);
int hts_close(htsFile *fp);
tbx_t *tbx_index_load(const char *fn);
void tbx_destroy(tbx_t *t);
hts_itr_t *tbx_itr_querys(tbx_t *t, const char *reg);
int tbx_itr_next(htsFile *fp, tbx_t *t, hts_itr_t *itr, void *kstr);
void tbx_itr_destroy(hts_itr_t *itr);
static int tbx_index_build(const char *fn, int min_shift,
                           const tbx_conf_t *conf) { return 0; }
#endif
HEOF
cat > "$TMP/tbx_shim.c" <<'HEOF'
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "htslib/tbx.h"

struct htsfile_shim { int dummy; };
struct tbx_shim { char **lines; long *pos; char **chrom; int n; };
struct hts_itr_shim { tbx_t *t; int i; char chrom[256]; long beg, end; };

htsFile *hts_open(const char *fn, const char *mode)
{ (void)fn; (void)mode; return calloc(1, sizeof(htsFile)); }
int hts_close(htsFile *fp) { free(fp); return 0; }

tbx_t *tbx_index_load(const char *fn)
{
    FILE *fh = fopen(fn, "r");
    if (!fh) return NULL;
    tbx_t *t = calloc(1, sizeof(*t));
    char *line = NULL; size_t cap = 0; ssize_t len;
    int alloc = 0;
    while ((len = getline(&line, &cap, fh)) > 0) {
        if (line[0] == '#' || len <= 1) continue;
        if (t->n == alloc) {
            alloc = alloc ? alloc * 2 : 64;
            t->lines = realloc(t->lines, alloc * sizeof(char *));
            t->pos = realloc(t->pos, alloc * sizeof(long));
            t->chrom = realloc(t->chrom, alloc * sizeof(char *));
        }
        if (line[len - 1] == '\n') line[len - 1] = 0;
        t->lines[t->n] = strdup(line);
        char *tab = strchr(line, '\t');
        t->chrom[t->n] = strndup(line, tab - line);
        t->pos[t->n] = atol(tab + 1);
        t->n++;
    }
    free(line);
    fclose(fh);
    return t;
}
void tbx_destroy(tbx_t *t)
{
    for (int i = 0; i < t->n; i++) { free(t->lines[i]); free(t->chrom[i]); }
    free(t->lines); free(t->pos); free(t->chrom); free(t);
}
hts_itr_t *tbx_itr_querys(tbx_t *t, const char *reg)
{
    hts_itr_t *it = calloc(1, sizeof(*it));
    it->t = t;
    const char *c = strrchr(reg, ':');
    size_t cl = c - reg;
    memcpy(it->chrom, reg, cl);
    it->chrom[cl] = 0;
    if (sscanf(c + 1, "%ld-%ld", &it->beg, &it->end) != 2) {
        free(it);
        return NULL;
    }
    return it;
}
int tbx_itr_next(htsFile *fp, tbx_t *t, hts_itr_t *itr, void *kstr_)
{
    (void)fp; (void)t;
    kstring_t *ks = kstr_;
    while (itr->i < itr->t->n) {
        int i = itr->i++;
        if (strcmp(itr->t->chrom[i], itr->chrom)) continue;
        long p = itr->t->pos[i];
        if (p < itr->beg || p > itr->end) continue;
        size_t need = strlen(itr->t->lines[i]) + 1;
        if (ks->m < need) { ks->m = need * 2; ks->s = realloc(ks->s, ks->m); }
        memcpy(ks->s, itr->t->lines[i], need);
        ks->l = need - 1;
        return 0;
    }
    return -1;
}
void tbx_itr_destroy(hts_itr_t *itr) { free(itr); }
HEOF

gcc -std=gnu99 -O2 -DNDEBUG -o "$TMP/oracle_vcfset" oracle_vcfset.c \
    "$REF/lofreq_vcfset.c" "$REF/vcf.c" "$REF/utils.c" "$REF/log.c" \
    "$TMP/tbx_shim.c" \
    -I"$TMP" -I/root/reference/src/uthash -I"$REF" -lm -lz \
    2> "$TMP/err" || { cat "$TMP/err"; exit 1; }

python3 gen_vcfset_cases.py --run "$TMP/oracle_vcfset" ../golden/vcfset.json
