#ifndef MINI_HTS_FAIDX_H
#define MINI_HTS_FAIDX_H
#include <stdlib.h>
typedef struct faidx_t faidx_t;
static char *faidx_fetch_seq(const faidx_t *f, const char *n, int s,
                             int e, int *l) { abort(); }
static faidx_t *fai_load(const char *fn) { abort(); }
static void fai_destroy(faidx_t *f) { abort(); }
static int faidx_nseq(const faidx_t *f) { abort(); }
static const char *faidx_iseq(const faidx_t *f, int i) { abort(); }
static int faidx_seq_len(const faidx_t *f, const char *seq) { abort(); }
#endif
