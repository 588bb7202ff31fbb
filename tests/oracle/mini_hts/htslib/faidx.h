#ifndef MINI_HTS_FAIDX_H
#define MINI_HTS_FAIDX_H
#include <stdlib.h>
typedef struct faidx_t faidx_t;
#ifdef MINI_HTS_NO_IO_STUBS
/* the oracle provides real shim implementations (extern) */
faidx_t *fai_load(const char *fn);
void fai_destroy(faidx_t *f);
char *fai_fetch(const faidx_t *f, const char *reg, int *len);
char *faidx_fetch_seq(const faidx_t *f, const char *n, int s, int e,
                      int *l);
int faidx_nseq(const faidx_t *f);
const char *faidx_iseq(const faidx_t *f, int i);
int faidx_seq_len(const faidx_t *f, const char *seq);
#else
static char *faidx_fetch_seq(const faidx_t *f, const char *n, int s,
                             int e, int *l) { abort(); }
static faidx_t *fai_load(const char *fn) { abort(); }
static void fai_destroy(faidx_t *f) { abort(); }
static char *fai_fetch(const faidx_t *f, const char *reg, int *len)
    { abort(); }
static int faidx_nseq(const faidx_t *f) { abort(); }
static const char *faidx_iseq(const faidx_t *f, int i) { abort(); }
static int faidx_seq_len(const faidx_t *f, const char *seq) { abort(); }
#endif
#endif
