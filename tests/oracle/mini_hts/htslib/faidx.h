#ifndef MINI_HTS_FAIDX_H
#define MINI_HTS_FAIDX_H
typedef struct faidx_t faidx_t;
#endif
