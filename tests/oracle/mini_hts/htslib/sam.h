/* Minimal htslib-compatible definitions, just enough to compile the
 * reference's bam_md_ext.c/kprobaln_ext.c standalone for golden-value
 * generation.  Written from the SAM/BAM spec; NOT a copy of htslib. */
#ifndef MINI_HTS_SAM_H
#define MINI_HTS_SAM_H

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

#define BAM_CMATCH 0
#define BAM_CINS 1
#define BAM_CDEL 2
#define BAM_CREF_SKIP 3
#define BAM_CSOFT_CLIP 4
#define BAM_CHARD_CLIP 5
#define BAM_CPAD 6
#define BAM_CEQUAL 7
#define BAM_CDIFF 8
#define BAM_CIGAR_SHIFT 4
#define BAM_CIGAR_MASK 0xf

#define BAM_FPAIRED 1
#define BAM_FPROPER_PAIR 2
#define BAM_FUNMAP 4
#define BAM_FMUNMAP 8
#define BAM_FREVERSE 16
#define BAM_FMREVERSE 32
#define BAM_FREAD1 64
#define BAM_FREAD2 128
#define BAM_FSECONDARY 256
#define BAM_FQCFAIL 512
#define BAM_FDUP 1024

typedef struct {
    int32_t tid;
    int32_t pos;
    uint16_t bin;
    uint8_t qual;
    uint8_t l_qname;
    uint16_t flag;
    uint16_t n_cigar;
    int32_t l_qseq;
    int32_t mtid;
    int32_t mpos;
    int32_t isize;
} bam1_core_t;

typedef struct {
    bam1_core_t core;
    int l_data, m_data;
    uint8_t *data;
} bam1_t;

static const char seq_nt16_str[] = "=ACMGRSVTWYHKDBN";

static const int seq_nt16_int[] = {4, 0, 1, 4, 2, 4, 4, 4,
                                   3, 4, 4, 4, 4, 4, 4, 4};

static unsigned char seq_nt16_table_storage[256];
static int seq_nt16_table_init_done = 0;
static void seq_nt16_table_init(void)
{
    if (seq_nt16_table_init_done) return;
    memset(seq_nt16_table_storage, 15, 256);
    const char *s = seq_nt16_str;
    for (int i = 0; i < 16; i++) {
        seq_nt16_table_storage[(unsigned char)s[i]] = i;
        seq_nt16_table_storage[(unsigned char)(s[i] | 32)] = i;
    }
    seq_nt16_table_init_done = 1;
}
#define seq_nt16_table \
    (seq_nt16_table_init(), seq_nt16_table_storage)

/* htslib exposes this as a macro; real htslib's own definition */
#define kroundup32(x) (--(x), (x)|=(x)>>1, (x)|=(x)>>2, (x)|=(x)>>4, \
                       (x)|=(x)>>8, (x)|=(x)>>16, ++(x))

#define bam_get_qname(b) ((char *)(b)->data)
#define bam_get_cigar(b) \
    ((uint32_t *)((b)->data + (b)->core.l_qname))
#define bam_get_seq(b) \
    ((b)->data + (b)->core.l_qname + ((b)->core.n_cigar << 2))
#define bam_get_qual(b) \
    (bam_get_seq(b) + (((b)->core.l_qseq + 1) >> 1))
#define bam_get_aux(b) (bam_get_qual(b) + (b)->core.l_qseq)
#define bam_seqi(s, i) ((s)[(i) >> 1] >> ((~(i) & 1) << 2) & 0xf)
#define bam_is_rev(b) (((b)->core.flag & BAM_FREVERSE) != 0)

static int bam_aux_size(uint8_t *s)
{
    switch (*s) {
    case 'c': case 'C': case 'A': return 2;
    case 's': case 'S': return 3;
    case 'i': case 'I': case 'f': return 5;
    case 'Z': case 'H': {
        int len = 1;
        s++;
        while (*s) { len++; s++; }
        return len + 1;
    }
    default: return 1; /* unsupported in stub */
    }
}

static uint8_t *bam_aux_get(const bam1_t *b, const char tag[2])
{
    uint8_t *s = bam_get_aux((bam1_t *)b);
    uint8_t *end = b->data + b->l_data;
    while (s + 3 <= end) {
        if (s[0] == tag[0] && s[1] == tag[1])
            return s + 2;
        s += 2 + bam_aux_size(s + 2);
    }
    return 0;
}

static int bam_aux_del(bam1_t *b, uint8_t *s)
{
    uint8_t *start = s - 2;
    int sz = 2 + bam_aux_size(s);
    memmove(start, start + sz, b->data + b->l_data - (start + sz));
    b->l_data -= sz;
    return 0;
}

static void bam_aux_append(bam1_t *b, const char tag[2], char type,
                           int len, uint8_t *data)
{
    int need = b->l_data + 3 + len;
    if (need > b->m_data) {
        b->m_data = need * 2;
        b->data = realloc(b->data, b->m_data);
    }
    b->data[b->l_data] = tag[0];
    b->data[b->l_data + 1] = tag[1];
    b->data[b->l_data + 2] = type;
    memcpy(b->data + b->l_data + 3, data, len);
    b->l_data += 3 + len;
}

/* ---- additions for compiling plp.c/samutils.c standalone ----
 * Real helpers where the reference reads results (bam_aux2i, bam_endpos,
 * bam_cigar2qlen, bam_pileup1_t layout); abort() stubs for the BAM-IO /
 * pileup-iterator machinery the differential oracles never run (they
 * fabricate records and pileup entries by hand). */

static int64_t bam_aux2i(const uint8_t *s)
{
    switch (*s) {
    case 'c': return *(int8_t *)(s + 1);
    case 'C': return *(uint8_t *)(s + 1);
    case 's': { int16_t v; memcpy(&v, s + 1, 2); return v; }
    case 'S': { uint16_t v; memcpy(&v, s + 1, 2); return v; }
    case 'i': { int32_t v; memcpy(&v, s + 1, 4); return v; }
    case 'I': { uint32_t v; memcpy(&v, s + 1, 4); return v; }
    default: return 0;
    }
}

/* ops consuming reference: M D N = X ; ops consuming query: M I S = X */
#define MINI_HTS_CONSUME_REF(op) \
    ((op) == 0 || (op) == 2 || (op) == 3 || (op) == 7 || (op) == 8)
#define MINI_HTS_CONSUME_QRY(op) \
    ((op) == 0 || (op) == 1 || (op) == 4 || (op) == 7 || (op) == 8)

static int64_t bam_endpos(const bam1_t *b)
{
    const uint32_t *cig = bam_get_cigar(b);
    int64_t pos = b->core.pos;
    for (int k = 0; k < b->core.n_cigar; k++) {
        int op = cig[k] & BAM_CIGAR_MASK;
        if (MINI_HTS_CONSUME_REF(op))
            pos += cig[k] >> BAM_CIGAR_SHIFT;
    }
    return pos > b->core.pos ? pos : b->core.pos + 1;
}

static int64_t bam_cigar2qlen(int n_cigar, const uint32_t *cigar)
{
    int64_t l = 0;
    for (int k = 0; k < n_cigar; k++)
        if (MINI_HTS_CONSUME_QRY(cigar[k] & BAM_CIGAR_MASK))
            l += cigar[k] >> BAM_CIGAR_SHIFT;
    return l;
}
#define bam_calend(c, cigar) (bam_endpos_core_(c, cigar))
static uint32_t bam_endpos_core_(const bam1_core_t *c,
                                 const uint32_t *cigar)
{
    uint32_t pos = c->pos;
    for (int k = 0; k < c->n_cigar; k++)
        if (MINI_HTS_CONSUME_REF(cigar[k] & BAM_CIGAR_MASK))
            pos += cigar[k] >> BAM_CIGAR_SHIFT;
    return pos;
}

/* pileup entry: field set and semantics as documented in the SAM spec /
 * samtools mpileup docs (qpos of deleted columns = next query base;
 * indel set on the column preceding the event) */
typedef struct {
    bam1_t *b;
    int32_t qpos;
    int indel, level;
    uint32_t is_del:1, is_head:1, is_tail:1, is_refskip:1, aux:28;
} bam_pileup1_t;

typedef struct { int32_t n_targets; char **target_name;
                 uint32_t *target_len; } bam_hdr_t;
typedef struct samFile_ samFile;
typedef struct hts_idx_t_ hts_idx_t;
typedef struct hts_itr_t_ { int tid; int64_t beg, end;
                            int cur; /* shim read cursor */ } hts_itr_t;
typedef struct bam_mplp_s_ *bam_mplp_t;
typedef int (*bam_plp_auto_f)(void *data, bam1_t *b);

#ifdef MINI_HTS_NO_IO_STUBS
/* the oracle provides real shim implementations (extern) */
samFile *sam_open(const char *fn, const char *mode);
int sam_close(samFile *fp);
int sam_read1(samFile *fp, bam_hdr_t *h, bam1_t *b);
int sam_write1(samFile *fp, const bam_hdr_t *h, const bam1_t *b);
bam_hdr_t *sam_hdr_read(samFile *fp);
int sam_hdr_write(samFile *fp, const bam_hdr_t *h);
void bam_hdr_destroy(bam_hdr_t *h);
bam1_t *bam_init1(void);
void bam_destroy1(bam1_t *b);
/* index / region-iterator / pileup surface (oracle_call_e2e.c) */
hts_idx_t *sam_index_load(samFile *fp, const char *fn);
void hts_idx_destroy(hts_idx_t *idx);
hts_itr_t *sam_itr_querys(const hts_idx_t *idx, bam_hdr_t *h,
                          const char *region);
int sam_itr_next(samFile *fp, hts_itr_t *itr, bam1_t *b);
void bam_itr_destroy(hts_itr_t *itr);
bam_mplp_t bam_mplp_init(int n, bam_plp_auto_f func, void **data);
void bam_mplp_set_maxcnt(bam_mplp_t iter, int maxcnt);
int bam_mplp_auto(bam_mplp_t iter, int *tid, int *pos, int *n_plp,
                  const bam_pileup1_t **plp);
void bam_mplp_destroy(bam_mplp_t iter);
#else
#define MINI_HTS_ABORT_STUB { abort(); }
static bam1_t *bam_init1(void)
{
    return (bam1_t *)calloc(1, sizeof(bam1_t));
}
static void bam_destroy1(bam1_t *b)
{
    if (b) { free(b->data); free(b); }
}
static samFile *sam_open(const char *fn, const char *mode)
    MINI_HTS_ABORT_STUB
static int sam_close(samFile *fp) MINI_HTS_ABORT_STUB
static int sam_read1(samFile *fp, bam_hdr_t *h, bam1_t *b)
    MINI_HTS_ABORT_STUB
static int sam_write1(samFile *fp, const bam_hdr_t *h, const bam1_t *b)
    MINI_HTS_ABORT_STUB
static bam_hdr_t *sam_hdr_read(samFile *fp) MINI_HTS_ABORT_STUB
static int sam_hdr_write(samFile *fp, const bam_hdr_t *h)
    MINI_HTS_ABORT_STUB
static void bam_hdr_destroy(bam_hdr_t *h) MINI_HTS_ABORT_STUB
static hts_idx_t *sam_index_load(samFile *fp, const char *fn)
    MINI_HTS_ABORT_STUB
static void hts_idx_destroy(hts_idx_t *idx) MINI_HTS_ABORT_STUB
static hts_itr_t *sam_itr_querys(const hts_idx_t *idx, bam_hdr_t *h,
                                 const char *region) MINI_HTS_ABORT_STUB
static int sam_itr_next(samFile *fp, hts_itr_t *itr, bam1_t *b)
    MINI_HTS_ABORT_STUB
static void bam_itr_destroy(hts_itr_t *itr) MINI_HTS_ABORT_STUB
static bam_mplp_t bam_mplp_init(int n, bam_plp_auto_f func, void **data)
    MINI_HTS_ABORT_STUB
static void bam_mplp_set_maxcnt(bam_mplp_t iter, int maxcnt)
    MINI_HTS_ABORT_STUB
static int bam_mplp_auto(bam_mplp_t iter, int *tid, int *pos, int *n_plp,
                         const bam_pileup1_t **plp) MINI_HTS_ABORT_STUB
static void bam_mplp_destroy(bam_mplp_t iter) MINI_HTS_ABORT_STUB
static int bam_name2id(bam_hdr_t *h, const char *ref) MINI_HTS_ABORT_STUB
static void bam_init_header_hash(bam_hdr_t *h) MINI_HTS_ABORT_STUB
static void bam_destroy_header_hash(bam_hdr_t *h) MINI_HTS_ABORT_STUB
static char *bam_format1_core(const bam_hdr_t *h, const bam1_t *b,
                              int of) MINI_HTS_ABORT_STUB
#endif /* MINI_HTS_NO_IO_STUBS */

#endif
