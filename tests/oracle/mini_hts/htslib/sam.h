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

#endif
