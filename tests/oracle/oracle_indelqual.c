/* Differential oracle for the reference's indelqual subcommand:
 * drives add_dindel / add_uniform (lofreq_indelqual.c:218-306) linked
 * unmodified over an in-memory sam shim — fabricated records go in,
 * the BI/BD tags the reference attaches come out.  Covers
 * find_homopolymers, the DINDELQ run-length table lookup at hpcount
 * [x+1] with the rlen-2 edge clamp, the per-op query/ref walk
 * (M/=/X/D/I/S/H), the default-mask skip, and ENCODE_Q clamping for
 * the uniform mode.
 *
 * Input (stdin):
 *   CASE <mode:dindel|uniform> <iq> <dq>     (iq/dq used by uniform)
 *   REF <refseq>
 *   NREADS <n>
 *   READ <flag> <pos> <cigar> <seq> <qual+33>
 *   ...
 * Output per read (write order): <BI|-> <BD|->
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "htslib/sam.h"  /* -DMINI_HTS_NO_IO_STUBS (all TUs) */
#include "htslib/faidx.h"

int add_uniform(const char *bam_in, const char *bam_out,
                const int ins_qual, const int del_qual);
int add_dindel(const char *bam_in, const char *bam_out, const char *ref);

/* ---- in-memory sam/fai shim ---- */
static bam1_t **g_in;
static int g_n_in, g_next;
static char g_ref[8192];

struct samFile_ { int is_out; };
struct faidx_t { int dummy; };

samFile *sam_open(const char *fn, const char *mode)
{
    samFile *fp = calloc(1, sizeof(*fp));
    fp->is_out = (mode && mode[0] == 'w');
    (void)fn;
    return fp;
}
int sam_close(samFile *fp) { free(fp); return 0; }
bam_hdr_t *sam_hdr_read(samFile *fp)
{
    (void)fp;
    bam_hdr_t *h = calloc(1, sizeof(*h));
    h->n_targets = 1;
    h->target_name = calloc(1, sizeof(char *));
    h->target_name[0] = strdup("t");
    h->target_len = calloc(1, sizeof(uint32_t));
    h->target_len[0] = (uint32_t)strlen(g_ref);
    return h;
}
int sam_hdr_write(samFile *fp, const bam_hdr_t *h)
{ (void)fp; (void)h; return 0; }
void bam_hdr_destroy(bam_hdr_t *h)
{
    if (!h) return;
    free(h->target_name[0]);
    free(h->target_name);
    free(h->target_len);
    free(h);
}
bam1_t *bam_init1(void) { return calloc(1, sizeof(bam1_t)); }
void bam_destroy1(bam1_t *b) { if (b) { free(b->data); free(b); } }
int sam_read1(samFile *fp, bam_hdr_t *h, bam1_t *b)
{
    (void)fp; (void)h;
    if (g_next >= g_n_in)
        return -1;
    bam1_t *src = g_in[g_next++];
    if (b->m_data < src->l_data) {
        b->m_data = src->l_data + 256;
        b->data = realloc(b->data, b->m_data);
    }
    b->core = src->core;
    b->l_data = src->l_data;
    memcpy(b->data, src->data, src->l_data);
    return 0;
}
int sam_write1(samFile *fp, const bam_hdr_t *h, const bam1_t *b)
{
    (void)fp; (void)h;
    uint8_t *bi = bam_aux_get(b, "BI");
    uint8_t *bd = bam_aux_get(b, "BD");
    printf("%s %s\n", bi ? (char *)bi + 1 : "-",
           bd ? (char *)bd + 1 : "-");
    return 0;
}
faidx_t *fai_load(const char *fn) { (void)fn; return calloc(1, 4); }
void fai_destroy(faidx_t *f) { free((void *)f); }
char *fai_fetch(const faidx_t *f, const char *reg, int *len)
{
    (void)f; (void)reg;
    *len = (int)strlen(g_ref);
    return strdup(g_ref);
}
char *faidx_fetch_seq(const faidx_t *f, const char *n, int s, int e,
                      int *l)
{ (void)n; (void)s; (void)e; return fai_fetch(f, "t", l); }

static int parse_cigar(const char *s, uint32_t *out)
{
    int n = 0;
    const char *ops = "MIDNSHP=X";
    while (*s) {
        int l = 0;
        while (*s >= '0' && *s <= '9') { l = l * 10 + (*s - '0'); s++; }
        const char *p = strchr(ops, *s);
        out[n++] = (uint32_t)l << 4 | (uint32_t)(p - ops);
        s++;
    }
    return n;
}

static bam1_t *fabricate(int flag, long pos, const char *cigar_s,
                         const char *seq, const char *qual33)
{
    uint32_t cigar[256];
    int n_cigar = parse_cigar(cigar_s, cigar);
    int L = (int)strlen(seq);
    bam1_t *b = calloc(1, sizeof(bam1_t));
    b->core.tid = 0;
    b->core.pos = pos;
    b->core.l_qname = 2;
    b->core.flag = flag;
    b->core.n_cigar = n_cigar;
    b->core.l_qseq = L;
    int datalen = 2 + 4 * n_cigar + (L + 1) / 2 + L;
    b->m_data = datalen + 4 * (L + 8) + 64;
    b->data = calloc(b->m_data, 1);
    b->l_data = datalen;
    b->data[0] = 'r';
    memcpy(b->data + 2, cigar, 4 * n_cigar);
    uint8_t *sp = bam_get_seq(b);
    (void)seq_nt16_table;
    for (int i = 0; i < L; i++) {
        uint8_t c = seq_nt16_table_storage[(unsigned char)seq[i]];
        sp[i >> 1] |= c << ((~i & 1) << 2);
    }
    uint8_t *qp = bam_get_qual(b);
    for (int i = 0; i < L; i++)
        qp[i] = qual33[i] - 33;
    return b;
}

int main(void)
{
    char tok[64], mode[16];
    while (scanf("%63s", tok) == 1) {
        if (strcmp(tok, "CASE"))
            return 2;
        int iq, dq;
        if (scanf("%15s %d %d", mode, &iq, &dq) != 3)
            return 2;
        if (scanf("%63s %8191s", tok, g_ref) != 2 || strcmp(tok, "REF"))
            return 2;
        int n;
        if (scanf("%63s %d", tok, &n) != 2 || strcmp(tok, "NREADS"))
            return 2;
        g_in = calloc(n, sizeof(bam1_t *));
        g_n_in = n;
        g_next = 0;
        for (int i = 0; i < n; i++) {
            int flag;
            long pos;
            char cigar_s[512], seq[4096], qual_s[4096];
            if (scanf("%63s %d %ld %511s %4095s %4095s", tok, &flag,
                      &pos, cigar_s, seq, qual_s) != 6
                || strcmp(tok, "READ"))
                return 2;
            g_in[i] = fabricate(flag, pos, cigar_s, seq, qual_s);
        }
        int rc;
        if (!strcmp(mode, "dindel"))
            rc = add_dindel("fake.bam", "-", "fake.fa");
        else
            rc = add_uniform("fake.bam", "-", iq, dq);
        if (rc)
            return 3;
        for (int i = 0; i < n; i++) {
            free(g_in[i]->data);
            free(g_in[i]);
        }
        free(g_in);
        fflush(stdout);
    }
    return 0;
}
