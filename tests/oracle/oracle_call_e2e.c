/* Whole-subcommand differential oracle for the reference's `lofreq call`
 * composition: main_call (lofreq_call.c:1006) is linked UNMODIFIED and
 * driven file-to-file, covering the interactions no per-layer golden can
 * see — mplp_func per-read hook ordering with on-the-fly BAQ/SQ
 * (plp.c:667-741), ref-fetch / region / BED masking in the mpileup loop
 * (plp.c:1406-1446), dynamic-Bonferroni sequencing across real columns,
 * tmp-VCF plumbing, and the system("lofreq filter ...") threshold
 * derivation (lofreq_call.c:1506-1552), which we intercept in-process
 * and route to the reference's own main_filter.
 *
 * The htslib surface is an in-memory shim written from the SAM spec /
 * samtools mpileup documentation (NOT copied from htslib):
 *   - a BAM "file" is a whitespace-separated text format ("minisam"):
 *       @SQ <name> <len>
 *       <qname> <flag> <rname> <pos0> <mapq> <cigar> <seq> <qual+33>
 *              [TAG:TYPE:VAL ...]          (TYPE in {i, Z})
 *   - faidx parses a real FASTA file
 *   - bed_read parses real BED text (chrom start end, 0-based half-open)
 *   - bam_mplp implements the position-sorted pileup sweep: columns in
 *     (tid,pos) order wherever >=1 read overlaps; per-entry qpos /
 *     is_del / is_refskip / is_head / is_tail / indel resolved from the
 *     CIGAR (deleted columns report the next query base; the indel
 *     field is set on the last aligned base before an I/D op).
 *
 * Usage: oracle_call_e2e <call args...>     e.g.
 *        oracle_call_e2e -f ref.fa -o out.vcf in.bam
 */
#include <assert.h>
#include <ctype.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "htslib/sam.h" /* -DMINI_HTS_NO_IO_STUBS (all TUs) */
#include "htslib/faidx.h"

int main_call(int argc, char *argv[]);
int main_filter(int argc, char *argv[]);
extern int optind;

/* ------------------------------------------------------------------ */
/* minisam parsing                                                     */
/* ------------------------------------------------------------------ */

struct samFile_ {
    bam_hdr_t *h;
    bam1_t **recs;
    int n_recs, m_recs;
    int cursor; /* for sam_read1 streaming */
};

static uint32_t cigar_op_code(char c)
{
    switch (c) {
    case 'M': return 0; case 'I': return 1; case 'D': return 2;
    case 'N': return 3; case 'S': return 4; case 'H': return 5;
    case 'P': return 6; case '=': return 7; case 'X': return 8;
    default:
        fprintf(stderr, "bad cigar op %c\n", c);
        exit(2);
    }
}

static int parse_cigar(const char *s, uint32_t **out)
{
    int n = 0, m = 8;
    uint32_t *cig = malloc(m * sizeof(uint32_t));
    while (*s) {
        char *end;
        long l = strtol(s, &end, 10);
        if (end == s || l <= 0) { fprintf(stderr, "bad cigar\n"); exit(2); }
        if (n == m) { m *= 2; cig = realloc(cig, m * sizeof(uint32_t)); }
        cig[n++] = ((uint32_t)l << BAM_CIGAR_SHIFT) | cigar_op_code(*end);
        s = end + 1;
    }
    *out = cig;
    return n;
}

static int tid_of(const bam_hdr_t *h, const char *name)
{
    for (int i = 0; i < h->n_targets; i++)
        if (!strcmp(h->target_name[i], name))
            return i;
    return -1;
}

static bam1_t *parse_read_line(char *line, const bam_hdr_t *h)
{
    char *save = NULL;
    char *qname = strtok_r(line, " \t", &save);
    char *flag_s = strtok_r(NULL, " \t", &save);
    char *rname = strtok_r(NULL, " \t", &save);
    char *pos_s = strtok_r(NULL, " \t", &save);
    char *mapq_s = strtok_r(NULL, " \t", &save);
    char *cig_s = strtok_r(NULL, " \t", &save);
    char *seq = strtok_r(NULL, " \t", &save);
    char *qual = strtok_r(NULL, " \t", &save);
    if (!qual) { fprintf(stderr, "short read line\n"); exit(2); }

    uint32_t *cig;
    int n_cigar = parse_cigar(cig_s, &cig);
    int l_qseq = (int)strlen(seq);
    if ((int)strlen(qual) != l_qseq) {
        fprintf(stderr, "qual/seq length mismatch\n");
        exit(2);
    }
    int l_qname = (int)strlen(qname) + 1;

    bam1_t *b = bam_init1();
    b->core.tid = tid_of(h, rname);
    if (b->core.tid < 0) { fprintf(stderr, "unknown rname\n"); exit(2); }
    b->core.pos = atoi(pos_s);
    b->core.qual = (uint8_t)atoi(mapq_s);
    b->core.flag = (uint16_t)atoi(flag_s);
    b->core.l_qname = (uint8_t)l_qname;
    b->core.n_cigar = (uint16_t)n_cigar;
    b->core.l_qseq = l_qseq;
    b->core.mtid = -1;
    b->core.mpos = -1;
    b->core.isize = 0;

    int fixed = l_qname + 4 * n_cigar + (l_qseq + 1) / 2 + l_qseq;
    b->m_data = fixed + 64;
    b->data = calloc(1, b->m_data);
    b->l_data = fixed;
    memcpy(b->data, qname, l_qname);
    memcpy(b->data + l_qname, cig, 4 * n_cigar);
    free(cig);
    uint8_t *sp = bam_get_seq(b);
    for (int i = 0; i < l_qseq; i++) {
        int nt16 = seq_nt16_table[(unsigned char)seq[i]];
        sp[i >> 1] |= nt16 << ((~i & 1) << 2);
    }
    uint8_t *qp = bam_get_qual(b);
    for (int i = 0; i < l_qseq; i++)
        qp[i] = (uint8_t)(qual[i] - 33);

    char *tag;
    while ((tag = strtok_r(NULL, " \t", &save)) != NULL) {
        if (strlen(tag) < 5 || tag[2] != ':' || tag[4] != ':') {
            fprintf(stderr, "bad tag %s\n", tag);
            exit(2);
        }
        char tt[2] = { tag[0], tag[1] };
        char type = tag[3];
        char *val = tag + 5;
        if (type == 'i') {
            int v = atoi(val);
            bam_aux_append(b, tt, 'i', 4, (uint8_t *)&v);
        } else if (type == 'Z') {
            bam_aux_append(b, tt, 'Z', (int)strlen(val) + 1,
                           (uint8_t *)val);
        } else {
            fprintf(stderr, "unsupported tag type %c\n", type);
            exit(2);
        }
    }
    return b;
}

samFile *sam_open(const char *fn, const char *mode)
{
    if (mode && mode[0] == 'w')
        return calloc(1, sizeof(samFile)); /* never written to */
    FILE *fh = fopen(fn, "r");
    if (!fh) return NULL;
    samFile *fp = calloc(1, sizeof(samFile));
    fp->h = calloc(1, sizeof(bam_hdr_t));
    fp->m_recs = 16;
    fp->recs = malloc(fp->m_recs * sizeof(bam1_t *));
    char line[65536];
    while (fgets(line, sizeof line, fh)) {
        size_t n = strlen(line);
        while (n && (line[n - 1] == '\n' || line[n - 1] == '\r'))
            line[--n] = 0;
        if (!n) continue;
        if (!strncmp(line, "@SQ", 3)) {
            char name[256];
            unsigned len;
            if (sscanf(line, "@SQ %255s %u", name, &len) != 2) {
                fprintf(stderr, "bad @SQ line\n");
                exit(2);
            }
            int i = fp->h->n_targets++;
            fp->h->target_name = realloc(
                fp->h->target_name, fp->h->n_targets * sizeof(char *));
            fp->h->target_len = realloc(
                fp->h->target_len, fp->h->n_targets * sizeof(uint32_t));
            fp->h->target_name[i] = strdup(name);
            fp->h->target_len[i] = len;
            continue;
        }
        if (fp->n_recs == fp->m_recs) {
            fp->m_recs *= 2;
            fp->recs = realloc(fp->recs, fp->m_recs * sizeof(bam1_t *));
        }
        fp->recs[fp->n_recs++] = parse_read_line(line, fp->h);
    }
    fclose(fh);
    return fp;
}

int sam_close(samFile *fp)
{
    if (!fp) return 0;
    for (int i = 0; i < fp->n_recs; i++)
        bam_destroy1(fp->recs[i]);
    free(fp->recs);
    if (fp->h) {
        for (int i = 0; i < fp->h->n_targets; i++)
            free(fp->h->target_name[i]);
        free(fp->h->target_name);
        free(fp->h->target_len);
        free(fp->h);
    }
    free(fp);
    return 0;
}

static void bam_copy_into(bam1_t *dst, const bam1_t *src)
{
    dst->core = src->core;
    if (dst->m_data < src->l_data) {
        dst->m_data = src->l_data;
        kroundup32(dst->m_data);
        dst->data = realloc(dst->data, dst->m_data);
    }
    memcpy(dst->data, src->data, src->l_data);
    dst->l_data = src->l_data;
}

bam_hdr_t *sam_hdr_read(samFile *fp)
{
    /* hand the caller an owned copy (mpileup destroys it) */
    bam_hdr_t *h = calloc(1, sizeof(bam_hdr_t));
    h->n_targets = fp->h->n_targets;
    h->target_name = malloc(h->n_targets * sizeof(char *));
    h->target_len = malloc(h->n_targets * sizeof(uint32_t));
    for (int i = 0; i < h->n_targets; i++) {
        h->target_name[i] = strdup(fp->h->target_name[i]);
        h->target_len[i] = fp->h->target_len[i];
    }
    return h;
}

int sam_hdr_write(samFile *fp, const bam_hdr_t *h)
{
    (void)fp; (void)h;
    return 0;
}

void bam_hdr_destroy(bam_hdr_t *h)
{
    if (!h) return;
    for (int i = 0; i < h->n_targets; i++)
        free(h->target_name[i]);
    free(h->target_name);
    free(h->target_len);
    free(h);
}

bam1_t *bam_init1(void) { return calloc(1, sizeof(bam1_t)); }

void bam_destroy1(bam1_t *b)
{
    if (b) { free(b->data); free(b); }
}

int sam_read1(samFile *fp, bam_hdr_t *h, bam1_t *b)
{
    (void)h;
    if (fp->cursor >= fp->n_recs) return -1;
    bam_copy_into(b, fp->recs[fp->cursor++]);
    return b->l_data;
}

int sam_write1(samFile *fp, const bam_hdr_t *h, const bam1_t *b)
{
    (void)fp; (void)h;
    return b->l_data;
}

/* ------------------------------------------------------------------ */
/* index + region iterator                                             */
/* ------------------------------------------------------------------ */

struct hts_idx_t_ { int dummy; };

hts_idx_t *sam_index_load(samFile *fp, const char *fn)
{
    (void)fp; (void)fn;
    return calloc(1, sizeof(hts_idx_t));
}

void hts_idx_destroy(hts_idx_t *idx) { free(idx); }

hts_itr_t *sam_itr_querys(const hts_idx_t *idx, bam_hdr_t *h,
                          const char *region)
{
    (void)idx;
    /* hts region grammar subset: name[:from[-to]], 1-based inclusive */
    char name[256];
    long from = 1, to = 1L << 29;
    const char *colon = strrchr(region, ':');
    if (colon && strspn(colon + 1, "0123456789-,") == strlen(colon + 1)) {
        size_t n = (size_t)(colon - region);
        if (n >= sizeof name) return NULL;
        memcpy(name, region, n);
        name[n] = 0;
        char num[128];
        int j = 0;
        for (const char *p = colon + 1; *p && j < 127; p++)
            if (*p != ',') num[j++] = *p;
        num[j] = 0;
        char *dash = strchr(num, '-');
        if (dash) {
            *dash = 0;
            from = atol(num);
            to = atol(dash + 1);
        } else {
            from = atol(num);
        }
    } else {
        if (strlen(region) >= sizeof name) return NULL;
        strcpy(name, region);
    }
    int tid = tid_of(h, name);
    if (tid < 0 || from < 1 || to < from) return NULL;
    hts_itr_t *it = calloc(1, sizeof(hts_itr_t));
    it->tid = tid;
    it->beg = from - 1;
    it->end = to;
    it->cur = 0;
    return it;
}

int sam_itr_next(samFile *fp, hts_itr_t *itr, bam1_t *b)
{
    while (itr->cur < fp->n_recs) {
        bam1_t *r = fp->recs[itr->cur++];
        if (r->core.tid != itr->tid) continue;
        if (r->core.pos >= itr->end) continue;
        if (bam_endpos(r) <= itr->beg) continue;
        bam_copy_into(b, r);
        return b->l_data;
    }
    return -1;
}

void bam_itr_destroy(hts_itr_t *itr) { free(itr); }

/* ------------------------------------------------------------------ */
/* faidx: plain FASTA parser                                           */
/* ------------------------------------------------------------------ */

struct faidx_t {
    int n;
    char **names;
    char **seqs;
    int *lens;
};

faidx_t *fai_load(const char *fn)
{
    FILE *fh = fopen(fn, "r");
    if (!fh) return NULL;
    faidx_t *f = calloc(1, sizeof(faidx_t));
    char line[65536];
    size_t cap = 0;
    while (fgets(line, sizeof line, fh)) {
        size_t n = strlen(line);
        while (n && (line[n - 1] == '\n' || line[n - 1] == '\r'))
            line[--n] = 0;
        if (!n) continue;
        if (line[0] == '>') {
            char *name = line + 1;
            char *sp = strpbrk(name, " \t");
            if (sp) *sp = 0;
            int i = f->n++;
            f->names = realloc(f->names, f->n * sizeof(char *));
            f->seqs = realloc(f->seqs, f->n * sizeof(char *));
            f->lens = realloc(f->lens, f->n * sizeof(int));
            f->names[i] = strdup(name);
            f->seqs[i] = calloc(1, 1);
            f->lens[i] = 0;
            cap = 1;
        } else {
            if (!f->n) { fclose(fh); return NULL; }
            int i = f->n - 1;
            size_t need = (size_t)f->lens[i] + n + 1;
            if (need > cap) {
                cap = need * 2;
                f->seqs[i] = realloc(f->seqs[i], cap);
            }
            memcpy(f->seqs[i] + f->lens[i], line, n + 1);
            f->lens[i] += (int)n;
        }
    }
    fclose(fh);
    return f;
}

void fai_destroy(faidx_t *f)
{
    if (!f) return;
    for (int i = 0; i < f->n; i++) {
        free(f->names[i]);
        free(f->seqs[i]);
    }
    free(f->names);
    free(f->seqs);
    free(f->lens);
    free(f);
}

char *faidx_fetch_seq(const faidx_t *f, const char *name, int s, int e,
                      int *l)
{
    for (int i = 0; i < f->n; i++) {
        if (strcmp(f->names[i], name)) continue;
        if (e >= f->lens[i]) e = f->lens[i] - 1;
        if (s < 0) s = 0;
        if (s > e) { *l = 0; return calloc(1, 1); }
        int n = e - s + 1;
        char *out = malloc(n + 1);
        memcpy(out, f->seqs[i] + s, n);
        out[n] = 0;
        *l = n;
        return out;
    }
    *l = -1;
    return NULL;
}

char *fai_fetch(const faidx_t *f, const char *reg, int *len)
{
    int l;
    char *s = faidx_fetch_seq(f, reg, 0, 0x7fffffff, &l);
    *len = l;
    return s;
}

int faidx_nseq(const faidx_t *f) { return f->n; }
const char *faidx_iseq(const faidx_t *f, int i) { return f->names[i]; }
int faidx_seq_len(const faidx_t *f, const char *seq)
{
    for (int i = 0; i < f->n; i++)
        if (!strcmp(f->names[i], seq))
            return f->lens[i];
    return -1;
}

/* ------------------------------------------------------------------ */
/* BED                                                                 */
/* ------------------------------------------------------------------ */

typedef struct {
    char *chrom;
    long beg, end;
} bed_iv_t;

typedef struct {
    bed_iv_t *iv;
    int n;
} bed_t;

void *bed_read(const char *fn)
{
    FILE *fh = fopen(fn, "r");
    if (!fh) return NULL;
    bed_t *h = calloc(1, sizeof(bed_t));
    char line[4096];
    int m = 8;
    h->iv = malloc(m * sizeof(bed_iv_t));
    while (fgets(line, sizeof line, fh)) {
        char chrom[256];
        long b, e;
        if (sscanf(line, "%255s %ld %ld", chrom, &b, &e) != 3) continue;
        if (h->n == m) {
            m *= 2;
            h->iv = realloc(h->iv, m * sizeof(bed_iv_t));
        }
        h->iv[h->n].chrom = strdup(chrom);
        h->iv[h->n].beg = b;
        h->iv[h->n].end = e;
        h->n++;
    }
    fclose(fh);
    return h;
}

int bed_overlap(const void *vh, const char *chrom, int beg, int end)
{
    const bed_t *h = vh;
    for (int i = 0; i < h->n; i++)
        if (!strcmp(h->iv[i].chrom, chrom) && h->iv[i].beg < end &&
            h->iv[i].end > beg)
            return 1;
    return 0;
}

void bed_destroy(void *vh)
{
    bed_t *h = vh;
    if (!h) return;
    for (int i = 0; i < h->n; i++)
        free(h->iv[i].chrom);
    free(h->iv);
    free(h);
}

/* ------------------------------------------------------------------ */
/* pileup sweep (bam_mplp semantics for the single-BAM sorted case)    */
/* ------------------------------------------------------------------ */

struct bam_mplp_s_ {
    bam_plp_auto_f func;
    void *data;
    bam1_t **act;
    int n_act, m_act;
    bam1_t *pend;
    int has_pend, eof;
    int tid, pos;
    bam_pileup1_t *out;
    int m_out;
    int maxcnt;
};

bam_mplp_t bam_mplp_init(int n, bam_plp_auto_f func, void **data)
{
    assert(n == 1);
    bam_mplp_t it = calloc(1, sizeof(*it));
    it->func = func;
    it->data = data[0];
    it->tid = it->pos = -1;
    it->maxcnt = 8000;
    return it;
}

void bam_mplp_set_maxcnt(bam_mplp_t it, int maxcnt) { it->maxcnt = maxcnt; }

static void mplp_pull(bam_mplp_t it)
{
    if (it->eof || it->has_pend) return;
    bam1_t *b = bam_init1();
    if (it->func(it->data, b) < 0) {
        bam_destroy1(b);
        it->eof = 1;
        return;
    }
    it->pend = b;
    it->has_pend = 1;
}

/* resolve one read's pileup entry at ref position pos (SAM spec walk) */
static void mplp_resolve(bam1_t *b, int pos, bam_pileup1_t *p)
{
    memset(p, 0, sizeof(*p));
    p->b = b;
    p->is_head = (pos == b->core.pos);
    p->is_tail = (pos == (int)bam_endpos(b) - 1);
    const uint32_t *cig = bam_get_cigar(b);
    int x = b->core.pos, y = 0;
    for (int k = 0; k < b->core.n_cigar; k++) {
        int op = cig[k] & BAM_CIGAR_MASK;
        int l = cig[k] >> BAM_CIGAR_SHIFT;
        if (op == BAM_CMATCH || op == BAM_CEQUAL || op == BAM_CDIFF) {
            if (x <= pos && pos < x + l) {
                p->qpos = y + (pos - x);
                /* indel state: set on the last aligned base before the
                 * next I/D op (pads skipped) */
                if (pos == x + l - 1) {
                    int k2 = k + 1;
                    while (k2 < b->core.n_cigar &&
                           (cig[k2] & BAM_CIGAR_MASK) == BAM_CPAD)
                        k2++;
                    if (k2 < b->core.n_cigar) {
                        int op2 = cig[k2] & BAM_CIGAR_MASK;
                        int l2 = cig[k2] >> BAM_CIGAR_SHIFT;
                        if (op2 == BAM_CINS)
                            p->indel = l2;
                        else if (op2 == BAM_CDEL)
                            p->indel = -l2;
                    }
                }
                return;
            }
            x += l;
            y += l;
        } else if (op == BAM_CINS || op == BAM_CSOFT_CLIP) {
            y += l;
        } else if (op == BAM_CDEL || op == BAM_CREF_SKIP) {
            if (x <= pos && pos < x + l) {
                p->is_del = 1;
                p->is_refskip = (op == BAM_CREF_SKIP);
                p->qpos = y; /* next query base (y not advanced by D/N) */
                return;
            }
            x += l;
        }
        /* H, P consume nothing */
    }
    fprintf(stderr, "mplp_resolve: pos %d not covered by read\n", pos);
    exit(2);
}

int bam_mplp_auto(bam_mplp_t it, int *tid, int *pos, int *n_plp,
                  const bam_pileup1_t **plp)
{
    /* prune reads that ended before the current position (deferred to
     * here so last call's entries stayed valid for the caller) */
    int w = 0;
    for (int i = 0; i < it->n_act; i++) {
        if ((int)bam_endpos(it->act[i]) > it->pos)
            it->act[w++] = it->act[i];
        else
            bam_destroy1(it->act[i]);
    }
    it->n_act = w;

    mplp_pull(it);
    if (it->n_act == 0) {
        if (!it->has_pend) return 0;
        it->tid = it->pend->core.tid;
        it->pos = it->pend->core.pos;
    }
    /* absorb every read starting at or before the current column */
    while (it->has_pend && it->pend->core.tid == it->tid &&
           it->pend->core.pos <= it->pos) {
        if (it->n_act == it->m_act) {
            it->m_act = it->m_act ? it->m_act * 2 : 16;
            it->act = realloc(it->act, it->m_act * sizeof(bam1_t *));
        }
        it->act[it->n_act++] = it->pend;
        it->has_pend = 0;
        mplp_pull(it);
    }
    /* every active read covers the current column (sorted input) */
    if (it->n_act > it->m_out) {
        it->m_out = it->n_act * 2;
        it->out = realloc(it->out, it->m_out * sizeof(bam_pileup1_t));
    }
    for (int i = 0; i < it->n_act; i++)
        mplp_resolve(it->act[i], it->pos, &it->out[i]);
    *tid = it->tid;
    *pos = it->pos;
    n_plp[0] = it->n_act;
    plp[0] = it->out;
    it->pos++;
    return 1;
}

void bam_mplp_destroy(bam_mplp_t it)
{
    for (int i = 0; i < it->n_act; i++)
        bam_destroy1(it->act[i]);
    free(it->act);
    if (it->has_pend) bam_destroy1(it->pend);
    free(it->out);
    free(it);
}

/* ------------------------------------------------------------------ */
/* system() interception: route the auto-filter back in-process        */
/* ------------------------------------------------------------------ */

int system(const char *cmd)
{
    char *copy = strdup(cmd);
    char *toks[64];
    int n = 0;
    char *save = NULL;
    for (char *t = strtok_r(copy, " ", &save); t && n < 63;
         t = strtok_r(NULL, " ", &save))
        toks[n++] = t;
    toks[n] = NULL;
    if (n < 2 || strcmp(toks[0], "lofreq") || strcmp(toks[1], "filter")) {
        fprintf(stderr, "unexpected system(): %s\n", cmd);
        exit(2);
    }
    optind = 1; /* fresh getopt scan for main_filter */
    int rc = main_filter(n, toks);
    free(copy);
    return rc;
}

/* ------------------------------------------------------------------ */

int main(int argc, char **argv)
{
    char **av = malloc((argc + 2) * sizeof(char *));
    av[0] = "lofreq";
    av[1] = "call";
    for (int i = 1; i < argc; i++)
        av[i + 1] = argv[i];
    av[argc + 1] = NULL;
    return main_call(argc + 1, av);
}
