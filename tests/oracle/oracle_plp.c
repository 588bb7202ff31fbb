/* Differential oracle for the reference's pileup-column builder:
 * fabricates bam1_t records + bam_pileup1_t entries by hand (the
 * oracle_baq.c pattern) and calls the REFERENCE's own compile_plp_col
 * (plp.c:797), linked unmodified.  Dumps every plp_col_t field the
 * callers consume, so the repo's ColumnBatch (pileup/engine.py:
 * compile_columns) can be compared per column.
 *
 * Input (stdin), one case:
 *   CASE <min_plp_bq> <min_plp_idq> <use_baq> <use_sq> <pos> <target>
 *   REF <refseq>
 *   NREADS <n>
 *   READ <flag> <mq> <L> <seq> <qual+33> <lb|-> <BI|-> <BD|-> <ai|->
 *        <ad|-> <sq> <qpos> <indel> <is_del> <is_head> <is_tail>
 *        <is_refskip>
 *   ... (n READ lines; tag strings are +33-encoded, '-' = absent)
 *   END
 * Output, one block per case:
 *   COL <pos> <ref_base> <cons_base> <coverage_plp> <num_bases>
 *       <num_heads> <num_tails> <hrun> <num_ins> <sum_ins> <num_dels>
 *       <sum_dels> <num_non_indels> <num_ign_indels> <has_indel_aqs>
 *   FW c0..c4 / RV c0..c4
 *   NT <i> <n> <bq...> | <nbaq> <baq...> | <nmq> <mq...> | <nsq> <sq...>
 *   INSQ/INSM/INSS <n> vals...   (ins non-event pools)
 *   DELQ/DELM/DELS <n> vals...
 *   NIFR a b / NDFR a b
 *   IEV <key> <count> <consq> <fw> <rv> <q...> | <aq...> | <mq...> | <sq...>
 *   DEV ... (same)
 *   ENDCOL
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "htslib/sam.h"
#include "plp.h"
#include "utils.h"
#include "uthash.h"

/* bam_nt4 tables come from plp.c itself */
extern const char *bam_nt4_rev_table;

void compile_plp_col(plp_col_t *plp_col, const bam_pileup1_t *plp,
                     const int n_plp, const mplp_conf_t *conf,
                     const char *ref, const int pos, const int ref_len,
                     const char *target_name);
void plp_col_init(plp_col_t *p);
void plp_col_free(plp_col_t *p);

static bam1_t *fabricate(int flag, int mq, int L, const char *seq,
                         const char *qual33, const char *lb,
                         const char *bi, const char *bd, const char *ai,
                         const char *ad, int sq, int use_sq)
{
    bam1_t *b = calloc(1, sizeof(bam1_t));
    b->core.tid = 0;
    b->core.pos = 0; /* pileup entries carry their own qpos; pos unused */
    b->core.l_qname = 2;
    b->core.flag = flag;
    b->core.qual = mq;
    b->core.n_cigar = 1;
    b->core.l_qseq = L;
    int datalen = 2 + 4 + (L + 1) / 2 + L;
    b->m_data = datalen + 6 * (L + 4) + 64;
    b->data = calloc(b->m_data, 1);
    b->l_data = datalen;
    b->data[0] = 'r';
    uint32_t cig = (uint32_t)L << 4;
    memcpy(b->data + 2, &cig, 4);
    uint8_t *sp = bam_get_seq(b);
    (void)seq_nt16_table;
    for (int i = 0; i < L; i++) {
        uint8_t c = seq_nt16_table_storage[(unsigned char)seq[i]];
        sp[i >> 1] |= c << ((~i & 1) << 2);
    }
    uint8_t *qp = bam_get_qual(b);
    for (int i = 0; i < L; i++)
        qp[i] = qual33[i] - 33;
    struct { const char *tag, *val; } tags[] = {
        {"lb", lb}, {"BI", bi}, {"BD", bd}, {"ai", ai}, {"ad", ad}};
    for (int t = 0; t < 5; t++)
        if (strcmp(tags[t].val, "-"))
            bam_aux_append(b, tags[t].tag, 'Z',
                           (int)strlen(tags[t].val) + 1,
                           (uint8_t *)tags[t].val);
    if (use_sq)
        bam_aux_append(b, "sq", 'i', 4, (uint8_t *)&sq);
    return b;
}

static void dump_varray(const char *name, const int_varray_t *a)
{
    printf("%s %zu", name, (size_t)a->n);
    for (size_t i = 0; i < a->n; i++)
        printf(" %d", a->data[i]);
    printf("\n");
}

int main(void)
{
    char tok[64], target[256], refseq[8192];
    mplp_conf_t conf;

    while (scanf("%63s", tok) == 1) {
        if (strcmp(tok, "CASE"))
            return 2;
        memset(&conf, 0, sizeof conf);
        int use_baq, use_sq, pos;
        if (scanf("%d %d %d %d %d %255s", &conf.min_plp_bq,
                  &conf.min_plp_idq, &use_baq, &use_sq, &pos,
                  target) != 6)
            return 2;
        conf.flag = 0;
        if (use_baq)
            conf.flag |= MPLP_BAQ;
        if (use_sq)
            conf.flag |= MPLP_USE_SQ;
        if (scanf("%63s %8191s", tok, refseq) != 2 || strcmp(tok, "REF"))
            return 2;
        int n;
        if (scanf("%63s %d", tok, &n) != 2 || strcmp(tok, "NREADS"))
            return 2;
        bam_pileup1_t *plp = calloc(n, sizeof(bam_pileup1_t));
        for (int i = 0; i < n; i++) {
            int flag, mq, L, sq, qpos, indel, is_del, is_head, is_tail,
                is_refskip;
            char seq[4096], qual[4096], lb[4200], bi[4200], bd[4200],
                ai[4200], ad[4200];
            if (scanf("%63s %d %d %d %4095s %4095s %4199s %4199s %4199s "
                      "%4199s %4199s %d %d %d %d %d %d %d",
                      tok, &flag, &mq, &L, seq, qual, lb, bi, bd, ai, ad,
                      &sq, &qpos, &indel, &is_del, &is_head, &is_tail,
                      &is_refskip) != 18 || strcmp(tok, "READ"))
                return 2;
            plp[i].b = fabricate(flag, mq, L, seq, qual, lb, bi, bd, ai,
                                 ad, sq, use_sq);
            plp[i].qpos = qpos;
            plp[i].indel = indel;
            plp[i].is_del = is_del;
            plp[i].is_head = is_head;
            plp[i].is_tail = is_tail;
            plp[i].is_refskip = is_refskip;
        }
        if (scanf("%63s", tok) != 1 || strcmp(tok, "END"))
            return 2;

        plp_col_t col;
        compile_plp_col(&col, plp, n, &conf, refseq, pos,
                        (int)strlen(refseq), target);

        printf("COL %d %c %s %d %d %d %d %d %d %d %d %d %d %d %d\n",
               col.pos, col.ref_base, col.cons_base, col.coverage_plp,
               col.num_bases, col.num_heads, col.num_tails, col.hrun,
               col.num_ins, col.sum_ins, col.num_dels, col.sum_dels,
               col.num_non_indels, col.num_ign_indels, col.has_indel_aqs);
        printf("FW");
        for (int i = 0; i < NUM_NT4; i++)
            printf(" %ld", col.fw_counts[i]);
        printf("\nRV");
        for (int i = 0; i < NUM_NT4; i++)
            printf(" %ld", col.rv_counts[i]);
        printf("\n");
        for (int i = 0; i < NUM_NT4; i++) {
            printf("NT %d", i);
            const int_varray_t *grp[4] = {&col.base_quals[i],
                                          &col.baq_quals[i],
                                          &col.map_quals[i],
                                          &col.source_quals[i]};
            for (int g = 0; g < 4; g++) {
                printf(" %zu", (size_t)grp[g]->n);
                for (size_t j = 0; j < grp[g]->n; j++)
                    printf(" %d", grp[g]->data[j]);
                printf(" |");
            }
            printf("\n");
        }
        dump_varray("INSQ", &col.ins_quals);
        dump_varray("INSM", &col.ins_map_quals);
        dump_varray("INSS", &col.ins_source_quals);
        dump_varray("DELQ", &col.del_quals);
        dump_varray("DELM", &col.del_map_quals);
        dump_varray("DELS", &col.del_source_quals);
        printf("NIFR %ld %ld\n", col.non_ins_fw_rv[0],
               col.non_ins_fw_rv[1]);
        printf("NDFR %ld %ld\n", col.non_del_fw_rv[0],
               col.non_del_fw_rv[1]);
        {
            ins_event *it, *tmp;
            HASH_ITER(hh_ins, col.ins_event_counts, it, tmp) {
                printf("IEV %s %d %ld %ld %ld", it->key, it->count,
                       (long)it->cons_quals, it->fw_rv[0], it->fw_rv[1]);
                const int_varray_t *grp[4] = {&it->ins_quals,
                                              &it->ins_aln_quals,
                                              &it->ins_map_quals,
                                              &it->ins_source_quals};
                for (int g = 0; g < 4; g++) {
                    printf(" %zu", (size_t)grp[g]->n);
                    for (size_t j = 0; j < grp[g]->n; j++)
                        printf(" %d", grp[g]->data[j]);
                    printf(" |");
                }
                printf("\n");
            }
        }
        {
            del_event *it, *tmp;
            HASH_ITER(hh_del, col.del_event_counts, it, tmp) {
                printf("DEV %s %d %ld %ld %ld", it->key, it->count,
                       (long)it->cons_quals, it->fw_rv[0], it->fw_rv[1]);
                const int_varray_t *grp[4] = {&it->del_quals,
                                              &it->del_aln_quals,
                                              &it->del_map_quals,
                                              &it->del_source_quals};
                for (int g = 0; g < 4; g++) {
                    printf(" %zu", (size_t)grp[g]->n);
                    for (size_t j = 0; j < grp[g]->n; j++)
                        printf(" %d", grp[g]->data[j]);
                    printf(" |");
                }
                printf("\n");
            }
        }
        printf("ENDCOL\n");

        plp_col_free(&col);
        for (int i = 0; i < n; i++) {
            free(plp[i].b->data);
            free(plp[i].b);
        }
        free(plp);
    }
    return 0;
}
