/* Differential oracle for the reference's per-variant uniq test:
 * builds plp_col_t columns (the oracle_plpsum spec) plus the variant
 * under test and calls the REFERENCE's own uniq_snv
 * (lofreq_uniq.c:222-397), linked unmodified — covering the binomial
 * one-sided test through binom.c/dcdflib, the UQ phred tag
 * (PROB_TO_PHREDQUAL_SAFE), indel event-count lookup (key = allele
 * minus anchor base), the coverage-minus-tails indel rule, AF-from-INFO
 * vs --uni-freq, and the detection-limit mode's snpcaller pretend-count
 * path.
 *
 * Spec (whitespace-separated):
 *   CONF <uni_freq> <use_det_lim>
 *   VAR <chrom> <pos0> <ref> <alt> <info>
 *   COL <target> <pos0> <ref_base> <coverage_plp> <num_tails>
 *   NT <i> <n> <bq...> <baq...> <mq...> <sq...>   (x5)
 *   IEV/DEV <key> <n> <q...> <aq...> <mq...> <sq...> <strand...>
 *   ENDCOL       (runs uniq_snv; prints "INFO <var info>")
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "plp.h"
#include "snpcaller.h"
#include "utils.h"
#include "vcf.h"

void uniq_snv(const plp_col_t *p, void *confp);

/* mirror of lofreq_uniq.c's conf structs (the header doesn't export
 * them; layout must match for the fields uniq_snv reads: uni_freq,
 * use_det_lim, var) */
typedef struct {
    int thresh;
    int mtc_type;
    double alpha;
    long int ntests;
    char id[64];
} uniq_filter_shim_t;

typedef struct {
    float uni_freq;
    vcf_file_t vcf_out;
    vcf_file_t vcf_in;
    int use_det_lim;
    int output_all;
    uniq_filter_shim_t uniq_filter;
    var_t *var;
} uniq_conf_shim_t;

static void read_vals(int_varray_t *a, int n)
{
    for (int i = 0; i < n; i++) {
        int v;
        if (scanf("%d", &v) != 1) exit(2);
        int_varray_add_value(a, v);
    }
}

int main(void)
{
    char tok[256];
    uniq_conf_shim_t conf;
    memset(&conf, 0, sizeof conf);
    plp_col_t col;
    static char target[256];
    var_t *var = NULL;
    int inited = 0;

    while (scanf("%255s", tok) == 1) {
        if (!strcmp(tok, "CONF")) {
            double uf;
            if (scanf("%lf %d", &uf, &conf.use_det_lim) != 2)
                return 2;
            conf.uni_freq = (float)uf;
        } else if (!strcmp(tok, "VAR")) {
            char chrom[128], ref[256], alt[256], info[1024];
            long pos;
            if (scanf("%127s %ld %255s %255s %1023s", chrom, &pos, ref,
                      alt, info) != 5)
                return 2;
            if (var)
                vcf_free_var(&var);
            vcf_new_var(&var);
            var->chrom = strdup(chrom);
            var->pos = pos;
            var->ref = strdup(ref);
            var->alt = strdup(alt);
            var->info = strcmp(info, "-") ? strdup(info) : NULL;
            conf.var = var;
        } else if (!strcmp(tok, "COL")) {
            memset(&col, 0, sizeof(col));
            inited = 1;
            if (scanf("%255s %d %c %d %d", target, &col.pos,
                      &col.ref_base, &col.coverage_plp,
                      &col.num_tails) != 5)
                return 2;
            col.target = target;
            col.cons_base[0] = col.ref_base;
            for (int i = 0; i < NUM_NT4; i++) {
                int_varray_init(&col.base_quals[i], 0);
                int_varray_init(&col.baq_quals[i], 0);
                int_varray_init(&col.map_quals[i], 0);
                int_varray_init(&col.source_quals[i], 0);
            }
            int_varray_init(&col.ins_quals, 0);
            int_varray_init(&col.ins_map_quals, 0);
            int_varray_init(&col.ins_source_quals, 0);
            int_varray_init(&col.del_quals, 0);
            int_varray_init(&col.del_map_quals, 0);
            int_varray_init(&col.del_source_quals, 0);
        } else if (!strcmp(tok, "NT")) {
            int i, n;
            if (scanf("%d %d", &i, &n) != 2) return 2;
            read_vals(&col.base_quals[i], n);
            read_vals(&col.baq_quals[i], n);
            read_vals(&col.map_quals[i], n);
            read_vals(&col.source_quals[i], n);
            for (int j = 0; j < n; j++) {
                if (j % 2)
                    col.rv_counts[i]++;
                else
                    col.fw_counts[i]++;
            }
            col.num_bases += n;
        } else if (!strcmp(tok, "IEV") || !strcmp(tok, "DEV")) {
            int is_ins = tok[0] == 'I';
            char key[256];
            int n;
            if (scanf("%255s %d", key, &n) != 2) return 2;
            int *q = malloc(5 * n * sizeof(int));
            for (int j = 0; j < 5 * n; j++)
                if (scanf("%d", &q[j]) != 1) return 2;
            for (int j = 0; j < n; j++) {
                if (is_ins)
                    add_ins_sequence(&col.ins_event_counts, key, q[j],
                                     q[n + j], q[2 * n + j],
                                     q[3 * n + j], q[4 * n + j]);
                else
                    add_del_sequence(&col.del_event_counts, key, q[j],
                                     q[n + j], q[2 * n + j],
                                     q[3 * n + j], q[4 * n + j]);
            }
            free(q);
            if (is_ins)
                col.num_ins += n;
            else
                col.num_dels += n;
        } else if (!strcmp(tok, "ENDCOL")) {
            if (!inited || !var) return 2;
            uniq_snv(&col, &conf);
            printf("INFO %s\n", var->info ? var->info : "-");
            fflush(stdout);
        } else {
            fprintf(stderr, "bad token %s\n", tok);
            return 2;
        }
    }
    return 0;
}
