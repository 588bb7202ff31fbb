/* Differential oracle for the reference's per-column indel caller:
 * builds plp_col_t columns (with indel event hashes) from a stdin spec
 * and calls the REFERENCE's own call_indels (lofreq_call.c:619-726),
 * linked unmodified — covering the poly-AT suppression, the per-event
 * dynamic-Bonferroni ladder, plp_to_{ins,del}_errprobs + eps-qsort,
 * snpcaller, and the AF/DP4/qual emission through report_var.
 *
 * Spec (whitespace-separated):
 *   CONF <use_mq> <use_sq> <use_idaq> <bonf_dynamic> <bonf_indel>
 *        <sig> <min_cov>
 *   COL <target> <pos0> <ref_base> <coverage_plp> <num_heads>
 *       <num_tails> <num_ins> <num_dels> <num_non_indels> <hrun>
 *   NIFR <fw> <rv> / NDFR <fw> <rv>
 *   INQ <n> <vals...>  INM <n> <vals...>    (non-ins pools: q, mq)
 *   DNQ <n> <vals...>  DNM <n> <vals...>    (non-del pools)
 *   IEV <key> <n> <q...> <aq...> <mq...> <sq...> <strand...>
 *   DEV ... (same)
 *   ENDCOL                                  (runs call_indels)
 * Output per case:
 *   CASE <bonf_before>
 *   ...VCF rows emitted by report_var (to stdout)...
 *   ENDCASE <bonf_after> <num_indel_tests_total>
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "plp.h"
#include "snpcaller.h"
#include "utils.h"
#include "vcf.h"

void call_indels(const plp_col_t *p, varcall_conf_t *conf);
extern long long int num_indel_tests;

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
    varcall_conf_t conf;
    memset(&conf, 0, sizeof(conf));
    plp_col_t col;
    int inited = 0;

    if (vcf_file_open(&conf.vcf_out, "-", 0, 'w')) {
        fprintf(stderr, "FATAL: stdout vcf open failed\n");
        return 3;
    }

    while (scanf("%255s", tok) == 1) {
        if (!strcmp(tok, "CONF")) {
            int umq, usq, uidaq, dyn;
            long long bonf;
            double sig;  /* conf.sig is a float: scan separately */
            if (scanf("%d %d %d %d %lld %lf %d", &umq, &usq, &uidaq,
                      &dyn, &bonf, &sig, &conf.min_cov) != 7)
                return 2;
            conf.sig = (float)sig;
            conf.flag = 0;
            if (umq) conf.flag |= VARCALL_USE_MQ;
            if (usq) conf.flag |= VARCALL_USE_SQ;
            if (uidaq) conf.flag |= VARCALL_USE_IDAQ;
            conf.bonf_dynamic = dyn;
            conf.bonf_indel = bonf;
            conf.approx_threshold_n = -1;
        } else if (!strcmp(tok, "COL")) {
            memset(&col, 0, sizeof(col));
            inited = 1;
            static char target[256];
            if (scanf("%255s %d %c %d %d %d %d %d %d %d", target,
                      &col.pos, &col.ref_base, &col.coverage_plp,
                      &col.num_heads, &col.num_tails, &col.num_ins,
                      &col.num_dels, &col.num_non_indels,
                      &col.hrun) != 10)
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
        } else if (!strcmp(tok, "NIFR")) {
            if (scanf("%ld %ld", &col.non_ins_fw_rv[0],
                      &col.non_ins_fw_rv[1]) != 2) return 2;
        } else if (!strcmp(tok, "NDFR")) {
            if (scanf("%ld %ld", &col.non_del_fw_rv[0],
                      &col.non_del_fw_rv[1]) != 2) return 2;
        } else if (!strcmp(tok, "INQ")) {
            int n; if (scanf("%d", &n) != 1) return 2;
            read_vals(&col.ins_quals, n);
        } else if (!strcmp(tok, "INM")) {
            int n; if (scanf("%d", &n) != 1) return 2;
            read_vals(&col.ins_map_quals, n);
        } else if (!strcmp(tok, "DNQ")) {
            int n; if (scanf("%d", &n) != 1) return 2;
            read_vals(&col.del_quals, n);
        } else if (!strcmp(tok, "DNM")) {
            int n; if (scanf("%d", &n) != 1) return 2;
            read_vals(&col.del_map_quals, n);
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
                                     q[n + j], q[2 * n + j], q[3 * n + j],
                                     q[4 * n + j]);
                else
                    add_del_sequence(&col.del_event_counts, key, q[j],
                                     q[n + j], q[2 * n + j], q[3 * n + j],
                                     q[4 * n + j]);
                if (q[n + j] != -1)
                    col.has_indel_aqs = 1;
            }
            free(q);
        } else if (!strcmp(tok, "ENDCOL")) {
            if (!inited) return 2;
            printf("CASE %lld\n", conf.bonf_indel);
            fflush(stdout);
            call_indels(&col, &conf);
            vcf_file_flush(&conf.vcf_out);
            printf("ENDCASE %lld %lld\n", conf.bonf_indel,
                   num_indel_tests);
            fflush(stdout);
        } else {
            fprintf(stderr, "bad token %s\n", tok);
            return 2;
        }
    }
    return 0;
}
