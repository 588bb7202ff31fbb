/* Column-level differential driver: reference plp_to_errprobs + snpcaller.
 *
 * Mirrors the reference's call_snvs flow (lofreq_call.c:735-877) minus VCF
 * reporting: per input column it fills a plp_col_t, runs plp_to_errprobs
 * (snpcaller.c:345), qsorts ascending like lofreq_call.c:784, and runs
 * snpcaller (snpcaller.c:1074), dumping per-alt p-values plus the filtered
 * counts and an order-independent XOR checksum of the err-prob bit
 * patterns.  Links against the reference sources (read-only checkout);
 * the packed golden file is committed so tests never need the reference.
 *
 * Input, one case per line:
 *   ref_idx min_bq min_alt_bq def_alt_bq min_jq min_alt_jq def_alt_jq
 *   flags bonf sig nA nC nG nT  (then for each nt4 group, n_i quads:)
 *   bq baq mq sq ...
 * Output, one line per case:
 *   num_err_probs a0 a1 a2 r0 r1 r2 xorhash pv0 pv1 pv2
 */
#include <float.h>
#include <inttypes.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "snpcaller.h"
#include "utils.h"

const char *bam_nt4_rev_table = "ACGTN";
const unsigned char bam_nt4_table[256] = {
    ['A'] = 0, ['C'] = 1, ['G'] = 2, ['T'] = 3,
};

int main(void)
{
    char *line = NULL;
    size_t cap = 0;

    while (getline(&line, &cap, stdin) > 0) {
        char *p = line, *end;
        long ref_idx = strtol(p, &end, 10); p = end;
        varcall_conf_t conf;
        memset(&conf, 0, sizeof conf);
        conf.min_bq = (int)strtol(p, &end, 10); p = end;
        conf.min_alt_bq = (int)strtol(p, &end, 10); p = end;
        conf.def_alt_bq = (int)strtol(p, &end, 10); p = end;
        conf.min_jq = (int)strtol(p, &end, 10); p = end;
        conf.min_alt_jq = (int)strtol(p, &end, 10); p = end;
        conf.def_alt_jq = (int)strtol(p, &end, 10); p = end;
        conf.flag = (int)strtol(p, &end, 10); p = end;
        long long bonf = strtoll(p, &end, 10); p = end;
        double sig = strtod(p, &end); p = end;
        conf.bonf_subst = bonf;
        conf.sig = sig;
        conf.approx_threshold_n = -1;

        plp_col_t col;
        memset(&col, 0, sizeof col);
        col.ref_base = bam_nt4_rev_table[ref_idx];
        int n[4];
        int total = 0;
        for (int i = 0; i < 4; i++) {
            n[i] = (int)strtol(p, &end, 10); p = end;
            total += n[i];
        }
        for (int i = 0; i < 4; i++) {
            int_varray_init(&col.base_quals[i], 0);
            int_varray_init(&col.baq_quals[i], 0);
            int_varray_init(&col.map_quals[i], 0);
            int_varray_init(&col.source_quals[i], 0);
            for (int j = 0; j < n[i]; j++) {
                int_varray_add_value(&col.base_quals[i],
                                     (int)strtol(p, &end, 10)); p = end;
                int_varray_add_value(&col.baq_quals[i],
                                     (int)strtol(p, &end, 10)); p = end;
                int_varray_add_value(&col.map_quals[i],
                                     (int)strtol(p, &end, 10)); p = end;
                int_varray_add_value(&col.source_quals[i],
                                     (int)strtol(p, &end, 10)); p = end;
            }
        }
        col.coverage_plp = total;
        col.num_bases = total;

        double *err_probs;
        int num_err_probs;
        int alt_bases[NUM_NONCONS_BASES];
        int alt_counts[NUM_NONCONS_BASES];
        int alt_raw_counts[NUM_NONCONS_BASES];
        plp_to_errprobs(&err_probs, &num_err_probs, alt_bases, alt_counts,
                        alt_raw_counts, &col, &conf);
        qsort(err_probs, num_err_probs, sizeof(double), dbl_cmp);

        uint64_t h = 0;
        for (int i = 0; i < num_err_probs; i++) {
            uint64_t bits;
            memcpy(&bits, &err_probs[i], 8);
            h ^= bits;
        }

        long double pvalues[NUM_NONCONS_BASES];
        for (int i = 0; i < NUM_NONCONS_BASES; i++)
            pvalues[i] = LDBL_MAX;
        int got_alt = 0;
        for (int i = 0; i < NUM_NONCONS_BASES; i++)
            if (alt_counts[i])
                got_alt = 1;
        if (got_alt &&
            snpcaller(pvalues, err_probs, num_err_probs, alt_counts,
                      bonf, sig, conf.approx_threshold_n)) {
            fprintf(stderr, "FATAL: snpcaller failed\n");
            return 1;
        }
        printf("%d %d %d %d %d %d %d %016" PRIx64 " %.21Le %.21Le %.21Le\n",
               num_err_probs, alt_counts[0], alt_counts[1], alt_counts[2],
               alt_raw_counts[0], alt_raw_counts[1], alt_raw_counts[2],
               h, pvalues[0], pvalues[1], pvalues[2]);

        free(err_probs);
        for (int i = 0; i < 4; i++) {
            int_varray_free(&col.base_quals[i]);
            int_varray_free(&col.baq_quals[i]);
            int_varray_free(&col.map_quals[i]);
            int_varray_free(&col.source_quals[i]);
        }
    }
    free(line);
    return 0;
}
