/* Golden-value generator for the indel error-probability extraction.
 *
 * Links against the *reference* implementation (read-only at
 * /root/reference) to dump the exact double multiset produced by
 * plp_to_ins_errprobs / plp_to_del_errprobs (snpcaller.c:501-623),
 * sorted ascending as the caller does before snpcaller
 * (lofreq_call.c:305,362).  Golden file: tests/golden/indel_errprobs.json.
 *
 * Input (stdin), one case per line, whitespace-separated:
 *   MODE FLAGS KEY NNEQ (iq mq)*NNEQ NEV { EKEY NQ (iq aq mq sq)*NQ }*NEV
 * MODE: 0 = ins, 1 = del.  FLAGS bitmask: 1 = use_mq, 2 = use_idaq,
 * 4 = use_sq.  KEY/EKEY: ACGT strings (the candidate event sequence).
 * Output: one line per case: n then n hex doubles.
 *
 * Build: see gen_golden.sh (mini htslib stubs + reference sources).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "snpcaller.h"
#include "plp.h"
#include "utils.h"

static int dbl_cmp_asc(const void *a, const void *b)
{
    double x = *(const double *)a, y = *(const double *)b;
    return (x > y) - (x < y);
}

int main(void)
{
    char *line = NULL;
    size_t cap = 0;

    while (getline(&line, &cap, stdin) > 0) {
        char *save = NULL;
        char *tok = strtok_r(line, " \t\n", &save);
        if (!tok)
            continue;
        int mode = atoi(tok);
        int flags = atoi(strtok_r(NULL, " \t\n", &save));
        char key[MAX_INDELSIZE];
        strncpy(key, strtok_r(NULL, " \t\n", &save), MAX_INDELSIZE - 1);
        key[MAX_INDELSIZE - 1] = 0;

        plp_col_t col;
        memset(&col, 0, sizeof(col));

        int nneq = atoi(strtok_r(NULL, " \t\n", &save));
        for (int i = 0; i < nneq; i++) {
            int iq = atoi(strtok_r(NULL, " \t\n", &save));
            int mq = atoi(strtok_r(NULL, " \t\n", &save));
            if (mode == 0) {
                int_varray_add_value(&col.ins_quals, iq);
                int_varray_add_value(&col.ins_map_quals, mq);
            } else {
                int_varray_add_value(&col.del_quals, iq);
                int_varray_add_value(&col.del_map_quals, mq);
            }
        }
        int nev = atoi(strtok_r(NULL, " \t\n", &save));
        int total = nneq;
        for (int e = 0; e < nev; e++) {
            char ekey[MAX_INDELSIZE];
            strncpy(ekey, strtok_r(NULL, " \t\n", &save),
                    MAX_INDELSIZE - 1);
            ekey[MAX_INDELSIZE - 1] = 0;
            int nq = atoi(strtok_r(NULL, " \t\n", &save));
            total += nq;
            for (int j = 0; j < nq; j++) {
                int iq = atoi(strtok_r(NULL, " \t\n", &save));
                int aq = atoi(strtok_r(NULL, " \t\n", &save));
                int mq = atoi(strtok_r(NULL, " \t\n", &save));
                int sq = atoi(strtok_r(NULL, " \t\n", &save));
                if (mode == 0)
                    add_ins_sequence(&col.ins_event_counts, ekey,
                                     iq, aq, mq, sq, 0);
                else
                    add_del_sequence(&col.del_event_counts, ekey,
                                     iq, aq, mq, sq, 0);
            }
        }
        col.coverage_plp = total + 8;

        varcall_conf_t conf;
        memset(&conf, 0, sizeof(conf));
        if (flags & 1) conf.flag |= VARCALL_USE_MQ;
        if (flags & 2) conf.flag |= VARCALL_USE_IDAQ;
        if (flags & 4) conf.flag |= VARCALL_USE_SQ;

        double *ep = NULL;
        int nep = 0;
        if (mode == 0)
            plp_to_ins_errprobs(&ep, &nep, &col, &conf, key);
        else
            plp_to_del_errprobs(&ep, &nep, &col, &conf, key);
        qsort(ep, nep, sizeof(double), dbl_cmp_asc);
        printf("%d", nep);
        for (int i = 0; i < nep; i++)
            printf(" %a", ep[i]);
        printf("\n");
        free(ep);
        if (mode == 0)
            destruct_ins_event_counts(&col.ins_event_counts);
        else
            destruct_del_event_counts(&col.del_event_counts);
    }
    free(line);
    return 0;
}
