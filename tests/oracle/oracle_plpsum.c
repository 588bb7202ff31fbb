/* Differential oracle for the plp_summary text dump: builds plp_col_t
 * columns from a stdin spec and calls the REFERENCE's own plp_summary
 * (lofreq_call.c:438-599), linked unmodified.  Output is compared
 * byte-for-byte with lofreq_tpu.pipelines.plp_summary.
 *
 * Spec (whitespace-separated):
 *   CONF <use_baq> <use_sq>
 *   COL <target> <pos0> <ref_base> <cons_base> <heads> <tails>
 *       <num_ins> <num_dels> <hrun>
 *   FW c0..c4 / RV c0..c4
 *   NT <i> <n> <bq...> <baq...> <mq...> <sq...>
 *   INQ <n> <vals...>   INM <n> <vals...>     (non-ins pools)
 *   DNQ <n> <vals...>   DNM <n> <vals...>     (non-del pools)
 *   IEV <key> <n> <q...> <aq...> <mq...> <sq...>
 *   DEV <key> <n> <q...> <aq...> <mq...> <sq...>
 *   ENDCOL
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "plp.h"
#include "snpcaller.h"
#include "utils.h"

void plp_summary(const plp_col_t *plp_col, void *confp);

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

    while (scanf("%255s", tok) == 1) {
        if (!strcmp(tok, "CONF")) {
            int ub, us;
            if (scanf("%d %d", &ub, &us) != 2) return 2;
            conf.flag = 0;
            if (ub) conf.flag |= VARCALL_USE_BAQ;
            if (us) conf.flag |= VARCALL_USE_SQ;
        } else if (!strcmp(tok, "COL")) {
            memset(&col, 0, sizeof(col));
            inited = 1;
            static char target[256];
            if (scanf("%255s %d %c %s %d %d %d %d %d", target, &col.pos,
                      &col.ref_base, col.cons_base, &col.num_heads,
                      &col.num_tails, &col.num_ins, &col.num_dels,
                      &col.hrun) != 9)
                return 2;
            col.target = target;
            for (int i = 0; i < NUM_NT4; i++) {
                int_varray_init(&col.base_quals[i], 0);
                int_varray_init(&col.baq_quals[i], 0);
                int_varray_init(&col.map_quals[i], 0);
                int_varray_init(&col.source_quals[i], 0);
            }
            int_varray_init(&col.ins_quals, 0);
            int_varray_init(&col.ins_map_quals, 0);
            int_varray_init(&col.del_quals, 0);
            int_varray_init(&col.del_map_quals, 0);
        } else if (!strcmp(tok, "FW")) {
            for (int i = 0; i < NUM_NT4; i++)
                if (scanf("%lu", &col.fw_counts[i]) != 1) return 2;
        } else if (!strcmp(tok, "RV")) {
            for (int i = 0; i < NUM_NT4; i++)
                if (scanf("%lu", &col.rv_counts[i]) != 1) return 2;
        } else if (!strcmp(tok, "NT")) {
            int i, n;
            if (scanf("%d %d", &i, &n) != 2) return 2;
            read_vals(&col.base_quals[i], n);
            read_vals(&col.baq_quals[i], n);
            read_vals(&col.map_quals[i], n);
            read_vals(&col.source_quals[i], n);
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
            int *q = malloc(4 * n * sizeof(int));
            for (int j = 0; j < 4 * n; j++)
                if (scanf("%d", &q[j]) != 1) return 2;
            for (int j = 0; j < n; j++) {
                if (is_ins)
                    add_ins_sequence(&col.ins_event_counts, key, q[j],
                                     q[n + j], q[2 * n + j], q[3 * n + j],
                                     0);
                else
                    add_del_sequence(&col.del_event_counts, key, q[j],
                                     q[n + j], q[2 * n + j], q[3 * n + j],
                                     0);
            }
            free(q);
        } else if (!strcmp(tok, "ENDCOL")) {
            if (!inited) return 2;
            plp_summary(&col, &conf);
        } else {
            fprintf(stderr, "bad token %s\n", tok);
            return 2;
        }
    }
    return 0;
}
