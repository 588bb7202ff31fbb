/* Single-core reference-C timing driver: the vs_baseline denominator.
 *
 * Links the reference's OWN kernels (read-only checkout at
 * /root/reference) and times the two stages that dominate its
 * single-core `call` wall-clock on a BAQ-on SNV run:
 *
 *   1. per-read BAQ: bam_prob_realn_core_ext (bam_md_ext.c:260 ->
 *      kprobaln_ext.c) over fabricated bam1_t records, the oracle_baq.c
 *      pattern;
 *   2. per-column stats: plp_to_errprobs (snpcaller.c:345) + the
 *      ascending qsort (lofreq_call.c:784) + snpcaller
 *      (snpcaller.c:1074) over synthetic plp_col_t columns with the
 *      same shape as tests/simulate_fast.py output (bq uniform 28..38,
 *      per-quality error sampling, mq 50) under a growing dynamic-
 *      Bonferroni ladder.
 *
 * The resulting reference cols/s = 1 / (t_col + (depth/readlen)*t_baq)
 * is a LOWER BOUND on the reference's real per-column cost (it excludes
 * BAM decode, htslib pileup construction and VCF writing), so ratios
 * derived from it understate the speedup.
 *
 * Usage: bench_ref <depth> <readlen> <genome_for_bonf> [iters]
 * Output: one JSON line {"t_col_us":..,"t_baq_us":..,"ref_cols_per_sec":..}
 *
 * Build: tests/oracle/build_bench_ref.sh
 */
#include <float.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

#include "htslib/sam.h"
#include "snpcaller.h"
#include "utils.h"

const char *bam_nt4_rev_table = "ACGTN";
const unsigned char bam_nt4_table[256] = {
    ['A'] = 0, ['C'] = 1, ['G'] = 2, ['T'] = 3,
};

int bam_prob_realn_core_ext(bam1_t *b, const char *ref,
                            int baq_flag, int baq_extended, int idaq_flag);

/* xorshift64: deterministic workload without libc rand state effects */
static uint64_t rng_state = 0x9e3779b97f4a7c15ull;
static uint64_t xrand(void)
{
    uint64_t x = rng_state;
    x ^= x << 13; x ^= x >> 7; x ^= x << 17;
    return rng_state = x;
}
static double frand(void) { return (double)(xrand() >> 11) / 9007199254740992.0; }

static double now_s(void)
{
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec + 1e-9 * ts.tv_nsec;
}

static const char NTS[4] = {'A', 'C', 'G', 'T'};

/* one synthetic column at given depth; simulate_fast error model */
static void fill_col(plp_col_t *col, int depth)
{
    memset(col, 0, sizeof *col);
    int ref_i = (int)(xrand() & 3);
    col->ref_base = bam_nt4_rev_table[ref_i];
    for (int i = 0; i < 4; i++) {
        int_varray_init(&col->base_quals[i], 0);
        int_varray_init(&col->baq_quals[i], 0);
        int_varray_init(&col->map_quals[i], 0);
        int_varray_init(&col->source_quals[i], 0);
    }
    for (int j = 0; j < depth; j++) {
        int q = 28 + (int)(xrand() % 11);
        int idx = ref_i;
        if (frand() < pow(10.0, -q / 10.0))
            idx = (ref_i + 1 + (int)(xrand() % 3)) & 3;
        int_varray_add_value(&col->base_quals[idx], q);
        /* BAQ-on default run: cap at min(bq, baq); give most bases a
         * near-bq BAQ like real data */
        int_varray_add_value(&col->baq_quals[idx],
                             q - (int)(xrand() % 3));
        int_varray_add_value(&col->map_quals[idx], 50);
        int_varray_add_value(&col->source_quals[idx], -1);
    }
    col->coverage_plp = depth;
    col->num_bases = depth;
}

static void free_col(plp_col_t *col)
{
    for (int i = 0; i < 4; i++) {
        int_varray_free(&col->base_quals[i]);
        int_varray_free(&col->baq_quals[i]);
        int_varray_free(&col->map_quals[i]);
        int_varray_free(&col->source_quals[i]);
    }
}

/* fabricated bam1_t (the oracle_baq.c pattern): readlen M bases starting
 * at pos on ref, per-quality errors */
static bam1_t *make_read(const char *ref, long pos, int L)
{
    bam1_t *b = calloc(1, sizeof(bam1_t));
    b->core.tid = 0;
    b->core.pos = pos;
    b->core.l_qname = 2;
    b->core.n_cigar = 1;
    b->core.l_qseq = L;
    int datalen = 2 + 4 + (L + 1) / 2 + L;
    b->m_data = datalen + 1024;
    b->data = calloc(b->m_data, 1);
    b->l_data = datalen;
    b->data[0] = 'r';
    uint32_t cig = (uint32_t)L << 4; /* M */
    memcpy(b->data + 2, &cig, 4);
    uint8_t *sp = bam_get_seq(b);
    uint8_t *qp = bam_get_qual(b);
    for (int i = 0; i < L; i++) {
        int q = 28 + (int)(xrand() % 11);
        char nt = ref[pos + i];
        if (frand() < pow(10.0, -q / 10.0))
            nt = NTS[(xrand() & 3)];
        uint8_t c = seq_nt16_table_storage[(unsigned char)nt];
        sp[i >> 1] |= c << ((~i & 1) << 2);
        qp[i] = q;
    }
    return b;
}

int main(int argc, char **argv)
{
    int depth = argc > 1 ? atoi(argv[1]) : 800;
    int L = argc > 2 ? atoi(argv[2]) : 100;
    long genome = argc > 3 ? atol(argv[3]) : 200000;
    int iters = argc > 4 ? atoi(argv[4]) : 2000;

    /* ---- per-read BAQ (SNV default: baq on, extended, no idaq) ---- */
    int nreads = iters;
    char *ref = malloc(4096 + L);
    for (int i = 0; i < 4096 + L; i++)
        ref[i] = NTS[xrand() & 3];
    bam1_t **reads = malloc(nreads * sizeof(bam1_t *));
    for (int i = 0; i < nreads; i++)
        reads[i] = make_read(ref, (long)(xrand() % 4096), L);
    double t0 = now_s();
    for (int i = 0; i < nreads; i++)
        bam_prob_realn_core_ext(reads[i], ref, 1, 1, 0);
    double t_baq_us = (now_s() - t0) / nreads * 1e6;
    for (int i = 0; i < nreads; i++) {
        free(reads[i]->data);
        free(reads[i]);
    }
    free(reads);
    free(ref);

    /* ---- per-column stats under a growing dyn-bonf ladder ---- */
    varcall_conf_t conf;
    memset(&conf, 0, sizeof conf);
    conf.min_bq = 6;        /* DEFAULT_MIN_BQ */
    conf.min_alt_bq = 6;    /* DEFAULT_MIN_ALT_BQ */
    conf.def_alt_bq = 0;    /* DEFAULT_DEF_ALT_BQ: keep original */
    conf.min_jq = 0;
    conf.min_alt_jq = 0;
    conf.def_alt_jq = 0;
    conf.sig = 0.01;        /* DEFAULT_SIG */
    conf.flag = VARCALL_USE_BAQ | VARCALL_USE_MQ;
    conf.approx_threshold_n = -1;

    plp_col_t *cols = malloc(iters * sizeof(plp_col_t));
    for (int i = 0; i < iters; i++)
        fill_col(&cols[i], depth);
    /* dynamic bonf: the ladder the reference's -b dynamic accumulates
     * over a genome of this size (3 tests per tested column) */
    t0 = now_s();
    volatile long double sink = 0;
    for (int i = 0; i < iters; i++) {
        long long bonf = 1 + (long long)(3.0 * genome *
                                         ((double)i / iters));
        double *err_probs;
        int num_err_probs;
        int alt_bases[NUM_NONCONS_BASES], alt_counts[NUM_NONCONS_BASES];
        int alt_raw_counts[NUM_NONCONS_BASES];
        plp_to_errprobs(&err_probs, &num_err_probs, alt_bases, alt_counts,
                        alt_raw_counts, &cols[i], &conf);
        qsort(err_probs, num_err_probs, sizeof(double), dbl_cmp);
        long double pvalues[NUM_NONCONS_BASES] =
            {LDBL_MAX, LDBL_MAX, LDBL_MAX};
        int got_alt = alt_counts[0] || alt_counts[1] || alt_counts[2];
        if (got_alt)
            snpcaller(pvalues, err_probs, num_err_probs, alt_counts,
                      bonf, conf.sig, conf.approx_threshold_n);
        sink += pvalues[0];
        free(err_probs);
    }
    double t_col_us = (now_s() - t0) / iters * 1e6;
    (void)sink;
    for (int i = 0; i < iters; i++)
        free_col(&cols[i]);
    free(cols);

    double per_col_us = t_col_us + ((double)depth / L) * t_baq_us;
    printf("{\"t_col_us\": %.3f, \"t_baq_us\": %.3f, "
           "\"ref_cols_per_sec\": %.1f}\n",
           t_col_us, t_baq_us, 1e6 / per_col_us);
    return 0;
}
