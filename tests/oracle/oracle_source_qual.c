/* Differential oracle for the reference's per-read source quality:
 * fabricates bam1_t records (the oracle_baq.c pattern) and calls the
 * REFERENCE's own source_qual (plp.c:428-593) linked unmodified —
 * covering count_cigar_ops (samutils.c:437-614) with min_bq filtering
 * and the -S ign-variant list, the category-grouped err-prob emission,
 * the eps-comparator qsort, the nonmatch-1 poissbin at bonf=1/sig=0.05
 * with early exit, and the final phred of the complement.
 *
 * Input (stdin), one case:
 *   CASE <def_nm_q> <min_bq> <nign> [ignpos0...]   (0-based ign positions)
 *   REF <refseq>
 *   NREADS <n>
 *   READ <pos> <cigar> <seq> <qual+33>
 *   ...
 * Output: one line per read: <sq>
 *
 * NB '='(CEQUAL) ops are excluded from cases: the reference's
 * count_cigar_ops drops into the unhandled-op branch for them and then
 * aborts on its qpos==qlen assert (see tests/test_eq_cigar.py for the
 * repo's documented parity treatment).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <unistd.h>

#include "htslib/sam.h"

int source_qual(const bam1_t *b, const char *ref, const int nonmatch_qual,
                char *target, int min_bq);
int source_qual_load_ign_vcf(const char *vcf_path, void *bed);
void source_qual_free_ign_vars(void);

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

int main(void)
{
    char tok[64], refseq[8192];
    char tmpvcf[] = "/tmp/oracle_sq_ign_XXXXXX";
    int tmpfd = mkstemp(tmpvcf);
    if (tmpfd < 0)
        return 3;
    close(tmpfd);

    while (scanf("%63s", tok) == 1) {
        if (strcmp(tok, "CASE"))
            return 2;
        int def_nm_q, min_bq, nign;
        if (scanf("%d %d %d", &def_nm_q, &min_bq, &nign) != 3)
            return 2;
        int use_ign = nign > 0;
        if (use_ign) {
            FILE *fh = fopen(tmpvcf, "w");
            fprintf(fh, "##fileformat=VCFv4.0\n"
                    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n");
            for (int i = 0; i < nign; i++) {
                long p;
                if (scanf("%ld", &p) != 1)
                    return 2;
                fprintf(fh, "t\t%ld\t.\tA\tC\t.\tPASS\t.\n", p + 1);
            }
            fclose(fh);
            if (source_qual_load_ign_vcf(tmpvcf, NULL))
                return 4;
        }
        if (scanf("%63s %8191s", tok, refseq) != 2 || strcmp(tok, "REF"))
            return 2;
        int n;
        if (scanf("%63s %d", tok, &n) != 2 || strcmp(tok, "NREADS"))
            return 2;
        for (int i = 0; i < n; i++) {
            long pos;
            char cigar_s[512], seq[4096], qual_s[4096];
            if (scanf("%63s %ld %511s %4095s %4095s", tok, &pos, cigar_s,
                      seq, qual_s) != 5 || strcmp(tok, "READ"))
                return 2;
            uint32_t cigar[256];
            int n_cigar = parse_cigar(cigar_s, cigar);
            int l_qseq = (int)strlen(seq);
            bam1_t *b = calloc(1, sizeof(bam1_t));
            b->core.tid = 0;
            b->core.pos = pos;
            b->core.l_qname = 2;
            b->core.n_cigar = n_cigar;
            b->core.l_qseq = l_qseq;
            int datalen = 2 + 4 * n_cigar + (l_qseq + 1) / 2 + l_qseq;
            b->m_data = datalen + 64;
            b->data = calloc(b->m_data, 1);
            b->l_data = datalen;
            b->data[0] = 'r';
            memcpy(b->data + 2, cigar, 4 * n_cigar);
            uint8_t *sp = bam_get_seq(b);
            (void)seq_nt16_table;
            for (int j = 0; j < l_qseq; j++) {
                uint8_t c =
                    seq_nt16_table_storage[(unsigned char)seq[j]];
                sp[j >> 1] |= c << ((~j & 1) << 2);
            }
            uint8_t *qp = bam_get_qual(b);
            for (int j = 0; j < l_qseq; j++)
                qp[j] = qual_s[j] - 33;
            int sq = source_qual(b, refseq, def_nm_q,
                                 use_ign ? "t" : NULL, min_bq);
            printf("%d\n", sq);
            free(b->data);
            free(b);
        }
        if (use_ign)
            source_qual_free_ign_vars();
    }
    unlink(tmpvcf);
    return 0;
}
