/* Golden-value generator for BAQ/IDAQ: builds bam1_t records by hand and
 * runs the reference's bam_prob_realn_core_ext.
 *
 * Input (stdin), tab-separated per line:
 *   ref  pos  cigar  seq  qual+33  ext_baq(0|1)
 * Output per line:  lb_tag  ai_tag  ad_tag   ('-' if absent)
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include "htslib/sam.h"

int bam_prob_realn_core_ext(bam1_t *b, const char *ref,
                            int baq_flag, int baq_extended, int idaq_flag);

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
    char ref[65536], cigar_s[4096], seq[65536], qual_s[65536];
    long pos;
    int ext;
    while (scanf("%s %ld %s %s %s %d", ref, &pos, cigar_s, seq, qual_s,
                 &ext) == 6) {
        uint32_t cigar[1024];
        int n_cigar = parse_cigar(cigar_s, cigar);
        int l_qseq = strlen(seq);
        bam1_t *b = calloc(1, sizeof(bam1_t));
        b->core.tid = 0;
        b->core.pos = pos;
        b->core.l_qname = 2;
        b->core.flag = 0;
        b->core.n_cigar = n_cigar;
        b->core.l_qseq = l_qseq;
        int datalen = 2 + 4 * n_cigar + (l_qseq + 1) / 2 + l_qseq;
        b->m_data = datalen + 1024;
        b->data = calloc(b->m_data, 1);
        b->l_data = datalen;
        b->data[0] = 'r';
        b->data[1] = 0;
        memcpy(b->data + 2, cigar, 4 * n_cigar);
        uint8_t *sp = bam_get_seq(b);
        (void)seq_nt16_table; /* force init */
        for (int i = 0; i < l_qseq; i++) {
            uint8_t c = seq_nt16_table_storage[(unsigned char)seq[i]];
            sp[i >> 1] |= c << ((~i & 1) << 2);
        }
        uint8_t *qp = bam_get_qual(b);
        for (int i = 0; i < l_qseq; i++)
            qp[i] = qual_s[i] - 33;

        bam_prob_realn_core_ext(b, ref, 1, ext, 1);

        uint8_t *lb = bam_aux_get(b, "lb");
        uint8_t *ai = bam_aux_get(b, "ai");
        uint8_t *ad = bam_aux_get(b, "ad");
        printf("%s\t%s\t%s\n",
               lb ? (char *)lb + 1 : "-",
               ai ? (char *)ai + 1 : "-",
               ad ? (char *)ad + 1 : "-");
        free(b->data);
        free(b);
    }
    return 0;
}
