/* Golden-value generator for the Viterbi realigner: runs the reference's
 * viterbi() on (ref_window, query, bqual) triples from stdin.
 * Input per line:  ref_win  query  bqual(sanger)  q2default
 * Output per line: shift  aln_state_string
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

int viterbi(char *ref, char *query, char *bqual, char *aln, int quality);

int main(void)
{
    char ref[8192], query[8192], bqual[8192];
    int q2def;
    while (scanf("%s %s %s %d", ref, query, bqual, &q2def) == 4) {
        char *aln = calloc(2 * (strlen(query) + strlen(ref)) + 2, 1);
        int shift = viterbi(ref, query, bqual, aln, q2def);
        printf("%d\t%s\n", shift, aln);
        free(aln);
    }
    return 0;
}
