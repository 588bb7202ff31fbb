/* realign.c — per-read Viterbi realignment for misplaced indels.
 *
 * Native batch implementation of the reference's realigner
 * (see /root/reference/src/lofreq/viterbi.c:99 and lofreq_viterbi.c:107 for
 * the original per-read formulation).  A 3-state (M/I/D) log10 Viterbi over
 * query x windowed-reference with transitions alpha=1e-5, beta=0.4,
 * gamma=1/(2L); Q2 base qualities are replaced by a caller-provided default
 * (median of non-Q2 quals); traceback is left-aligned.
 *
 * Build: gcc -O2 -shared -fPIC -o liblofreq_realign.so realign.c -lm
 */

#include <limits.h>
#include <math.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

static inline double q2p_sanger(int c)
{
    return pow(10.0, -0.1 * (c - 33));
}

static int argmax_first(const double *a, int n)
{
    int m = 0;
    for (int i = 0; i < n; i++)
        if (a[i] > a[m])
            m = i;
    return m;
}

/* Shift indels to the leftmost equivalent placement; writes M/I/D chars to
 * state_out (viterbi.c:48-96 semantics). */
static void left_align(char *ref, char *query, int slen, char *state_out)
{
    int i = 0;
    while (i < slen - 1) {
        if (ref[i] != '*' && query[i] != '*') {
            if (ref[i + 1] == '*') {
                int ilen = 0;
                while (ref[i + 1 + ilen] == '*')
                    ilen++;
                if (query[i + ilen] == ref[i]) {
                    ref[i + ilen] = ref[i];
                    ref[i] = '*';
                    i--;
                    continue;
                }
            } else if (query[i + 1] == '*') {
                int dlen = 0;
                while (query[i + 1 + dlen] == '*')
                    dlen++;
                if (query[i] == ref[i + dlen]) {
                    query[i + dlen] = query[i];
                    query[i] = '*';
                    i--;
                    continue;
                }
            }
        }
        i++;
    }
    for (i = 0; i < slen; i++) {
        if (ref[i] == '*')
            state_out[i] = 'I';
        else if (query[i] == '*')
            state_out[i] = 'D';
        else
            state_out[i] = 'M';
    }
    state_out[slen] = '\0';
}

/* One read: returns the traceback start offset k within ref (the reference
 * shift), writes the left-aligned M/I/D state string into aln (caller
 * allocates >= qlen+rlen+2).  bqual is sanger-encoded (phred+33).
 * Returns INT_MIN on internal error. */
int lfq_viterbi_one(const char *ref_win, const char *query,
                    const char *bqual, int q2default, char *aln)
{
    int qlen = (int)strlen(query) + 1;
    int rlen = (int)strlen(ref_win) + 1;
    double alpha = 0.00001, beta = 0.4;
    double L = (double)rlen;
    double gamma = 1 / (2. * L);
    double ep_ins = log10(.25);
    double tp[5][5] = {{0}};

    tp[0][0] = log10((1 - 2 * alpha) * (1 - gamma));
    tp[0][1] = log10(alpha * (1 - gamma));
    tp[0][2] = log10(alpha * (1 - gamma));
    tp[0][4] = log10(gamma);
    tp[1][0] = log10((1 - beta) * (1 - gamma));
    tp[1][1] = log10(beta * (1 - gamma));
    tp[1][4] = log10(gamma);
    tp[2][0] = log10(1 - beta);
    tp[2][2] = log10(beta);
    tp[3][0] = log10((1 - alpha) / L);
    tp[3][1] = log10(alpha / L);

    double *vs = malloc(qlen * sizeof(double));
    double **vm = malloc(rlen * sizeof(double *));
    double **vi = malloc(rlen * sizeof(double *));
    double **vd = malloc(rlen * sizeof(double *));
    char **pm = malloc(rlen * sizeof(char *));
    char **pi = malloc(rlen * sizeof(char *));
    char **pdl = malloc(rlen * sizeof(char *));
    for (int k = 0; k < rlen; k++) {
        vm[k] = calloc(qlen, sizeof(double));
        vi[k] = calloc(qlen, sizeof(double));
        vd[k] = calloc(qlen, sizeof(double));
        pm[k] = calloc(qlen, 1);
        pi[k] = calloc(qlen, 1);
        pdl[k] = calloc(qlen, 1);
    }
    for (int i = 0; i < qlen; i++)
        vs[i] = INT_MIN;
    for (int k = 0; k < rlen; k++)
        vm[k][0] = vi[k][0] = vd[k][0] = INT_MIN;
    for (int i = 0; i < qlen; i++)
        vm[0][i] = vi[0][i] = vd[0][i] = INT_MIN;
    vs[0] = 0;

    for (int i = 1; i < qlen; i++) {
        double bp;
        if ((bqual[i - 1] - 33) == 2)
            bp = pow(10.0, -0.1 * q2default);
        else
            bp = q2p_sanger((int)bqual[i - 1]);
        double ep_match = log10(1 - bp);
        double ep_match_not = log10(bp / 3.);
        for (int k = 1; k < rlen; k++) {
            double mterms[4] = {
                vs[i - 1] + tp[3][0],
                vm[k - 1][i - 1] + tp[0][0],
                vi[k - 1][i - 1] + tp[1][0],
                vd[k - 1][i - 1] + tp[2][0],
            };
            int idx = argmax_first(mterms, 4);
            pm[k][i] = "SMID"[idx];
            if (query[i - 1] == ref_win[k - 1])
                vm[k][i] = ep_match + mterms[idx];
            else
                vm[k][i] = ep_match_not + mterms[idx];

            double iterms[3] = {
                vs[i - 1] + tp[3][1],
                vm[k][i - 1] + tp[0][1],
                vi[k][i - 1] + tp[1][1],
            };
            idx = argmax_first(iterms, 3);
            pi[k][i] = "SMI"[idx];
            vi[k][i] = ep_ins + iterms[idx];

            double dterms[2] = {
                vm[k - 1][i] + tp[0][2],
                vd[k - 1][i] + tp[2][2],
            };
            idx = argmax_first(dterms, 2);
            pdl[k][i] = "MD"[idx];
            vd[k][i] = dterms[idx];
        }
    }

    char end_state = '!';
    double best_score = INT_MIN;
    int best_index = 0;
    for (int k = 0; k < rlen; k++) {
        if (vm[k][qlen - 1] > best_score) {
            end_state = 'M';
            best_score = vm[k][qlen - 1];
            best_index = k;
        }
        if (vi[k][qlen - 1] > best_score) {
            end_state = 'I';
            best_score = vi[k][qlen - 1];
            best_index = k;
        }
    }
    for (int k = 0; k < rlen; k++) {
        free(vm[k]); free(vi[k]); free(vd[k]);
    }
    free(vm); free(vi); free(vd); free(vs);

    int i = qlen - 1;
    int k = best_index;
    int maxslen = qlen + rlen;
    char current = end_state;
    char *t_state = malloc(maxslen);
    char *t_ref = malloc(maxslen);
    char *t_query = malloc(maxslen);
    t_state[maxslen - 1] = t_ref[maxslen - 1] = t_query[maxslen - 1] = '\0';
    int si = maxslen - 2;
    int err = 0;
    while (i != 0 && k != 0) {
        t_state[si] = current;
        if (current == 'S') {
            break;
        } else if (current == 'M') {
            t_ref[si] = ref_win[k - 1];
            t_query[si] = query[i - 1];
            current = pm[k][i];
            i -= 1;
            k -= 1;
        } else if (current == 'I') {
            t_ref[si] = '*';
            t_query[si] = query[i - 1];
            current = pi[k][i];
            i -= 1;
        } else if (current == 'D') {
            t_ref[si] = ref_win[k - 1];
            t_query[si] = '*';
            current = pdl[k][i];
            k -= 1;
        } else {
            err = 1;
            break;
        }
        si--;
    }
    for (int kk = 0; kk < rlen; kk++) {
        free(pm[kk]); free(pi[kk]); free(pdl[kk]);
    }
    free(pm); free(pi); free(pdl);
    if (err) {
        free(t_state); free(t_ref); free(t_query);
        return INT_MIN;
    }
    int slen = maxslen - 2 - si;
    left_align(t_ref + si + 1, t_query + si + 1, slen, aln);
    free(t_state); free(t_ref); free(t_query);
    return k;
}
