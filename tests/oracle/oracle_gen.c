/* Golden-value generator for the Poisson-binomial DP tests.
 *
 * Links against the *reference* implementation (read-only at
 * /root/reference) to dump high-precision p-values and DP cells for a list
 * of test cases.  The resulting golden file (tests/golden/poissbin.json) is
 * committed so the test suite never needs the reference at runtime.
 *
 * Input (stdin), one case per line:
 *   N K bonf sig p1 ... pN
 * Output, one line per case:
 *   pvalue_hex cells(K+1 hex doubles, space separated)
 *
 * Build (see tests/oracle/gen_golden.sh):
 *   gcc -std=gnu99 -O2 -o oracle_gen oracle_gen.c snpcaller.o utils.o log.o
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

double *poissbin(long double *pvalue, const double *err_probs,
                 const int num_err_probs, const int num_failures,
                 const long long int bonf, const double sig);

int main(void)
{
    char *line = NULL;
    size_t cap = 0;

    while (getline(&line, &cap, stdin) > 0) {
        int n, k;
        double bonf, sig;
        char *p = line;
        char *end;
        n = (int)strtol(p, &end, 10); p = end;
        k = (int)strtol(p, &end, 10); p = end;
        bonf = strtod(p, &end); p = end;
        sig = strtod(p, &end); p = end;
        double *probs = malloc(n * sizeof(double));
        for (int i = 0; i < n; i++) {
            probs[i] = strtod(p, &end);
            p = end;
        }
        long double pv;
        double *probvec = poissbin(&pv, probs, n, k, (long long)bonf, sig);
        printf("%.21Le", pv);
        for (int i = 0; i <= k; i++) {
            printf(" %a", probvec[i]);
        }
        printf("\n");
        free(probvec);
        free(probs);
    }
    free(line);
    return 0;
}
