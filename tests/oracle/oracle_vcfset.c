/* Differential oracle for the reference's vcfset subcommand: wraps
 * lofreq_vcfset.c's main_vcfset unmodified.  The tabix layer is a
 * test-harness shim over PLAIN-TEXT vcf2 (tbx_shim below): the
 * reference's own match loop re-checks exact positions after the
 * iterator (lofreq_vcfset.c:451 "make sure actual position matches"),
 * so exact-position candidates reproduce production behavior.
 *
 * Usage: oracle_vcfset <vcfset args...>
 */
#include <stdlib.h>

int main_vcfset(int argc, char *argv[]);

int main(int argc, char **argv)
{
    char **av = malloc((argc + 2) * sizeof(char *));
    av[0] = "lofreq";
    av[1] = "vcfset";
    for (int i = 1; i < argc; i++)
        av[i + 1] = argv[i];
    av[argc + 1] = 0;
    return main_vcfset(argc + 1, av);
}
