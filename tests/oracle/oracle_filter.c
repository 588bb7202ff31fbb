/* Differential oracle for the reference's ENTIRE filter subsystem:
 * wraps lofreq_filter.c's main_filter (lofreq_filter.c:861-1334),
 * linked unmodified — covering VCF parse/re-emit, FILTER header
 * registration, cov/af/sb/qual threshold filters, the two-pass
 * multiple-testing machinery (bonf/holm/fdr via multtest.c), compound
 * strand-bias handling, defaults, and the only-passed emission rule.
 *
 * Usage: oracle_filter <filter args...>   (e.g. -i in.vcf -o out.vcf -b fdr)
 */
#include <stdlib.h>

int main_filter(int argc, char *argv[]);

int main(int argc, char **argv)
{
    /* main_filter's getopt skips two leading slots ("lofreq filter") */
    char **av = malloc((argc + 2) * sizeof(char *));
    av[0] = "lofreq";
    av[1] = "filter";
    for (int i = 1; i < argc; i++)
        av[i + 1] = argv[i];
    av[argc + 1] = 0;
    return main_filter(argc + 1, av);
}
