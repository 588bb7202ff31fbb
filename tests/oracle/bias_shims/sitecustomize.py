"""Pin scipy.stats.mannwhitneyu to the 2013-era semantics the
reference shipped against (scipy<0.17: one-sided asymptotic p with
continuity correction, tuple return).  lofreq2_bias.py calls it only
under a mean(alt) < mean(ref) guard (lofreq2_bias.py:268-284), so the
one-sided direction is 'ref greater'.  Patching the function (not
shadowing the scipy package) keeps lofreq_star.utils' real
scipy.stats.chi2 import intact."""

# pre-import the lofreq_star shim package: the script's lofreq2_local
# prepends the real (python-2-only) package's parent to sys.path, so
# sys.modules must already hold the py3 loader by then
import lofreq_star  # noqa: F401

import scipy.stats as _ss

_real = _ss.mannwhitneyu


def mannwhitneyu(x, y, use_continuity=True):
    r = _real(x, y, alternative="greater", use_continuity=use_continuity,
              method="asymptotic")
    return (float(r.statistic), float(r.pvalue))


_ss.mannwhitneyu = mannwhitneyu
