"""lofreq_star shim: the reference package __init__ asserts python 2.7
(lofreq_star/__init__.py:2), so load the module FILES directly — the
modules themselves are py3-clean and are run UNMODIFIED (the same
bypass the tools differential uses, tests/oracle/gen_tools_cases.py)."""

import importlib.util
import os
import sys

_REF = "/root/reference/src/tools/lofreq_star"


def _load(name, fname):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_REF, fname))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


utils = _load("lofreq_star.utils", "utils.py")
multiple_testing = _load("lofreq_star.multiple_testing",
                         "multiple_testing.py")
fdr = _load("lofreq_star.fdr", "fdr.py")
