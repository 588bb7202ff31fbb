#!/bin/bash
# Run the native-heavy tests with the C library built under
# AddressSanitizer (the reference's valgrind_*.sh analog; SURVEY §4).
# Usage: tests/run_asan.sh [extra pytest args]
set -e
cd "$(dirname "$0")/.."
BUILD=$(mktemp -d)
gcc -O1 -g -march=native -ffp-contract=off -fsanitize=address \
    -shared -fPIC -o "$BUILD/liblofreq_native.so" csrc/*.c -lm -lpthread -lz
LIBASAN=$(gcc -print-file-name=libasan.so)
LD_PRELOAD="$LIBASAN" ASAN_OPTIONS=detect_leaks=0 python - "$@" <<EOF
import ctypes, sys
sys.path.insert(0, ".")
import lofreq_tpu._native_build as nb
def patched():
    if nb._lib is None:
        nb._lib = ctypes.CDLL("$BUILD/liblofreq_native.so")
    return nb._lib
nb.get_native_lib = patched
import pytest
sys.exit(pytest.main(["-q", "tests/test_baq_x4.py", "tests/test_baq.py",
                      "tests/test_viterbi.py", "tests/test_poissbin.py",
                      "tests/test_native_ingest.py",
                      "tests/test_native_bgzf.py",
                      "tests/test_prescreen_bound.py",
                      "tests/test_fused_ingest.py",
                      "-p", "no:cacheprovider"] + sys.argv[1:]))
EOF
