#!/bin/bash
# Regenerate tests/golden/call_e2e.json: whole-subcommand differential
# golden from the reference's own main_call (lofreq_call.c:1006), linked
# unmodified over the in-memory sam/pileup shim (oracle_call_e2e.c) and
# driven file-to-file on fuzzed BAMs x argument sets, including the
# intercepted system("lofreq filter ...") auto-filter chain.
# Requires the reference checkout at /root/reference (read-only).
set -euo pipefail
cd "$(dirname "$0")"
REF=/root/reference/src/lofreq
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

mkdir -p "$TMP/htslib"
cat > "$TMP/htslib/bgzf.h" <<'HEOF'
#ifndef STUB_BGZF_H
#define STUB_BGZF_H
#include <stdlib.h>
#include <sys/types.h>
#include "htslib/kstring.h"
typedef struct BGZF BGZF;
static BGZF *bgzf_open(const char *path, const char *mode) { abort(); }
static int bgzf_close(BGZF *fp) { abort(); }
static int bgzf_flush(BGZF *fp) { abort(); }
static int bgzf_getline(BGZF *fp, int delim, kstring_t *str) { abort(); }
static int64_t bgzf_seek(BGZF *fp, int64_t pos, int whence) { abort(); }
static ssize_t bgzf_write(BGZF *fp, const void *data, size_t length)
    { abort(); }
#endif
HEOF
echo "/* empty */" > "$TMP/htslib/kseq.h"
cat > "$TMP/htslib/tbx.h" <<'HEOF'
#include <stdlib.h>
typedef struct tbx_conf_t_ { int dummy; } tbx_conf_t;
static const tbx_conf_t tbx_conf_vcf;
static int tbx_index_build(const char *fn, int min_shift,
                           const tbx_conf_t *conf) { abort(); }
HEOF

gcc -std=gnu99 -O2 -DNDEBUG -DMINI_HTS_NO_IO_STUBS \
    -o "$TMP/oracle_call_e2e" oracle_call_e2e.c \
    "$REF/lofreq_call.c" "$REF/lofreq_filter.c" "$REF/plp.c" \
    "$REF/vcf.c" "$REF/samutils.c" "$REF/snpcaller.c" \
    "$REF/bam_md_ext.c" "$REF/kprobaln_ext.c" "$REF/multtest.c" \
    "$REF/fet.c" "$REF/utils.c" "$REF/log.c" \
    -Imini_hts -I"$TMP" -I/root/reference/src/uthash -I"$REF" -lm \
    2> "$TMP/err" || { cat "$TMP/err"; exit 1; }

python3 gen_call_e2e_cases.py --run "$TMP/oracle_call_e2e" \
    ../golden/call_e2e.json
