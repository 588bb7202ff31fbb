#!/bin/bash
# Regenerate tests/golden/plpsum.json: differential golden from the
# reference's own plp_summary (lofreq_call.c:438-599), linked unmodified.
# Requires the reference checkout at /root/reference (read-only).
set -euo pipefail
cd "$(dirname "$0")"
REF=/root/reference/src/lofreq
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

mkdir -p "$TMP/htslib"
cat > "$TMP/htslib/bgzf.h" <<'HEOF'
typedef struct BGZF BGZF;
HEOF
cat > "$TMP/htslib/faidx.h" <<'HEOF'
typedef struct faidx_t faidx_t;
HEOF
cat > "$TMP/htslib/sam.h" <<'HEOF'
#include <stdint.h>
typedef struct bam1_t bam1_t;
typedef struct bam_hdr_t bam_hdr_t;
typedef struct samFile samFile;
HEOF
cat > "$TMP/htslib/kstring.h" <<'HEOF'
typedef struct kstring_t kstring_t;
HEOF
# stubs for lofreq_call.c's link deps outside the plp_summary path
cat > "$TMP/stubs.c" <<'HEOF'
#include <stdlib.h>
const char *bam_nt4_rev_table = "ACGTN";
const unsigned char bam_nt4_table[256] = {0};
int mpileup(const void *a, int (*b)(void*, const void*), void *c,
            const int d, const char **e) { abort(); }
void *bed_read(const char *fn) { abort(); }
void bed_destroy(void *h) { abort(); }
int bed_overlap(const void *h, const char *c, int b, int e) { abort(); }
/* vcf.c needs real htslib (kseq/bgzf); plp_summary never touches it */
int vcf_file_open(void *f, const char *p, int g, char m) { abort(); }
int vcf_file_close(void *f) { abort(); }
int vcf_file_seek(void *f, long o, int w) { abort(); }
int vcf_write_new_header(void *f, const char *s, const char *r) { abort(); }
void vcf_write_var(void *f, const void *v) { abort(); }
int vcf_var_sprintf_info(void *v, int dp, float af, int sb,
                         const void *dp4, int indel, int hrun,
                         int consvar) { abort(); }
void vcf_new_var(void **v) { abort(); }
void vcf_free_var(void **v) { abort(); }
void vcf_var_add_to_filter(void *v, const char *i) { abort(); }
void vcf_var_add_to_info(void *v, const char *s) { abort(); }
void *fai_load(const char *fn) { abort(); }
void fai_destroy(void *f) { abort(); }
char *faidx_fetch_seq(void *f, const char *n, int s, int e, int *l) { abort(); }
int faidx_nseq(const void *f) { abort(); }
const char *faidx_iseq(const void *f, int i) { abort(); }
int faidx_seq_len(const void *f, const char *s) { abort(); }
void init_mplp_conf(void *c) { abort(); }
void dump_mplp_conf(const void *c) { abort(); }
int source_qual_load_ign_vcf(const char *f, void *b) { abort(); }
void source_qual_free_ign_vars(void) { abort(); }
HEOF

gcc -std=gnu99 -O2 -o "$TMP/oracle_plpsum" oracle_plpsum.c \
    "$REF/lofreq_call.c" "$REF/snpcaller.c" "$REF/utils.c" "$REF/log.c" \
    "$REF/fet.c" "$TMP/stubs.c" \
    -I"$TMP" -I/root/reference/src/uthash -I"$REF" -lm -lz 2> "$TMP/err" \
  || { cat "$TMP/err"; exit 1; }

python3 gen_plpsum_cases.py --emit-input > "$TMP/cases.txt"
"$TMP/oracle_plpsum" < "$TMP/cases.txt" > "$TMP/golden.txt"
python3 gen_plpsum_cases.py --pack "$TMP/cases.txt" "$TMP/golden.txt" \
    ../golden/plpsum.json
echo "wrote ../golden/plpsum.json"
