"""VCF set operations: intersect / complement / concat.

Equivalent of `lofreq vcfset` (lofreq_vcfset.c:110-539).  vcf1 streams;
vcf2 is held in a position-keyed in-memory index (replacing the reference's
tabix random access — files at this layer are small relative to memory).
"""

from __future__ import annotations

from ..io.vcf import VcfReader, VcfWriter, add_header_line


def run_vcfset(
    action: str,
    vcf1_path,
    vcf2_path=None,
    out_path="-",
    add_info: str = None,
    count_only: bool = False,
    only_pos: bool = False,
    only_passed: bool = False,
    only_snvs: bool = False,
    only_indels: bool = False,
    concat_paths=(),
):
    assert action in ("intersect", "complement", "concat")

    # index vcf2 by (chrom, pos)
    var2_idx = {}
    if vcf2_path is not None:
        with VcfReader(vcf2_path) as r2:
            for v2 in r2:
                var2_idx.setdefault((v2.chrom, v2.pos), []).append(v2)

    def var2_match(v1) -> bool:
        for v2 in var2_idx.get((v1.chrom, v1.pos), ()):
            if only_passed and not v2.passes():
                continue
            if only_snvs and v2.is_indel():
                continue
            if only_indels and not v2.is_indel():
                continue
            if only_pos:
                return True
            if v1.ref == v2.ref and v1.alt == v2.alt:
                return True
        return False

    num_out = 0
    writer = None
    inputs = [vcf1_path] + list(concat_paths)
    if action != "concat":
        inputs = [vcf1_path]
    for in_idx, path in enumerate(inputs):
        with VcfReader(path) as r1:
            if writer is None and not count_only:
                header = r1.header
                if add_info == "SOMATIC":
                    header = add_header_line(
                        header,
                        '##INFO=<ID=SOMATIC,Number=0,Type=Flag,'
                        'Description="Somatic event">\n')
                writer = VcfWriter(out_path, header)
            for v1 in r1:
                if only_snvs and v1.is_indel():
                    continue
                if only_indels and not v1.is_indel():
                    continue
                if not only_pos and v1.alt and "," in v1.alt:
                    raise ValueError("No support for multi-allelic SNVs in vcf1")
                if only_passed and not v1.passes():
                    continue
                if add_info:
                    v1.add_info(add_info)
                if action == "concat":
                    num_out += 1
                    if writer:
                        writer.write(v1)
                    continue
                m = var2_match(v1)
                if (action == "complement" and not m) or (
                        action == "intersect" and m):
                    num_out += 1
                    if writer:
                        writer.write(v1)
    if writer:
        writer.close()
    return num_out
