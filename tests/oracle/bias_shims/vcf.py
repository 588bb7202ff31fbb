"""PyVCF stand-in for lofreq2_bias.py (run unmodified): just the
record model the script touches — .CHROM/.POS/.ID/.REF/.ALT/.QUAL/
.FILTER (list; raw '.'/'PASS' parse to empty so an appended MTC tag
REPLACES them, matching the repo writer's add_filter semantics)/
.INFO (insertion-ordered dict with the py2 has_key the script calls).
VCFWriter.write_record serializes K=V/flag INFO in insertion order, so
MB/BB/CB land appended at the tail exactly like the repo tool."""

import sys


class _Info(dict):
    def has_key(self, k):
        return k in self


class _Record(object):
    def __init__(self, line):
        f = line.rstrip("\n").split("\t")
        self.CHROM = f[0]
        self.POS = int(f[1])
        self.ID = f[2]
        self.REF = f[3]
        self.ALT = f[4].split(",")
        self.QUAL = f[5]
        self._filter_raw = f[6]
        self.FILTER = ([] if f[6] in (".", "PASS")
                       else f[6].split(";"))
        self._filter_untouched = list(self.FILTER)
        self.INFO = _Info()
        if len(f) > 7 and f[7] != ".":
            for kv in f[7].split(";"):
                if "=" in kv:
                    k, v = kv.split("=", 1)
                    self.INFO[k] = v
                else:
                    self.INFO[kv] = True

    def _to_line(self, lineterminator="\n"):
        if self.FILTER == self._filter_untouched:
            filt = self._filter_raw
        else:
            filt = ";".join(str(x) for x in self.FILTER)
        info = ";".join(k if v is True else "%s=%s" % (k, v)
                        for k, v in self.INFO.items()) or "."
        return "\t".join([self.CHROM, str(self.POS), self.ID, self.REF,
                          ",".join(str(a) for a in self.ALT), self.QUAL,
                          filt, info]) + lineterminator


class VCFReader(object):
    def __init__(self, fsock=None, filename=None):
        fh = fsock if fsock is not None else open(filename)
        self._header = []
        self._records = []
        for line in fh:
            if line.startswith("#"):
                self._header.append(line)
            elif line.strip():
                self._records.append(_Record(line))
        if filename is not None:
            fh.close()

    def __iter__(self):
        return iter(self._records)


class VCFWriter(object):
    def __init__(self, fh, template, lineterminator="\n"):
        self._fh = fh
        self._lt = lineterminator
        for line in getattr(template, "_header", []):
            fh.write(line.rstrip("\n") + lineterminator)

    def write_record(self, rec):
        self._fh.write(rec._to_line(self._lt))
