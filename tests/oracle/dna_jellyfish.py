"""Pure-python stand-in for the SWIG dna_jellyfish module (oracle use only).

Lets the UNMODIFIED reference jasper.py (/root/reference/src/jasper.py) run
against a .jf database produced by jasper_tpu, so golden tests can byte-diff
reference output vs the jasper_tpu engine without building jellyfish.

Implements exactly the 4-call surface the reference uses
(src/jasper.py:10,15,70-71): QueryMerFile(path), qf[mer], MerDNA(s),
.get_canonical() — with the true jellyfish semantics for malformed strings
(partial fill + A padding; see jasper_tpu.polish.semantics).
"""

import os
import sys

sys.path.insert(0, os.environ.get("JASPER_TPU_ROOT", "/root/repo"))

from jasper_tpu.io.jf import load_jf_into_host_table  # noqa: E402
from jasper_tpu.polish.semantics import effective_canonical_words  # noqa: E402


class MerDNA:
    _k = None

    def __init__(self, s=""):
        self.s = s

    @classmethod
    def k(cls, n=None):
        if n is not None:
            cls._k = int(n)
        return cls._k

    def get_canonical(self):
        return self  # canonicalization is applied at lookup time

    def __str__(self):
        from jasper_tpu.ops.kmer import int_to_kmer, words_to_int

        words = effective_canonical_words(self.s, MerDNA._k)
        return int_to_kmer(words_to_int(words), MerDNA._k)


class QueryMerFile:
    def __init__(self, path):
        self.table, header = load_jf_into_host_table(path)
        MerDNA.k(self.table.k)
        self._memo = {}

    def __getitem__(self, mer):
        s = mer.s if isinstance(mer, MerDNA) else str(mer)
        key = effective_canonical_words(s, self.table.k)
        kb = key.tobytes()
        hit = self._memo.get(kb)
        if hit is None:
            hit = int(self.table.lookup_words(key[None])[0])
            self._memo[kb] = hit
        return hit
