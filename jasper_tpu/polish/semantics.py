"""Exact Jellyfish query semantics for arbitrary strings.

The reference polisher queries `qf[jf.MerDNA(s).get_canonical()]` on slices
that are not always clean k-length ACGT strings (boundary walks produce
empty, short, negative-index-wrapped, or N-containing slices,
reference src/jasper.py:156-204). The actual reference behavior, from the
jellyfish sources:

  * MerDNA's from-string constructor zero-initializes the mer then fills
    base codes MSB-first until the first non-ACGT char (code < 0 in the
    256-entry table, mer_dna.hpp:38-55; '\\0' at the end of a short string
    is also invalid), silently leaving the remaining low bits zero
    (mer_dna.hpp from_chars + mer_base ctor memset). Zero bits read as 'A'.
  * So the *effective* queried key of any string s is: the first run of
    ACGT/acgt chars of s[:k], padded with 'A' to length k.
  * get_canonical() then takes min(key, revcomp(key)) and the count of that
    canonical key is returned (0 if absent).

`effective_codes` implements exactly that; every count provider in this
package must route string queries through it.
"""

from __future__ import annotations

import numpy as np

from jasper_tpu.ops.codes import encode

_VALID = np.zeros(256, dtype=bool)
for _c in b"ACGTacgt":
    _VALID[_c] = True


def effective_codes(s: str, k: int) -> np.ndarray:
    """uint8 code array [k] of the key jellyfish would actually query for s."""
    out = np.zeros(k, dtype=np.uint8)  # zero code == 'A' padding
    raw = np.frombuffer(s[:k].encode("ascii", errors="replace"), dtype=np.uint8)
    valid = _VALID[raw]
    stop = int(np.argmin(valid)) if not valid.all() else len(raw)
    if stop:
        out[:stop] = encode(s[:stop])
    return out


def effective_canonical_words(s: str, k: int) -> np.ndarray:
    """Packed canonical key words for the effective query of s."""
    from jasper_tpu.ops.kmer import canonical_windows

    codes = effective_codes(s, k)
    keys, _ = canonical_windows(np, codes, k)
    return keys[0]
