"""Codon translation (translatenucs equivalent).

Implements NCBI genetic-code tables as used by TranslateNucl
(lib/mmseqs/src/commons/TranslateNucl.h) and the translatenucs module
(lib/mmseqs/src/util/translatenucs.cpp): sequences are trimmed to a
multiple of three, codons with ambiguous bases translate via IUPAC
expansion when unambiguous in outcome, otherwise 'X'; stop codons emit '*'.
"""

from __future__ import annotations

import numpy as np

# NCBI translation table 1 (standard); codon order TTT, TTC, TTA, TTG, CTT...
# indexed by base order T, C, A, G as in the NCBI spec.
_NCBI_TABLES = {
    1: "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
    4: "FFLLSSSSYY**CCWWLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
    11: "FFLLSSSSYY**CC*WLLLLPPPPHHQQRRRRIIIMTTTTNNKKSSRRVVVVAAAADDEEGGGG",
}

_BASE_ORDER = "TCAG"
_IUPAC = {
    "A": "A", "C": "C", "G": "G", "T": "T", "U": "T",
    "R": "AG", "Y": "CT", "S": "GC", "W": "AT", "K": "GT", "M": "AC",
    "B": "CGT", "D": "AGT", "H": "ACT", "V": "ACG", "N": "ACGT",
}


def _build_codon_lookup(table_id: int) -> np.ndarray:
    """Map (b0*25 + b1*5 + b2) -> amino-acid byte, with 5-letter base
    alphabet {T,C,A,G,ambiguous}; ambiguity resolved via IUPAC expansion."""
    aas = _NCBI_TABLES[table_id]

    def translate_exact(c0: int, c1: int, c2: int) -> str:
        return aas[c0 * 16 + c1 * 4 + c2]

    table: dict[bytes, int] = {}
    letters = list(_IUPAC.keys())
    for a in letters:
        for b in letters:
            for c in letters:
                outs = set()
                for ea in _IUPAC[a]:
                    for eb in _IUPAC[b]:
                        for ec in _IUPAC[c]:
                            outs.add(translate_exact(
                                _BASE_ORDER.index(ea),
                                _BASE_ORDER.index(eb),
                                _BASE_ORDER.index(ec)))
                aa = outs.pop() if len(outs) == 1 else "X"
                table[(a + b + c).encode()] = ord(aa)
    return table  # type: ignore[return-value]


_CODON_CACHE: dict[int, dict[bytes, int]] = {}


def translate(seq: bytes, table_id: int = 1) -> str:
    """Translate a nucleotide sequence (bytes) to a protein string.

    Trims to a multiple of 3 (translatenucs.cpp:70-75). Unknown codons -> X.
    """
    if table_id not in _CODON_CACHE:
        _CODON_CACHE[table_id] = _build_codon_lookup(table_id)
    table = _CODON_CACHE[table_id]
    seq = seq.upper()
    n = len(seq) - (len(seq) % 3)
    out = bytearray(n // 3)
    for i in range(0, n, 3):
        out[i // 3] = table.get(seq[i:i + 3], ord("X"))
    return out.decode("ascii")
