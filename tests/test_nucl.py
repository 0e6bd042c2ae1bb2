"""Nucleotide search mode: bit-parity with the reference's
`search --search-type 3` on the uvig genomes (committed oracle fixture),
plus aligner unit checks."""

import os

import numpy as np
import pytest

from conftest import oracle_root

from spacedust_tpu.db.mmseqs_io import FlatDB
from spacedust_tpu.native import nucl_banded_align
from spacedust_tpu.search.nucl import (NUCL_MAT, encode_nucl, nucl_search,
                                       revcomp_codes, split_windows)

EXAMPLES = "/root/reference/examples"


def _read_fa(path):
    return "".join(ln for ln in open(path).read().splitlines()
                   if not ln.startswith(">"))


def test_aligner_identity_and_indel():
    rng = np.random.default_rng(0)
    a = rng.integers(0, 4, 200).astype(np.uint8)
    score, qs, qe, ts, te, ids, ops = nucl_banded_align(a, a, 0, NUCL_MAT)
    assert (score, qs, qe, ts, te, ids) == (400, 0, 199, 0, 199, 200)
    assert set(ops) == {"M"}
    b = np.concatenate([a[:100], a[101:]])
    score, *_rest, ops = nucl_banded_align(a, b, 0, NUCL_MAT)
    assert score == 391 and ops.count("I") == 1   # one query insertion


def test_revcomp():
    codes = encode_nucl("ACGTTGCA")
    rc = revcomp_codes(codes)
    assert (revcomp_codes(rc) == codes).all()


def test_nucl_search_oracle_parity():
    base = os.path.join(oracle_root(), "nucl", "nuclres")
    if not os.path.exists(base + ".index"):
        pytest.skip("nucleotide oracle not generated")
    q = {0: _read_fa(f"{EXAMPLES}/uvig_120081.fna"),
         1: _read_fa(f"{EXAMPLES}/uvig_255655.fna")}
    out = nucl_search(q, q, eval_thr=0.001)
    ours = {(k, "\t".join(c)) for k in out for c in out[k]}
    db = FlatDB.open(base)
    oracle = {(k, ln) for k in db.keys() for ln in db.lines(k)}
    assert ours == oracle


def test_reverse_strand_hit():
    rng = np.random.default_rng(3)
    bases = "ACGT"
    a = "".join(bases[i] for i in rng.integers(0, 4, 3000))
    comp = {"A": "T", "T": "A", "G": "C", "C": "G"}
    rcseg = "".join(comp[c] for c in reversed(a[1000:1400]))
    b = ("".join(bases[i] for i in rng.integers(0, 4, 800)) + rcseg
         + "".join(bases[i] for i in rng.integers(0, 4, 800)))
    out = nucl_search({0: a}, {0: b}, eval_thr=0.001)
    rev = [c for c in out[0] if int(c[4]) > int(c[5])]
    assert rev, "reverse-strand hit not found"
    c = rev[0]
    # query coords descend on the minus strand (offsetalignment map)
    assert int(c[4]) >= 1395 and int(c[5]) <= 1005
