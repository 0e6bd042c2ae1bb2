"""extractorfs / offsetalignment / filter-expression parity tests."""

import os

import pytest

from conftest import oracle_root

from spacedust_tpu.db.orftools import (extract_orfs, find_orfs,
                                       offset_alignment, parse_orf_header,
                                       reverse_complement, write_orf_header)
from spacedust_tpu.db.translate import start_codons, stop_codons
from spacedust_tpu.db.dbtools import filterdb
from spacedust_tpu.db.mmseqs_io import FlatDB


def _read_fasta_seq(path: str) -> str:
    lines = open(path).read().splitlines()
    return "".join(ln for ln in lines if not ln.startswith(">"))


def test_codon_tables():
    assert stop_codons(1) == ["TAA", "TAG", "TGA"]
    assert stop_codons(4) == ["TAA", "TAG"]
    assert start_codons(1) == ["ATG"]
    assert "GTG" in start_codons(11, use_all_table_starts=True)
    assert "TTG" in start_codons(11, use_all_table_starts=True)


def test_orf_header_roundtrip():
    h = write_orf_header(7, 142, 264, False, True)
    key, f, t, inc_s, inc_e, strand = parse_orf_header(h)
    assert (key, f, t, inc_s, inc_e, strand) == (7, 142, 264, False, True, 1)
    h = write_orf_header(3, 500, 380, True, False)
    key, f, t, inc_s, inc_e, strand = parse_orf_header(h)
    assert (key, f, t, inc_s, inc_e, strand) == (3, 500, 380, True, False, -1)


def test_extractorfs_matches_reference(examples_dir):
    base = os.path.join(oracle_root(), "orfs", "uvig_orfs")
    if not os.path.exists(base + ".index"):
        pytest.skip("extractorfs oracle not generated")
    contig = _read_fasta_seq(f"{examples_dir}/uvig_120081.fna")
    seqs, hdrs = extract_orfs({0: contig})
    oracle = FlatDB.open(base)
    oracle_h = FlatDB.open(base + "_h")
    want = [(oracle_h.get(k).strip(), oracle.get(k).strip())
            for k in oracle.keys()]
    got = [(hdrs[k], seqs[k]) for k in sorted(seqs)]
    assert sorted(got) == sorted(want)

    # translated variant
    base_aa = os.path.join(oracle_root(), "orfs", "uvig_orfs_aa")
    seqs_aa, hdrs_aa = extract_orfs({0: contig}, translate_orfs=True)
    oracle_aa = FlatDB.open(base_aa)
    want_aa = sorted(oracle_aa.get(k).strip() for k in oracle_aa.keys())
    assert sorted(s for s in seqs_aa.values()) == want_aa


def test_offset_alignment_plus_and_minus():
    # aa alignment on a plus-strand ORF starting at contig pos 100
    cols = ["5", "42", "0.5", "1e-5", "2", "9", "20", "1", "8", "20"]
    out = offset_alignment(cols, "3\t100+299", is_nucleotide=False,
                           update_target=True)
    assert out[0] == "3"
    assert out[7] == str(100 + 3) and out[8] == str(100 + 24 + 2)
    # minus strand: from > to
    out = offset_alignment(cols, "3\t400-299", is_nucleotide=False,
                           update_target=True)
    assert out[7] == str(400 - 3) and out[8] == str(400 - 24 - 2)
    # query side, nucleotide coords
    out = offset_alignment(cols, "9\t50+100", is_nucleotide=True,
                           update_target=False)
    assert out[4] == str(50 + 2) and out[5] == str(50 + 9)
    assert out[0] == "5"  # target key untouched


def test_filterdb_expression():
    db = {0: "a\t0.5\t10\nb\t0.9\t3\nc\t0.2\t50\n"}
    out = filterdb(db, filter_expression="$2>=0.5&&$3>5")
    assert out[0] == "a\t0.5\t10\n"
    out = filterdb(db, filter_expression="!($2>=0.5)")
    assert out[0] == "c\t0.2\t50\n"
    out = filterdb(db, filter_expression="log($3)>2")
    assert out[0] == "a\t0.5\t10\nc\t0.2\t50\n"
