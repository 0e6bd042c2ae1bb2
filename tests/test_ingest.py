"""Ingestion tests against the bundled example data."""

import numpy as np

from spacedust_tpu.db.fasta import create_setdb_from_fastas, parse_prodigal_header
from spacedust_tpu.db.gff import create_setdb_from_gff
from spacedust_tpu.db.translate import translate


def test_parse_prodigal_header():
    h = ("NC_000913.3_1 # 3 # 98 # 1 # ID=1_1;partial=10;start_type=Edge;"
         "rbs_motif=None;rbs_spacer=None;gc_cont=0.427")
    acc, start, end, strand = parse_prodigal_header(h)
    assert acc == "NC_000913.3_1"
    assert (start, end, strand) == (3, 98, 1)


def test_create_setdb_examples(examples_dir):
    db = create_setdb_from_fastas([
        f"{examples_dir}/NC_000913.faa",
        f"{examples_dir}/NC_000915.faa",
    ])
    assert db.size == 4319 + 1579
    assert db.num_sets == 2
    assert list(db.set_sizes) == [4319, 1579]
    assert db.sources == ["NC_000913.faa", "NC_000915.faa"]
    # first E. coli gene: acc NC_000913.3_1, pos 0, 3..98 plus strand
    assert db.names[0] == "NC_000913.3_1_0_3_98"
    # gene 2005 (1-based) has posIdx 2004 and coords from sample_result.tsv
    assert db.names[2004] == "NC_000913.3_2005_2004_2111019_2110138"
    # minus strand encoded by start > end
    assert not db.strand(2004)
    # first H. pylori gene is key 4319
    assert db.set_ids[4319] == 1
    assert db.pos_idx[4319] == 0
    # sequence content round-trips
    seq = db.sequence(0)
    assert len(seq) == db.lengths[0]
    # total_residues counts every residue incl. trailing '*'
    assert db.total_residues == int(db.offsets[-1])


def test_translate_standard():
    assert translate(b"ATGAAATAA") == "MK*"
    assert translate(b"atgaaa") == "MK"
    # trims non-multiple of 3
    assert translate(b"ATGAAAT") == "MK"
    # ambiguous codon that still resolves: GCN -> A
    assert translate(b"GCN") == "A"
    # unresolvable ambiguity -> X
    assert translate(b"NNN") == "X"


def test_gff_matches_oracle_sequences(examples_dir):
    """Translated CDS sequences match the reference's createsetdb output
    on the uvig examples (as residue multisets; the reference's nucl-path
    key order is thread-interleaved)."""
    import glob
    import os
    import pytest
    from collections import Counter
    from spacedust_tpu.db.mmseqs_io import FlatDB
    from spacedust_tpu.constants import encode_aa, decode_aa

    from conftest import oracle_root
    oracle_base = os.path.join(oracle_root(), "uvig", "genome")
    if not os.path.exists(oracle_base + ".index"):
        pytest.skip("oracle uvig DB not generated")
    db = create_setdb_from_gff(
        [f"{examples_dir}/uvig_120081.gff", f"{examples_dir}/uvig_255655.gff"],
        [f"{examples_dir}/uvig_120081.fna", f"{examples_dir}/uvig_255655.fna"])
    oracle = FlatDB.open(oracle_base)
    ours = Counter(decode_aa(db.sequence(k)) for k in range(db.size))
    theirs = Counter(decode_aa(encode_aa(d.strip())) for _, d in oracle.entries())
    assert ours == theirs
    assert db.size == oracle.size == 153


def test_gff_ingestion(examples_dir):
    db = create_setdb_from_gff(
        [f"{examples_dir}/uvig_120081.gff", f"{examples_dir}/uvig_255655.gff"],
        [f"{examples_dir}/uvig_120081.fna", f"{examples_dir}/uvig_255655.fna"],
    )
    assert db.num_sets == 2
    assert db.size > 0
    assert all("_" in n for n in db.names)
    # every sequence non-empty and encoded in 0..20
    assert db.seq_data.max() <= 20
