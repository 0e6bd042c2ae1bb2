"""Prefilter parity tests against oracle intermediates (subset — the full
5898-query sweep lives in .tmp/full_pref_parity.py and reported zero
mismatches)."""

import glob
import os

import numpy as np
import pytest

from spacedust_tpu.db.fasta import create_setdb_from_fastas
from spacedust_tpu.db.mmseqs_io import FlatDB
from spacedust_tpu.search.prefilter import (PrefilterEngine, build_seed_tables,
                                            kmer_score_threshold, pack_kmers,
                                            spaced_kmers)

from conftest import oracle_root

ORACLE = oracle_root()


def _oracle_tmp():
    cands = [d for d in glob.glob(f"{ORACLE}/tmp/*/")
             if os.path.exists(os.path.join(d, "result.index"))]
    return cands[0] if cands else None


def test_kmer_threshold_table():
    assert kmer_score_threshold(5.7) == 112
    assert kmer_score_threshold(7.5) == 96


def test_spaced_pattern_packing():
    seq = np.arange(12, dtype=np.uint8) % 20
    starts, kmers = spaced_kmers(seq)
    assert kmers.shape[1] == 6
    # pattern {1,1,0,1,0,1,0,0,1,1} -> offsets 0,1,3,5,8,9
    assert list(kmers[0]) == [seq[0], seq[1], seq[3], seq[5], seq[8], seq[9]]
    packed = pack_kmers(kmers[:1])
    assert packed[0] == sum(int(kmers[0][i]) * 20 ** i for i in range(6))


def test_seed_tables_sorted():
    t = build_seed_tables()
    assert t.scores.shape == (8000, 8000)
    assert np.all(np.diff(t.scores[0].astype(np.int32)) <= 0)
    # top entry of a row is the row's own 3-mer (self score is max)
    assert t.scores[0, 0] == t.scores[0].max()


@pytest.mark.skipif(_oracle_tmp() is None,
                    reason="oracle intermediates not generated")
def test_prefilter_parity_subset(examples_dir):
    db = create_setdb_from_fastas([
        f"{examples_dir}/NC_000913.faa", f"{examples_dir}/NC_000915.faa"])
    eng = PrefilterEngine(db, db, sensitivity=5.7, same_qt_db=True,
                          cov_thr=0.8, cov_mode=2)
    pref = FlatDB.open(_oracle_tmp() + "search/latest/pref_0")
    for qk in range(60):
        hits = eng.match_query(qk)
        got = {(h.seq_id, h.score) for h in hits}
        want = {(int(c[0]), int(c[1]))
                for c in (l.split("\t") for l in pref.lines(qk))}
        assert got == want, f"query {qk}"
