"""k=7 prefilter support (large-DB index scaling, VERDICT r3 missing #2).

The reference auto-raises k to 7 above 3.35 G residues
(IndexTable::computeKmerSize, lib/mmseqs/src/prefiltering/IndexTable.h:439-441)
with the [2,2,3] reversed divide strategy (KmerGenerator.cpp:41-88) and
spaced_seed_7 (Sequence.h:25).  These tests pin the k=7 engine against
(a) the numpy index build, (b) the per-query host matcher, and (c) the
reference binary's own `prefilter -k 7` output on a real-genome subset.
"""

import os
import subprocess

import numpy as np
import pytest

from spacedust_tpu.db.fasta import create_setdb_from_fastas
from spacedust_tpu.search.prefilter import (KmerIndex, PrefilterEngine,
                                            build_seed_tables2,
                                            compute_kmer_size, kmer_parts,
                                            kmer_score_threshold)

REFBIN = "/root/repo/.refbuild/src/spacedust"
EXAMPLES = "/root/reference/examples"


def test_parts_and_tables():
    assert kmer_parts(6) == [3, 3]
    assert kmer_parts(7) == [2, 2, 3]
    assert kmer_parts(8) == [2, 3, 3]
    t2 = build_seed_tables2()
    assert t2.scores.shape == (400, 400)
    assert np.all(np.diff(t2.scores[7].astype(np.int32)) <= 0)
    # top entry of a row is its own 2-mer (self score is max)
    assert t2.scores[7, 0] == t2.scores[7].max()
    assert compute_kmer_size(10 ** 9) == 6
    assert compute_kmer_size(4 * 10 ** 9) == 7


@pytest.fixture(scope="module")
def small_db(tmp_path_factory):
    """First 150 E. coli proteins (sliced FASTA so the reference
    createdb sees the identical keys)."""
    tmp = tmp_path_factory.mktemp("k7db")
    recs, cur = [], None
    for ln in open(f"{EXAMPLES}/NC_000913.faa"):
        if ln.startswith(">"):
            cur = [ln]
            recs.append(cur)
        else:
            cur.append(ln)
    dst = tmp / "subset.faa"
    with open(dst, "w") as fh:
        for r in recs[:150]:
            fh.write("".join(r))
    return create_setdb_from_fastas([str(dst)]), str(dst)


def test_k7_index_native_matches_numpy(small_db):
    db, _ = small_db
    thr = kmer_score_threshold(5.7, 7)
    idx = KmerIndex(db, thr, kmer_size=7)          # native build
    ref = KmerIndex.__new__(KmerIndex)
    ref.tdb = db
    ref.seed = idx.seed
    ref.kmer_thr = thr
    ref.kmer_size = 7
    ref.pattern = idx.pattern
    ref.masked = idx.masked
    ref.t_offsets = idx.t_offsets
    ref.t_data = idx.t_data
    lens = np.array([len(s) for s in ref.masked], dtype=np.int64)
    ref._build_postings(lens)                      # numpy build
    assert np.array_equal(idx.kmers, ref.kmers)
    assert np.array_equal(idx.seq_ids, ref.seq_ids)
    assert np.array_equal(idx.positions, ref.positions)
    assert len(idx.kmers) > 0


def test_k7_native_matches_host(small_db):
    db, _ = small_db
    eng = PrefilterEngine(db, db, sensitivity=5.7, same_qt_db=True,
                          kmer_size=7)
    assert eng.kmer_size == 7
    batch = eng.match_all()
    for qk in range(0, db.size, 7):
        host = eng.match_query(qk)
        got = [(h.seq_id, h.score, h.diagonal) for h in batch[qk]]
        want = [(h.seq_id, h.score, h.diagonal) for h in host]
        assert got == want, f"query {qk}"


@pytest.mark.skipif(not os.path.exists(REFBIN),
                    reason="reference oracle binary not built")
def test_k7_reference_parity(small_db, tmp_path):
    """Hit-set parity vs the reference binary's own k=7 prefilter."""
    db, fasta = small_db
    qdb = tmp_path / "qdb"
    subprocess.run([REFBIN, "createdb", fasta, str(qdb), "--shuffle", "0"],
                   check=True, capture_output=True)
    pref = tmp_path / "pref"
    subprocess.run([REFBIN, "prefilter", str(qdb), str(qdb), str(pref),
                    "-k", "7", "-s", "5.7", "--max-seqs", "300",
                    "--threads", "2"],
                   check=True, capture_output=True)
    from spacedust_tpu.db.mmseqs_io import FlatDB
    oracle = FlatDB.open(pref)

    eng = PrefilterEngine(db, db, sensitivity=5.7, same_qt_db=True,
                          kmer_size=7)
    hits = eng.match_all()
    n_nonempty = 0
    for qk in range(db.size):
        got = {(h.seq_id, h.score) for h in hits[qk]}
        want = {(int(c[0]), int(c[1]))
                for c in (ln.split("\t") for ln in oracle.lines(qk))}
        assert got == want, f"query {qk}"
        n_nonempty += bool(want)
    assert n_nonempty > 100          # the comparison had real material


def test_size_triggered_k7_auto_selection(small_db, monkeypatch):
    """The by-size auto-raise path (VERDICT r4 next #9): scale the
    IndexTable.h:439-441 boundary down so compute_kmer_size flips to 7
    for the subset DB, and check the engine picks k=7 WITHOUT an
    explicit override and produces exactly the explicit-k7 hit sets."""
    import spacedust_tpu.search.prefilter as pf
    db, _ = small_db
    monkeypatch.setattr(pf, "K7_THRESHOLD_RESIDUES",
                        int(db.total_residues) - 1)
    assert compute_kmer_size(db.total_residues) == 7
    eng = PrefilterEngine(db, db, sensitivity=5.7, same_qt_db=True)
    assert eng.kmer_size == 7                    # auto-selected by size
    # threshold must follow the k=7 sensitivity table, not k=6's
    assert eng.kmer_thr == pf.kmer_score_threshold(5.7, 7)
    auto = eng.match_all()
    explicit = PrefilterEngine(db, db, sensitivity=5.7, same_qt_db=True,
                               kmer_size=7).match_all()
    assert set(auto) == set(explicit)
    for qk in auto:
        a = [(h.seq_id, h.score, h.diagonal) for h in auto[qk]]
        b = [(h.seq_id, h.score, h.diagonal) for h in explicit[qk]]
        assert a == b, f"query {qk}"
