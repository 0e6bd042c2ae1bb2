"""Sharded-pipeline equivalence: the full clustersearch run over an
8-device mesh (target shard per device, mesh-sharded SW, split-merged
prefilter) must produce the same TSV as the single-chip path.

Runs on the virtual 8-device CPU mesh (conftest.py) over a real-genome
slice — the miniature analog of the reference's MPI target-split mode
(Prefiltering.cpp:575-722)."""

import jax
import numpy as np
import pytest

from spacedust_tpu.db.fasta import create_setdb_from_fastas
from spacedust_tpu.parallel.split import residue_balanced_splits
from spacedust_tpu.parallel.pipeline import (sharded_prefilter,
                                             sharded_cluster_search,
                                             sharded_search)
from spacedust_tpu.parallel.sw_sharded import make_mesh
from spacedust_tpu.search.prefilter import PrefilterEngine
from spacedust_tpu.search.alignment import (AlignmentEngine, AlignmentParams,
                                            COV_MODE_QUERY)
from spacedust_tpu.workflow.clustersearch import (ClusterSearchParams,
                                                  cluster_search)


@pytest.fixture(scope="module")
def small_db(examples_dir):
    full = create_setdb_from_fastas([
        f"{examples_dir}/NC_000913.faa", f"{examples_dir}/NC_000915.faa"])
    # a slice of both genomes keeps real cluster structure while staying
    # CPU-mesh sized: first 150 genes of E. coli + first 100 of H. pylori
    set1 = int(np.searchsorted(full.set_ids, 1))
    keys = list(range(150)) + list(range(set1, set1 + 100))
    db = full.subset(keys)
    return db


def test_split_bounds():
    lens = np.array([10, 10, 10, 10, 40, 10, 10, 10], dtype=np.int32)
    shards = residue_balanced_splits(lens, 3)
    assert shards[0][0] == 0 and shards[-1][1] == 8
    assert all(s < e for s, e in shards)
    # degenerate: more shards than sequences
    assert len(residue_balanced_splits(np.array([5, 5]), 8)) == 2


def test_sharded_prefilter_matches_single(small_db):
    db = small_db
    single = PrefilterEngine(db, db, sensitivity=5.7, max_seqs=300,
                             same_qt_db=True, cov_thr=0.8, cov_mode=2)
    want = single.match_all()
    shards = residue_balanced_splits(db.lengths, 8)
    got = sharded_prefilter(db, db, shards, sensitivity=5.7, max_seqs=300,
                            cov_thr=0.8, cov_mode=2, same_qt_db=True)
    for qk in range(db.size):
        w = {(h.seq_id, h.score) for h in want.get(qk, [])}
        g = {(h.seq_id, h.score) for h in got.get(qk, [])}
        assert g == w, f"query {qk}"


def test_sharded_search_records_match_single(small_db):
    db = small_db
    mesh = make_mesh(jax.devices()[:8])
    par = AlignmentParams(eval_thr=10.0, cov_thr=0.8, cov_mode=COV_MODE_QUERY,
                          aln_len_thr=30)
    sharded = sharded_search(db, db, mesh=mesh, params=par,
                             same_qt_db=True)
    pref = PrefilterEngine(db, db, sensitivity=5.7, max_seqs=300,
                           same_qt_db=True, cov_thr=0.8, cov_mode=2)
    cands = {qk: [h.seq_id for h in hs]
             for qk, hs in pref.match_all().items()}
    single = AlignmentEngine(db, db, par, same_qt_db=True).align_all(cands)
    assert set(sharded) == set(single)
    for qk in sharded:
        got = [r.columns() for r in sharded[qk]]
        want = [r.columns() for r in single[qk]]
        assert got == want, f"query {qk}"


def test_sharded_cluster_search_tsv_identical(small_db):
    db = small_db
    par = ClusterSearchParams(filter_self_match=True)
    mesh = make_mesh(jax.devices()[:8])
    single = cluster_search(db, db, par)
    sharded = sharded_cluster_search(db, db, par, mesh=mesh)
    assert sharded.tsv == single.tsv
    assert len(sharded.clusters) == len(single.clusters)


def test_out_of_core_split_equivalence(small_db):
    """--split-memory-limit forces sequential target splits whose merged
    output equals the single-index run (Prefiltering.cpp:662-723)."""
    from spacedust_tpu.workflow.clustersearch import (ClusterSearchParams,
                                                      cluster_search)
    db = small_db
    base = cluster_search(db, db, ClusterSearchParams(filter_self_match=True))
    budget = int(db.total_residues) * 3   # ~4 splits at 12 B/residue
    split = cluster_search(db, db, ClusterSearchParams(
        filter_self_match=True, split_memory_limit=budget))
    assert split.tsv == base.tsv


def test_mmap_subrange_out_of_core(small_db, tmp_path):
    """Out-of-core contract (DBReader MMAP-mode analog): a loaded SetDB
    mmaps its token arrays, subrange() shards are zero-copy views of the
    mapped file, and the sharded prefilter over views reproduces the
    copy-based subset path."""
    import numpy as np
    from spacedust_tpu.db.setdb import SetDB
    from spacedust_tpu.parallel.pipeline import sharded_prefilter
    from spacedust_tpu.parallel.split import residue_balanced_splits

    small_db.save(tmp_path / "db")
    db = SetDB.load(tmp_path / "db")
    assert isinstance(db.seq_data, np.memmap)
    sub = db.subrange(10, 40)
    assert sub.size == 30
    assert sub.seq_data.base is not None          # view, not a copy
    np.testing.assert_array_equal(sub.sequence(0), db.sequence(10))

    shards = residue_balanced_splits(db.lengths, 4)
    hits_view = sharded_prefilter(db, db, shards, same_qt_db=True,
                                  cov_thr=0.8, cov_mode=2)
    hits_copy = sharded_prefilter(small_db, small_db, shards,
                                  same_qt_db=True, cov_thr=0.8, cov_mode=2)
    assert {k: [(h.seq_id, h.score, h.diagonal) for h in v]
            for k, v in hits_view.items()} == \
           {k: [(h.seq_id, h.score, h.diagonal) for h in v]
            for k, v in hits_copy.items()}
