"""Native (C++/OpenMP) prefilter engine vs the host numpy reference path.

The numpy path in search/prefilter.py is bit-parity-verified against the
reference prefilter oracle (tests/test_prefilter.py); this locks the
native batch engine (native/prefilter_engine.cpp) to it hit-for-hit,
including composition-bias thresholds, double-diagonal arrival-order
semantics, rescore values, and the --max-seqs histogram cap.
"""

import os
import tempfile

import pytest

from spacedust_tpu.db.setdb import SetDB
from spacedust_tpu.search.prefilter import PrefilterEngine
from spacedust_tpu.workflow.createsetdb import create_setdb

REF_FAA = "/root/reference/examples/NC_000913.faa"


def _mini_db(n=120) -> SetDB:
    tmp = tempfile.mkdtemp()
    p = os.path.join(tmp, "mini.faa")
    with open(REF_FAA) as f, open(p, "w") as o:
        count = 0
        for line in f:
            if line.startswith(">"):
                count += 1
                if count > n:
                    break
            o.write(line)
    return create_setdb([p])


@pytest.fixture(scope="module")
def mini_engine():
    db = _mini_db()
    return PrefilterEngine(db, db, sensitivity=5.7, max_seqs=300,
                           cov_thr=0.8, cov_mode=0)


def test_native_matches_numpy(mini_engine):
    pref = mini_engine
    batch = pref.match_all()
    assert len(batch) == pref.qdb.size
    for qk in range(pref.qdb.size):
        ref = [(h.seq_id, h.score, h.diagonal) for h in pref.match_query(qk)]
        got = [(h.seq_id, h.score, h.diagonal) for h in batch[qk]]
        assert got == ref, f"query {qk}"


def test_native_no_identity_when_different_db(mini_engine):
    src = mini_engine.qdb
    pref = PrefilterEngine(src, src, sensitivity=5.7, max_seqs=300,
                           same_qt_db=False)
    batch = pref.match_all()
    for qk in (0, 3, 11):
        ref = [(h.seq_id, h.score, h.diagonal) for h in pref.match_query(qk)]
        got = [(h.seq_id, h.score, h.diagonal) for h in batch[qk]]
        assert got == ref


def test_native_index_build_matches_numpy():
    """The native two-pass index build (build_kmer_index) must reproduce
    the numpy lexsort build (KmerIndex._build_postings) posting-for-
    posting, including per-sequence first-occurrence dedup and the dense
    offset table."""
    import numpy as np
    from spacedust_tpu.constants import X_INDEX
    from spacedust_tpu.native import build_kmer_index
    from spacedust_tpu.search.prefilter import KmerIndex, load_pinned_matrix

    db = _mini_db(200)
    seed = load_pinned_matrix("vtml80_bf8_bias")
    idx = KmerIndex(db, 112, seed, mask=True)           # native path
    # numpy reference build over the identical masked token stream
    ref = KmerIndex.__new__(KmerIndex)
    ref.tdb = db
    ref.seed = seed
    ref.kmer_thr = 112
    ref.kmer_size = 6
    ref.masked = idx.masked
    lens = np.array([len(s) for s in ref.masked], dtype=np.int64)
    ref.t_offsets = idx.t_offsets
    ref.t_data = idx.t_data
    ref._build_postings(lens)
    np.testing.assert_array_equal(idx.kmers, ref.kmers)
    np.testing.assert_array_equal(idx.seq_ids, ref.seq_ids)
    np.testing.assert_array_equal(idx.positions, ref.positions)
    # the compact hash must agree with binary search over the postings
    probe = np.unique(np.concatenate(
        [idx.kmers[::97], np.arange(0, 20**6, 999983, dtype=np.int64)]))
    lo = np.searchsorted(idx.kmers, probe, side="left")
    hi = np.searchsorted(idx.kmers, probe, side="right")
    hmask = len(idx.hkeys) - 1
    for km, l, h in zip(probe, lo, hi):
        occ = bool(idx.occupied[int(km) >> 6] >> np.uint64(int(km) & 63)
                   & np.uint64(1))
        assert occ == (h > l), f"bitmap mismatch at {km}"
        if h > l:
            slot = (np.uint32(km) * np.uint32(2654435761)) & np.uint32(hmask)
            while idx.hkeys[slot] != km:
                slot = (slot + 1) & np.uint32(hmask)
            assert idx.hoff[slot] == l and idx.hcnt[slot] == h - l
