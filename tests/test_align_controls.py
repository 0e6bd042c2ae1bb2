"""Alignment orchestrator controls: --max-accept / --max-rejected
early-stop and --alt-ali alternative alignments
(lib/mmseqs/src/alignment/Alignment.cpp:346,389-397,569-601)."""

import numpy as np
import pytest

from spacedust_tpu.db.fasta import create_setdb_from_fastas
from spacedust_tpu.search.alignment import AlignmentEngine, AlignmentParams
from spacedust_tpu.search.prefilter import PrefilterEngine


@pytest.fixture(scope="module")
def db(examples_dir):
    full = create_setdb_from_fastas([f"{examples_dir}/NC_000913.faa",
                                     f"{examples_dir}/NC_000915.faa"])
    set1 = int(np.searchsorted(full.set_ids, 1))
    return full.subset(list(range(80)) + list(range(set1, set1 + 80)))


@pytest.fixture(scope="module")
def cands(db):
    pref = PrefilterEngine(db, db, sensitivity=5.7, max_seqs=300,
                           same_qt_db=True)
    return {qk: [h.seq_id for h in hs] for qk, hs in pref.match_all().items()}


def test_max_accept_truncates(db, cands):
    base = AlignmentEngine(db, db, AlignmentParams(eval_thr=10.0),
                           same_qt_db=True).align_all(cands)
    capped = AlignmentEngine(db, db,
                             AlignmentParams(eval_thr=10.0, max_accept=1),
                             same_qt_db=True).align_all(cands)
    assert any(len(v) > 1 for v in base.values())
    for qk, recs in capped.items():
        assert len(recs) <= 1
        if recs and base[qk]:
            # the single kept hit is the first acceptance in prefilter
            # order — for self-search that's the identity hit
            assert recs[0].tkey == qk


def test_max_rejected_stops_scan(db, cands):
    # equivalence with the reference state machine: walk candidates in
    # prefilter order, accept iff the unrestricted run accepted, stop at
    # max_rejected CONSECUTIVE rejections (rejection counter resets on
    # accept, Alignment.cpp:389-397)
    par = AlignmentParams(eval_thr=0.01, cov_thr=0.6, cov_mode=2)
    base = AlignmentEngine(db, db, par, same_qt_db=True).align_all(cands)
    capped_par = AlignmentParams(eval_thr=0.01, cov_thr=0.6, cov_mode=2,
                                 max_rejected=2)
    capped = AlignmentEngine(db, db, capped_par,
                             same_qt_db=True).align_all(cands)
    stopped_early = 0
    for qk, tkeys in cands.items():
        base_by_key = {r.tkey: r for r in base[qk]}
        want, rejected = [], 0
        for tk in tkeys:
            if rejected >= 2:
                stopped_early += 1
                break
            if tk in base_by_key:
                want.append(tk)
                rejected = 0
            else:
                rejected += 1
        got = sorted(r.tkey for r in capped[qk])
        assert got == sorted(want), f"query {qk}"
    assert stopped_early > 0  # the knob actually fired somewhere


def test_alt_alignments_add_masked_hits(db, cands):
    base_par = AlignmentParams(eval_thr=10.0)
    base = AlignmentEngine(db, db, base_par,
                           same_qt_db=True).align_all(cands)
    alt = AlignmentEngine(db, db,
                          AlignmentParams(eval_thr=10.0, alt_alignments=1),
                          same_qt_db=True).align_all(cands)
    n_base = sum(len(v) for v in base.values())
    n_alt = sum(len(v) for v in alt.values())
    assert n_alt >= n_base
    # alt hits re-align the same target with the first region masked,
    # so any extra record's (tkey) already appears in the base list
    for qk in alt:
        base_keys = {r.tkey for r in base[qk]}
        for r in alt[qk]:
            assert r.tkey in base_keys
