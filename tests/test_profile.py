"""PSSM/profile construction tests vs the reference's result2profile
output (oracle run with --filter-msa 0)."""

import glob
import os

import numpy as np
import pytest

from spacedust_tpu.constants import encode_aa
from spacedust_tpu.db.fasta import create_setdb_from_fastas
from spacedust_tpu.db.mmseqs_io import FlatDB
from spacedust_tpu.search.records import AlnRecord, expand_cigar
from spacedust_tpu.search.profile import (compute_pssm, compute_msa, flog2,
                                          fpow2, GAP)
from spacedust_tpu.stats.submat import load_pinned_matrix

from conftest import oracle_root

ORACLE = oracle_root()


def test_fast_log_pow_roundtrip():
    x = np.array([0.5, 1.0, 2.0, 3.7, 100.0], dtype=np.float32)
    assert np.allclose(flog2(x), np.log2(x), atol=2e-4)
    y = np.array([-3.0, -0.5, 0.0, 0.5, 3.0], dtype=np.float32)
    assert np.allclose(fpow2(y), 2.0 ** y.astype(np.float64), rtol=1e-4)


def test_msa_construction():
    q = encode_aa("MKVLGDEWRK")
    t = encode_aa("KVLGDEW")
    rec = AlnRecord(tkey=1, score=0, seq_id=1, evalue=0, qstart=1, qend=7,
                    qlen=10, tstart=0, tend=6, tlen=7, backtrace="M" * 7)
    msa = compute_msa(q, [t], [rec])
    assert msa.shape == (2, 10)
    assert msa[1, 0] == GAP and msa[1, 8] == GAP
    assert (msa[1, 1:8] == t).all()


@pytest.mark.skipif(not os.path.exists(f"{ORACLE}/profiles.index"),
                    reason="oracle profiles not generated")
def test_pssm_parity_subset(examples_dir):
    """Profiles match the reference byte-for-byte on most queries; the
    documented SIMD-reciprocal deviation allows rare off-by-one scores."""
    db = create_setdb_from_fastas([
        f"{examples_dir}/NC_000913.faa", f"{examples_dir}/NC_000915.faa"])
    tmpd = [d for d in glob.glob(f"{ORACLE}/tmp/*/")
            if os.path.exists(d + "result.index")][0]
    res = FlatDB.open(tmpd + "result")
    prof_db = FlatDB.open(f"{ORACLE}/profiles")
    matrix = load_pinned_matrix("blosum62_bf2_bias")
    exact = total_bytes = diff_bytes = 0
    N = 60
    for qk in range(N):
        recs, targets = [], []
        for ln in res.lines(qk):
            r = AlnRecord.parse(ln)
            if r.tkey == qk:
                continue
            if r.evalue < 0.001:
                r.backtrace = expand_cigar(r.backtrace)
                recs.append(r)
                targets.append(db.sequence(r.tkey))
        prof = compute_pssm(db.sequence(qk), targets, recs, matrix)
        mine = np.frombuffer(prof.to_buffer(), dtype=np.uint8)
        want = np.frombuffer(prof_db.get_bytes(qk), dtype=np.uint8)
        assert mine.size == want.size
        d = int((mine != want).sum())
        exact += d == 0
        total_bytes += mine.size
        diff_bytes += d
        if d:
            # deviations must be off-by-one int8 scores only
            m = mine[mine != want].view(np.int8).astype(np.int32)
            w = want[mine != want].view(np.int8).astype(np.int32)
            assert np.abs(m - w).max() <= 1
    assert exact >= int(N * 0.95)
    assert diff_bytes / total_bytes < 1e-4


def test_profile_profile_alignment_mode():
    """PROFILE_PROFILE banded traceback (VERDICT r4 missing #5;
    StripedSmithWaterman.cpp:1461-1470): identical profiles degenerate
    to the all-M self-alignment, and a profile pair constructed around
    a 4-residue insertion recovers the known M..D..M path with the
    combined-score cell formula."""
    import numpy as np
    from spacedust_tpu.native import banded_align_profile_profile

    rng = np.random.default_rng(3)
    go, ge = 11, 1
    Lq = 40
    qcons = rng.integers(0, 20, Lq).astype(np.uint8)
    # strong match profile: +8 on the consensus residue, -4 elsewhere
    qprof = np.full((20, Lq), -4, np.int8)
    qprof[qcons, np.arange(Lq)] = 8

    # identical profiles + consensus -> pure match alignment; per-cell
    # combined score of two equal scores s is s itself
    score_self = int(qprof[qcons, np.arange(Lq)].astype(int).sum())
    ops = banded_align_profile_profile(qcons, qcons, qprof, 0, qprof, 0,
                                       score_self, go, ge)
    assert ops == "M" * Lq

    # target = query with 4 residues inserted after position 20
    ins = rng.integers(0, 20, 4).astype(np.uint8)
    tcons = np.concatenate([qcons[:20], ins, qcons[20:]])
    Lt = len(tcons)
    tprof = np.full((20, Lt), -4, np.int8)
    tprof[tcons, np.arange(Lt)] = 8
    # expected path: 20 M, 4 D (gap in query), 20 M
    # matched cells score 8; gap cost go + 3*ge
    score = 8 * Lq - go - 3 * ge
    ops = banded_align_profile_profile(tcons, qcons, qprof, 0, tprof, 0,
                                       score, go, ge)
    assert ops == "M" * 20 + "D" * 4 + "M" * 20

    # asymmetric-profile cell formula check: against a scalar recompute
    # on the diagonal of the self case with a perturbed target profile
    tprof2 = qprof.copy()
    tprof2[qcons, np.arange(Lq)] = 2          # s1=8, s2=2 -> cell 5
    score2 = 5 * Lq
    ops2 = banded_align_profile_profile(qcons, qcons, qprof, 0, tprof2, 0,
                                        score2, go, ge)
    assert ops2 == "M" * Lq
