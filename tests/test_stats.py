"""Unit tests for the statistics layer (substitution matrix, E-values,
P-value chain) pinned against in-repo anchors of the reference."""

import math

import numpy as np
import pytest

from spacedust_tpu.constants import encode_aa, AA_ORDER
from spacedust_tpu.stats.submat import load_substitution_matrix, composition_bias_int8
from spacedust_tpu.stats.evalue import EvalueComputation
from spacedust_tpu.stats.fmt import fmt_double_3e, fmt_seq_id
from spacedust_tpu.stats import pvalues as pv


def test_blosum62_classic_integers():
    m = load_substitution_matrix()
    # spot-check the canonical BLOSUM62 integer scores
    assert m.score("A", "A") == 4
    assert m.score("W", "W") == 11
    assert m.score("C", "C") == 9
    assert m.score("E", "K") == 1
    assert m.score("A", "X") == -1
    assert m.score("X", "X") == -1
    assert m.score("L", "I") == 2
    assert m.score("D", "E") == 2
    # symmetric
    assert np.array_equal(m.sub_int, m.sub_int.T)


def test_encode_special_letters():
    enc = encode_aa("AJZBUO*")
    assert AA_ORDER[enc[0]] == "A"
    assert AA_ORDER[enc[1]] == "L"  # J -> L
    assert AA_ORDER[enc[2]] == "E"  # Z -> E
    assert AA_ORDER[enc[3]] == "D"  # B -> D
    assert AA_ORDER[enc[4]] == "X"  # U -> X
    assert AA_ORDER[enc[5]] == "X"  # O -> X
    assert AA_ORDER[enc[6]] == "X"  # * -> X


def test_log_pval_formatting_roundtrip():
    """combinehits re-exponentiates the %.3E-rounded log P-value written by
    besthitbyset; sample_result.tsv hit 1 has eval=1.177E-21 and
    pval=1.179E-21 — the roundtrip must reproduce this exactly."""
    eval_ = 1.177e-21
    logp = pv.compute_log_pval(eval_)
    rounded = float(fmt_double_3e(logp))
    assert fmt_double_3e(math.exp(rounded)) == "1.179E-21"


def test_compute_log_pval_branches():
    assert pv.compute_log_pval(0.0) == math.log(pv.DBL_MIN)
    assert pv.compute_log_pval(1e-5) == math.log(1e-5)
    # boundary: reference's 10e-4 literal means 1e-3
    assert pv.compute_log_pval(5e-3) == math.log(1 - math.exp(-5e-3))
    assert pv.compute_log_pval(9.99e-4) == math.log(9.99e-4)


def test_lanczos_log_gamma_matches_lgamma():
    for x in [1.0, 2.0, 3.5, 10.0, 100.0, 1000.0]:
        assert math.isclose(pv.log_gamma(x), math.lgamma(x), rel_tol=1e-12)


def test_cluster_pvals_sane():
    lk = pv.make_cluster_lgamma_lookup(100)
    # k=2 hits spanning m=4 genes
    lp = pv.log_cluster_pval(lk, 2, 4)
    assert lp < 0
    # ordering p-value with k=2, m=1 conserved pair
    lo = pv.log_ordering_pval(lk, 2, 1)
    assert lo < 0


def test_precompute_log_b_monotone():
    lk = pv.make_lgamma_lookup(50)
    logb = pv.precompute_log_b(20, 1.0 / 21.0, lk)
    # B_i are partial sums of positive terms, decreasing in i
    assert np.all(np.diff(logb) < 0)


def test_truncated_fisher_matches_bruteforce():
    lk = pv.make_lgamma_lookup(50)
    orf_count = 10
    alpha = 1.0
    log_b = pv.precompute_log_b(orf_count, alpha / (orf_count + 1), lk)
    log_pvals = np.log(np.array([1e-10, 1e-8, 0.5]))
    k, p = pv.truncated_fisher_pval(log_pvals, orf_count, log_b, lk, 10e-7)
    assert k == 2
    assert 0 < p < 1e-4


def test_fmt_seq_id():
    assert fmt_seq_id(1.0) == "1.00"
    assert fmt_seq_id(0.272) == "0.272"
    assert fmt_seq_id(0.05) == "0.050"
    assert fmt_seq_id(0.005) == "0.005"
    assert fmt_seq_id(0.3799999) == "0.379"


class TestEvalue:
    def test_bitscore_formula(self):
        ev = EvalueComputation(10_000_000)
        # bitScore = (lambda*S - log K)/log 2
        s = 100
        bit = ev.compute_bit_score(s)
        assert math.isclose(
            bit, (ev.p.lam * s - math.log(ev.p.K)) / math.log(2), rel_tol=1e-14)

    def test_area_positive_and_monotone(self):
        ev = EvalueComputation(2_000_000)
        scores = np.arange(30, 500, 10, dtype=np.float64)
        areas = ev.area(scores, 300.0)
        assert np.all(areas > 0)
        evs = ev.compute_evalue(scores, 300.0)
        assert np.all(np.diff(evs) < 0)  # higher score -> lower E-value

    def test_sample_result_consistency(self, examples_dir):
        """There must exist an integer raw score whose E-value formats to the
        golden TSV's 1.177E-21 for hit 1 (qLen 294) given the example DB size."""
        import pathlib
        total = 0
        for f in ["NC_000913.faa", "NC_000915.faa"]:
            for line in pathlib.Path(f"{examples_dir}/{f}").read_text().splitlines():
                if not line.startswith(">"):
                    total += len(line.strip())
        ev = EvalueComputation(total)
        golden = "1.177E-21"
        found = [s for s in range(50, 400)
                 if fmt_double_3e(ev.compute_evalue(s, 294.0)) == golden]
        assert found, "no raw score reproduces the golden E-value"
