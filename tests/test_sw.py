"""Smith-Waterman kernel unit tests: exact scores vs a reference DP,
endpoint tie-breaks, and banded traceback round-trips."""

import numpy as np
import pytest

from spacedust_tpu.constants import encode_aa
from spacedust_tpu.native import banded_align
from spacedust_tpu.ops.sw import sw_forward, sw_reverse
from spacedust_tpu.stats.submat import load_substitution_matrix


def ref_sw(q, t, sub, bias, go=11, ge=1):
    """Textbook Gotoh local alignment in numpy for oracle comparison."""
    NEG = -10**9
    Lq, Lt = len(q), len(t)
    H = np.zeros((Lq + 1, Lt + 1), dtype=np.int64)
    E = np.full((Lq + 1, Lt + 1), NEG, dtype=np.int64)  # gap consuming t
    F = np.full((Lq + 1, Lt + 1), NEG, dtype=np.int64)  # gap consuming q
    for i in range(1, Lq + 1):
        for j in range(1, Lt + 1):
            E[i, j] = max(E[i, j - 1] - ge, H[i, j - 1] - go)
            F[i, j] = max(F[i - 1, j] - ge, H[i - 1, j] - go)
            s = sub[q[i - 1], t[j - 1]] + bias[i - 1]
            H[i, j] = max(0, H[i - 1, j - 1] + s, E[i, j], F[i, j])
    return H


@pytest.fixture(scope="module")
def matrix():
    return load_substitution_matrix()


def _run_one(matrix, qs, ts, bias=None):
    q = encode_aa(qs)
    t = encode_aa(ts)
    b = np.zeros(len(q), dtype=np.int8) if bias is None else bias
    score, q_end, t_end = sw_forward(
        q[None, :].copy(), np.array([len(q)]),
        t[None, :].copy(), np.array([len(t)]),
        matrix.sub_int, b[None, :].copy())
    H = ref_sw(q, t, matrix.sub_int, b)
    assert int(score[0]) == int(H.max()), f"{qs} vs {ts}"
    return int(score[0]), int(q_end[0]), int(t_end[0]), H


def test_identical_sequences(matrix):
    s, qe, te, H = _run_one(matrix, "MKVLAAGDEW", "MKVLAAGDEW")
    assert qe == 9 and te == 9


def test_gapped_alignment(matrix):
    s, qe, te, H = _run_one(matrix, "MKVLAAAGDEWRK", "MKVLGDEWRK")
    assert s > 0


def test_random_pairs_match_reference_dp(matrix):
    rng = np.random.default_rng(0)
    for _ in range(20):
        lq = int(rng.integers(5, 60))
        lt = int(rng.integers(5, 60))
        q = rng.integers(0, 20, lq).astype(np.uint8)
        t = rng.integers(0, 20, lt).astype(np.uint8)
        bias = rng.integers(-2, 3, lq).astype(np.int8)
        score, q_end, t_end = sw_forward(
            q[None, :].copy(), np.array([lq]), t[None, :].copy(),
            np.array([lt]), matrix.sub_int, bias[None, :].copy())
        H = ref_sw(q, t, matrix.sub_int, bias)
        assert int(score[0]) == int(H.max())
        if H.max() > 0:
            # endpoint: first target column with the max, min row within it
            cols = H[1:, 1:].max(axis=0)
            j_star = int(np.argmax(cols == H.max()))
            i_star = int(np.argmax(H[1:, j_star + 1] == H.max()))
            assert int(t_end[0]) == j_star
            assert int(q_end[0]) == i_star


def test_reverse_pass_finds_start(matrix):
    q = encode_aa("AAAAMKVLGDEWRKAAAA")
    t = encode_aa("CCMKVLGDEWRKCC")
    b = np.zeros(len(q), dtype=np.int8)
    score, q_end, t_end = sw_forward(
        q[None, :].copy(), np.array([len(q)]), t[None, :].copy(),
        np.array([len(t)]), matrix.sub_int, b[None, :].copy())
    qr = q[:int(q_end[0]) + 1][::-1]
    tr = t[:int(t_end[0]) + 1][::-1]
    br = b[:int(q_end[0]) + 1][::-1]
    _s, fj, fi, found = sw_reverse(
        qr[None, :].copy(), np.array([len(qr)]), tr[None, :].copy(),
        np.array([len(tr)]), matrix.sub_int, br[None, :].copy(),
        np.array([int(score[0])]))
    assert found[0]
    q_start = int(q_end[0]) - int(fi[0])
    t_start = int(t_end[0]) - int(fj[0])
    assert (q_start, t_start) == (4, 2)  # MKVL... begins at q[4], t[2]


def test_banded_traceback_identity(matrix):
    q = encode_aa("MKVLGDEWRK")
    score = int(matrix.sub_int[q, q].sum())
    ops = banded_align(q, q, np.zeros(len(q), np.int8),
                       matrix.sub_int.astype(np.int8), score)
    assert ops == "M" * len(q)


def test_banded_traceback_gap(matrix):
    q = encode_aa("MKVLAAAGDEWRK")
    t = encode_aa("MKVLGDEWRK")
    b = np.zeros(len(q), dtype=np.int8)
    H = ref_sw(q, t, matrix.sub_int, b)
    score = int(H.max())
    ops = banded_align(q, t, b, matrix.sub_int.astype(np.int8), score)
    # q has 3 extra residues -> 3 insertions
    assert ops.count("I") == 3
    assert ops.count("M") == 10
    assert ops.count("D") == 0


def test_pallas_interpret_matches_core():
    """The Pallas kernel is the production TPU scoring path; pin it
    bit-for-bit to sw_scan_core on CPU via interpret mode, covering
    non-full qlens/tlens, the terminate (reverse) tracker, and the
    first-maximum argmax (ADVICE r2)."""
    import numpy as np
    import jax.numpy as jnp
    from spacedust_tpu.ops.sw_pallas import score_grid, sw_scan_pallas
    from spacedust_tpu.ops.sw_tiled import sw_scan_core

    rng = np.random.default_rng(7)
    B, Lq, Lt = 16, 128, 256
    prof = jnp.asarray(rng.integers(-8, 12, (B, 21, Lq)).astype(np.int32))
    tseq = jnp.asarray(rng.integers(0, 20, (B, Lt)).astype(np.int32))
    qlens = jnp.asarray(
        rng.integers(3, Lq + 1, B).astype(np.int32))
    tlens = jnp.asarray(rng.integers(3, Lt + 1, B).astype(np.int32))
    term_off = jnp.full(B, -1, jnp.int32)

    ref = sw_scan_core(prof, tseq, qlens, tlens, 11, 1, term_off,
                       t_tile=64, all_outputs=True)
    S = score_grid(prof, tseq)
    got = sw_scan_pallas(S, qlens, tlens, term_off, 11, 1,
                         all_outputs=True, bt=8, tt=32, interpret=True)
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g),
                                      err_msg=f"output {i}")

    # terminate semantics: run reverse-style with terminate = the known
    # best score; the tracker must find the first column reaching it
    score = np.asarray(ref[0])
    term = jnp.asarray(score.astype(np.int32))
    ref_t = sw_scan_core(prof, tseq, qlens, tlens, 11, 1, term,
                         t_tile=64, with_terminate=True)
    got_t = sw_scan_pallas(S, qlens, tlens, term, 11, 1,
                           with_terminate=True, bt=8, tt=32, interpret=True)
    for i, (r, g) in enumerate(zip(ref_t, got_t)):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g),
                                      err_msg=f"terminate output {i}")


def test_pallas_int16_matches_core():
    """The int16 DP variant (used when the per-query score upper bound
    fits 2^15) must stay bit-identical to the int32 core."""
    import numpy as np
    import jax.numpy as jnp
    from spacedust_tpu.ops.sw_pallas import score_grid, sw_scan_pallas
    from spacedust_tpu.ops.sw_tiled import sw_scan_core

    rng = np.random.default_rng(11)
    B, Lq, Lt = 16, 128, 256
    prof = jnp.asarray(rng.integers(-8, 12, (B, 21, Lq)).astype(np.int32))
    tseq = jnp.asarray(rng.integers(0, 20, (B, Lt)).astype(np.int32))
    qlens = jnp.asarray(rng.integers(3, Lq + 1, B).astype(np.int32))
    tlens = jnp.asarray(rng.integers(3, Lt + 1, B).astype(np.int32))
    term = jnp.full(B, -1, jnp.int32)
    ref = sw_scan_core(prof, tseq, qlens, tlens, 11, 1, term,
                       t_tile=64, all_outputs=True)
    S = score_grid(prof, tseq)
    got = sw_scan_pallas(S, qlens, tlens, term, 11, 1, all_outputs=True,
                         bt=8, tt=32, interpret=True, use16=True)
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(g),
                                      err_msg=f"output {i}")
