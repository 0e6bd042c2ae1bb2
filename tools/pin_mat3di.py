"""Pin the 3Di substitution-matrix artifacts to data/derived/mat3di.json.

The 3Di structural alphabet and its substitution matrix come from
Foldseek (van Kempen et al., Nat Biotech 2024; distribution file
data/mat3di.out — the reference shells out to the foldseek binary for
--search-mode 1/2, src/commons/LocalParameters.h:76, so the matrix is
not vendored in /root/reference and is pinned here instead).

Background state frequencies are estimated from the 5898 3Di sequences
in the reference's checked-in examples/foldseek_testdb (E. coli +
H. pylori proteomes), and the ungapped Karlin-Altschul lambda of the
matrix under those frequencies is solved by bisection.
"""

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

AA_ORDER = "ACDEFGHIKLMNPQRSTVWYX"

# Foldseek mat3di.out (3Di states in ACDEFGHIKLMNPQRSTVWY order, ~2.1-bit
# integer scale).
MAT3DI = """
 6 -3  1  2  3 -2 -2 -7 -3 -3 -10 -5 -1  1 -4 -7 -5 -6  0 -2
-3  6 -2 -8 -5 -4 -4 -12 -13  1 -14  0  0  1 -1 -8 -9 -10 -8 -9
 1 -2  4 -3  0  1  1 -3 -5 -4 -5 -2  1 -1 -1 -4 -2 -3 -2 -2
 2 -8 -3  9 -2 -7 -4 -12 -10 -7 -17 -8 -6 -3 -8 -10 -10 -13 -6 -3
 3 -5  0 -2  7 -3 -3 -5 -2 -5 -8 -5 -2  0 -4 -7 -6 -7  4 -4
-2 -4  1 -7 -3  6  3 -1 -7 -7 -2 -2  0 -3  2 -3 -4 -6 -5 -5
-2 -4  1 -4 -3  3  6 -4 -7 -6 -6  0 -1 -3  1 -3 -5 -8 -4 -6
-7 -12 -3 -12 -5 -1 -4  8 -5 -11  3 -5 -8 -12 -6  1 -3 -7 -7 -9
-3 -13 -5 -10 -2 -7 -7 -5  9 -11 -10 -8 -6 -9 -9 -5 -4 -4 -2 -10
-3  1 -4 -7 -5 -7 -6 -11 -11  6 -16 -3 -2  2 -4 -9 -12 -10 -9 -10
-10 -14 -5 -17 -8 -2 -6  3 -10 -16 10 -9 -11 -15 -6  1 -6 -10 -8 -13
-5  0 -2 -8 -5 -2  0 -5 -8 -3 -9  7  0 -2  2 -2 -6 -8 -6 -8
-1  0  1 -6 -2  0 -1 -8 -6 -2 -11  0  4  0  0 -4 -5 -6 -4 -5
 1  1 -1 -3  0 -3 -3 -12 -9  2 -15 -2  0  5 -2 -8 -9 -10 -5 -5
-4 -1 -1 -8 -4  2  1 -6 -9 -4 -6  2  0 -2  6 -3 -5 -8 -5 -7
-7 -8 -4 -10 -7 -3 -3  1 -5 -9  1 -2 -4 -8 -3  6  0 -4 -8 -9
-5 -9 -2 -10 -6 -4 -5 -3 -4 -12 -6 -6 -5 -9 -5  0  8 -9 -7 -10
-6 -10 -3 -13 -7 -6 -8 -7 -4 -10 -10 -8 -6 -10 -8 -4 -9  9 -10 -11
 0 -8 -2 -6  4 -5 -4 -7 -2 -9 -8 -6 -4 -5 -5 -8 -7 -10  8 -6
-2 -9 -2 -3 -4 -5 -6 -9 -10 -10 -13 -8 -5 -5 -7 -9 -10 -11 -6  9
"""


def ka_lambda(sub: np.ndarray, p: np.ndarray) -> float:
    """Solve sum_ij p_i p_j exp(lambda * s_ij) = 1 for lambda > 0."""
    def f(lam):
        return float((p[:, None] * p[None, :] * np.exp(lam * sub)).sum() - 1.0)
    lo, hi = 1e-6, 4.0
    while f(hi) < 0:
        hi *= 2
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if f(mid) < 0:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def main():
    from spacedust_tpu.db.mmseqs_io import FlatDB

    sub = np.array([[int(v) for v in row.split()]
                    for row in MAT3DI.strip().splitlines()], dtype=np.int32)
    assert sub.shape == (20, 20)
    assert (sub == sub.T).all(), "3Di matrix must be symmetric"

    # background from the testdb 3Di states
    ss_db = FlatDB.open("/root/reference/examples/foldseek_testdb/foldseek_test_ss")
    counts = np.zeros(20, dtype=np.int64)
    aa_index = {c: i for i, c in enumerate(AA_ORDER[:20])}
    for _k, entry in ss_db.entries():
        for ch in entry.strip():
            if ch in aa_index:
                counts[aa_index[ch]] += 1
    p = counts / counts.sum()

    lam = ka_lambda(sub.astype(np.float64), p)
    # joint probabilities implied by the matrix + background (used for
    # tantan masking likelihood ratios)
    prob = p[:, None] * p[None, :] * np.exp(lam * sub)
    prob /= prob.sum()

    # 21-state (with X) padded arrays in the package's matrix layout
    sub21 = np.zeros((21, 21), dtype=np.int32)
    sub21[:20, :20] = sub
    prob21 = np.full((21, 21), 1e-10)
    prob21[:20, :20] = prob
    p21 = np.zeros(21)
    p21[:20] = p
    p21[20] = 1e-5

    out = {
        "name": "mat3di.out",
        "bit_factor": 2.1,
        "score_bias": 0.0,
        "lambda": lam,
        "background": p21.tolist(),
        "sub_int": sub21.tolist(),
        "prob": prob21.tolist(),
        "alphabet": AA_ORDER,
    }
    dest = Path(__file__).resolve().parents[1] / \
        "spacedust_tpu/data/derived/mat3di.json"
    dest.write_text(json.dumps(out))
    print(f"lambda={lam:.5f} background={np.round(p, 4).tolist()}")
    print(f"wrote {dest}")


if __name__ == "__main__":
    main()
