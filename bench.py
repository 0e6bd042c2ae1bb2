"""Benchmark: batched Smith-Waterman throughput on the default device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's striped SSW (AVX2) measured on this host via
.tmp/harness/bench_ssw at 1.504 GCUPS single-core (384x384 random pairs,
score-only) — the reference's own hot kernel. vs_baseline is the ratio of
our device throughput to that single-core figure.
"""

import json
import os
import time

import numpy as np

BASELINE_GCUPS = 1.504  # reference striped SW, 1 core, this host


def main() -> None:
    plat = os.environ.get("SPACEDUST_JAX_PLATFORM")
    import jax
    if plat:
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp
    from spacedust_tpu.ops.sw import _sw_scan, make_profiles
    from spacedust_tpu.stats.submat import load_substitution_matrix

    m = load_substitution_matrix()
    rng = np.random.default_rng(0)
    B, L = 512, 384
    q = rng.integers(0, 20, (B, L)).astype(np.uint8)
    t = rng.integers(0, 20, (B, L)).astype(np.int32)
    bias = np.zeros((B, L), dtype=np.int8)
    lens = np.full(B, L, np.int32)

    prof = jnp.asarray(make_profiles(q, lens, m.sub_int, bias))
    tseq = jnp.asarray(t)
    ql = jnp.asarray(lens)
    tl = jnp.asarray(lens)
    term = jnp.zeros(B, jnp.int32)

    # compile + warm up
    out = _sw_scan(prof, tseq, ql, tl, 11, 1, term, False)
    jax.block_until_ready(out)

    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = _sw_scan(prof, tseq, ql, tl, 11, 1, term, False)
    jax.block_until_ready(out)
    secs = (time.perf_counter() - t0) / reps

    cells = B * L * L
    gcups = cells / secs / 1e9
    print(json.dumps({
        "metric": "sw_gcups",
        "value": round(gcups, 3),
        "unit": "Gcells/s",
        "vs_baseline": round(gcups / BASELINE_GCUPS, 2),
    }))


if __name__ == "__main__":
    main()
