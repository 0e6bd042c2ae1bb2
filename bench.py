"""Benchmark: batched Smith-Waterman throughput on the default device.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the production forward kernel (ops/sw_tiled.sw_scan_tiled: MXU
int8 score-grid matmul per 128-column target tile + int32 column scan)
at the batch size the alignment engine uses for large workloads.

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
    from spacedust_tpu.ops.sw import make_profiles
    from spacedust_tpu.ops.sw_tiled import sw_scan_tiled
    from spacedust_tpu.stats.submat import load_substitution_matrix

    m = load_substitution_matrix()
    rng = np.random.default_rng(0)
    B, L, t_tile = 2048, 384, 128
    if jax.default_backend() == "cpu":            # keep CPU runs tractable
        B = 128
    q = rng.integers(0, 20, (B, L)).astype(np.uint8)
    t = rng.integers(0, 20, (B, L)).astype(np.int32)
    bias = np.zeros((B, L), dtype=np.int8)
    lens = np.full(B, L, np.int32)

    prof = jnp.asarray(make_profiles(q, lens, m.sub_int, bias))
    tseq = jnp.asarray(t)
    ql = jnp.asarray(lens)
    tl = jnp.asarray(lens)
    term = jnp.zeros(B, jnp.int32)

    def run():
        return sw_scan_tiled(prof, tseq, ql, tl, 11, 1, term, t_tile=t_tile)

    # compile + warm up
    jax.block_until_ready(run())

    cells = B * L * L
    trials = []
    for _ in range(3):
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run()
        jax.block_until_ready(out)
        secs = (time.perf_counter() - t0) / reps
        trials.append(cells / secs / 1e9)
    gcups = sorted(trials)[len(trials) // 2]       # median vs dispatch jitter

    print(json.dumps({
        "metric": "sw_gcups",
        "value": round(gcups, 3),
        "unit": "Gcells/s",
        "vs_baseline": round(gcups / BASELINE_GCUPS, 2),
    }))


if __name__ == "__main__":
    main()
