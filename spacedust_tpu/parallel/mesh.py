"""Device mesh + sharding policy for multi-chip search.

The scaling axes follow SURVEY.md §2 (parallelism table): the target
SetDB (sequences + k-mer index) is sharded across chips along a single
`targets` mesh axis — the analogue of the reference's target-split MPI
mode (Prefiltering.cpp:575-722) — while query batches stream through
replicated. Per-shard hit lists are combined with an all-gather over ICI
instead of the reference's shared-filesystem merge.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.sw import _sw_scan


def make_mesh(devices=None, axis: str = "targets") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def sharded_sw_forward(mesh: Mesh, prof, tseqs, qlens, tlens,
                       gap_open: int = 11, gap_extend: int = 1):
    """Forward SW of one query profile batch against a target batch that
    is sharded across the mesh's `targets` axis.

    prof:  (B, A, Lq) int32 — replicated query profiles
    tseqs: (N, Lt) int32    — N divisible by mesh size, sharded
    qlens: (B,) int32 replicated; tlens: (N,) int32 sharded
    Pairing: each target n is scored against profile n % B (round-robin),
    so callers tile query profiles to match the target shard layout.
    Returns (score, t_end, q_end) each (N,), sharded then gathered.
    """
    axis = mesh.axis_names[0]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis, None), P(), P(axis)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    def _run(prof_rep, tseq_shard, qlens_rep, tlens_shard):
        n_local = tseq_shard.shape[0]
        b = prof_rep.shape[0]
        idx = jnp.arange(n_local) % b
        prof_local = prof_rep[idx]
        qlens_local = qlens_rep[idx]
        score, t_end, q_end = _sw_scan(
            prof_local, tseq_shard, qlens_local, tlens_shard,
            gap_open, gap_extend, jnp.zeros(n_local, jnp.int32), False)
        return score, t_end, q_end

    return _run(prof, tseqs, qlens, tlens)


def training_step(mesh: Mesh, prof, tseqs, qlens, tlens, min_score: int = 15):
    """One full sharded search step: per-shard SW scoring + top-hit
    reduction across shards (the all-gather that replaces the reference's
    split-file merge). jit-able over the mesh; used by dryrun_multichip.
    """
    score, t_end, q_end = sharded_sw_forward(mesh, prof, tseqs, qlens, tlens)
    # global hit mask + count (psum-style reduction over the gathered axis)
    hits = score >= min_score
    return {
        "scores": score,
        "t_end": t_end,
        "q_end": q_end,
        "num_hits": jnp.sum(hits.astype(jnp.int32)),
        "best_score": jnp.max(score),
    }
