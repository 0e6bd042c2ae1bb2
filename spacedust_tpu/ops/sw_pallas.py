"""Pallas TPU kernel for the batched Smith-Waterman column scan.

The XLA formulation (ops/sw_tiled.sw_scan_core) carries the DP state
(H, E — (B, Lq) int32 each) through a lax.scan whose per-column carry
round-trips HBM; measured throughput tops out at a few GCUPS. This
kernel keeps the state resident in VMEM scratch across a sequential
grid walk over target tiles, so per-column work is pure VPU:

  grid = (B / BT, Lt / TT)   — TPU grids run sequentially, so VMEM
                               scratch persists along the Lt dimension
  S blocks (BT, TT, Lq) int8 stream HBM->VMEM via the BlockSpec
  pipeline in the einsum's NATIVE (B, Lt, Lq) layout (no transpose);
  the inner loop walks 8-column sub-blocks with static offsets —
  Mosaic requires provably-aligned mid-dimension slices — and unrolls
  the 8 columns.  The substitution grid S[b,j,i] =
  prof[b, :, i].onehot(t[b,j]) is produced OUTSIDE by one MXU einsum
  (cheap, exact in int8).

The math is bit-identical to sw_scan_core: Kadane clamp at 0, the
log-depth max-plus F scan, first-maximum argmax per column, strict->
global-best update, and the terminate-column semantics of the reverse
pass (StripedSmithWaterman.cpp:354-461 equivalents).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(1 << 30)


_UNROLL = 8


def _kernel_rowmax(ntiles_ref, qlens_ref, tlens_ref, term_ref, s_ref,
                   score_ref, gj_ref, gi_ref, fnd_ref, fj_ref, fi_ref,
                   h_scr, e_scr, rbest_scr, rcol_scr,
                   *, TT: int, Lq: int, gap_open: int, gap_extend: int,
                   dtype=jnp.int32):
    """Forward-only variant: instead of the per-column argmax (a lane
    reduce + first-max index scan, ~20 vector ops per column), track the
    per-ROW running best and the FIRST column achieving it (4 elementwise
    ops per column) and reduce ONCE at the last tile.  First-maximum
    semantics are preserved exactly: the reference's scan order (earliest
    end column, then smallest query row) equals (min rowcol among argmax
    rows, then min row among those) because strict-> updates freeze each
    row's first achieving column.  Cuts the per-column op count nearly
    in half -> ~1.7x kernel throughput on v5e, where the DP is
    instruction-issue-bound."""
    neg = jnp.asarray(NEG if dtype == jnp.int32 else -16384, dtype)
    j_tile = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(j_tile == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)
        e_scr[:] = jnp.full_like(e_scr, neg)
        rbest_scr[:] = jnp.zeros_like(rbest_scr)
        rcol_scr[:] = jnp.full_like(rcol_scr, -1)

    qlens = qlens_ref[:]                      # (BT, 1) int32
    tlens = tlens_ref[:]                      # (BT, 1)
    BT = qlens.shape[0]
    iota_q = jax.lax.broadcasted_iota(jnp.int32, (BT, Lq), 1)
    row_valid = iota_q < qlens                # (BT, Lq)
    go = jnp.asarray(gap_open, dtype)
    ge = jnp.asarray(gap_extend, dtype)
    ge_i = (ge * iota_q.astype(dtype))
    vmax = jnp.maximum

    # column-tile skipping: tiles at/after this block's max tlen cannot
    # change any output (col_valid gates every tracker update and H/E
    # corruption past tlen is unobservable), so the whole DP step is
    # skipped — the dispatcher sorts pairs by tlen so blocks are
    # tlen-homogeneous and the padded rung costs ~tlen, not ~Lt
    @pl.when(j_tile < ntiles_ref[pl.program_id(0)])
    def _compute():
        def blk_step(jb, carry):
            s_blk = s_ref[:, pl.ds(jb * _UNROLL, _UNROLL), :]

            def col_step(k, carry):
                H, E, rbest, rcol = carry
                col = j_tile * TT + jb * _UNROLL + k
                s_col = s_blk[:, k, :].astype(dtype)
                diag = jnp.pad(H[:, :-1], ((0, 0), (1, 0)))
                E_new = vmax(E - ge, H - go)
                Hbase = vmax(vmax(diag + s_col, jnp.asarray(0, dtype)),
                             E_new)
                x = jnp.pad((Hbase + ge_i)[:, :-1], ((0, 0), (1, 0)),
                            constant_values=neg)
                shift = 1
                while shift < Lq:
                    x = vmax(x, jnp.pad(x[:, :-shift],
                                        ((0, 0), (shift, 0)),
                                        constant_values=neg))
                    shift *= 2
                F = x - go - (ge_i - ge)
                H_new = jnp.where(row_valid, vmax(Hbase, F),
                                  jnp.asarray(0, dtype))
                # columns past tlen may corrupt H/E for their row, but
                # those values are only ever read by LATER columns of the
                # same row (also past tlen) — no output depends on them,
                # so the col_valid write-gates on H/E are dropped; only
                # the row tracker needs the gate
                better = (H_new.astype(jnp.int32) > rbest) & (col < tlens)
                rbest = jnp.where(better, H_new.astype(jnp.int32), rbest)
                rcol = jnp.where(better, col, rcol)
                return (H_new, E_new, rbest, rcol)

            for k in range(_UNROLL):
                carry = col_step(k, carry)
            return carry

        carry = (h_scr[:], e_scr[:], rbest_scr[:], rcol_scr[:])
        carry = jax.lax.fori_loop(0, TT // _UNROLL, blk_step, carry)
        H, E, rbest, rcol = carry
        h_scr[:] = H
        e_scr[:] = E
        rbest_scr[:] = rbest
        rcol_scr[:] = rcol

    @pl.when(j_tile == n_tiles - 1)
    def _emit():
        rb = jnp.where(row_valid, rbest_scr[:], -1)
        gmax = jnp.max(rb, axis=1, keepdims=True)          # (BT, 1)
        is_max = rb == gmax
        colsel = jnp.where(is_max, rcol_scr[:], jnp.int32(1 << 30))
        gj = jnp.min(colsel, axis=1, keepdims=True)
        at_gj = is_max & (rcol_scr[:] == gj)
        gi = jnp.min(jnp.where(at_gj, iota_q, jnp.int32(Lq)),
                     axis=1, keepdims=True)
        none = gmax <= 0                                    # no cell > 0
        score_ref[:] = jnp.maximum(gmax, 0)
        gj_ref[:] = jnp.where(none, -1, gj)
        gi_ref[:] = jnp.where(none, 0, gi)
        fnd_ref[:] = jnp.zeros_like(gmax)
        fj_ref[:] = jnp.full_like(gmax, -1)
        fi_ref[:] = jnp.zeros_like(gmax)


def _kernel(ntiles_ref, qlens_ref, tlens_ref, term_ref, s_ref,
            score_ref, gj_ref, gi_ref, fnd_ref, fj_ref, fi_ref,
            h_scr, e_scr, gmax_scr, gj_scr, gi_scr, fnd_scr, fj_scr, fi_scr,
            *, TT: int, Lq: int, gap_open: int, gap_extend: int,
            with_terminate: bool, dtype=jnp.int32):
    neg = jnp.asarray(NEG if dtype == jnp.int32 else -16384, dtype)
    j_tile = pl.program_id(1)
    n_tiles = pl.num_programs(1)

    @pl.when(j_tile == 0)
    def _init():
        h_scr[:] = jnp.zeros_like(h_scr)
        e_scr[:] = jnp.full_like(e_scr, neg)
        gmax_scr[:] = jnp.zeros_like(gmax_scr)
        gj_scr[:] = jnp.full_like(gj_scr, -1)
        gi_scr[:] = jnp.zeros_like(gi_scr)
        fnd_scr[:] = jnp.zeros_like(fnd_scr)
        fj_scr[:] = jnp.full_like(fj_scr, -1)
        fi_scr[:] = jnp.zeros_like(fi_scr)

    qlens = qlens_ref[:]                      # (BT, 1) int32
    tlens = tlens_ref[:]                      # (BT, 1)
    term = term_ref[:]
    BT = qlens.shape[0]
    iota_q = jax.lax.broadcasted_iota(jnp.int32, (BT, Lq), 1)
    row_valid = iota_q < qlens                # (BT, Lq)
    go = jnp.asarray(gap_open, dtype)
    ge = jnp.asarray(gap_extend, dtype)
    ge_i = (ge * iota_q.astype(dtype))

    # int16 on current hardware: v5e's VPU packs two i16 per 32-bit lane
    # (vector<8x128x2xi16>) but exposes no sub-lane integer ALU beyond
    # add/sub — Mosaic rejects vector i16 arith.maxsi ("failed to
    # legalize"), arith.cmpi ("Target does not support this
    # comparison"), AND arith.shrsi (so even a compare-free
    # sign-mask max `a - ((a-b) & ((a-b) >> 15))` cannot lower).  The
    # int16 variant therefore runs only in interpret mode / on future
    # targets; there is also no 2x-lane win to be had on v5e itself.
    vmax = jnp.maximum

    # see _kernel_rowmax: tiles past this block's max tlen are
    # output-neutral and skipped wholesale
    @pl.when(j_tile < ntiles_ref[pl.program_id(0)])
    def _compute():
        def blk_step(jb, carry):
            # 8-column sub-block with a provably-aligned start; columns
            # unrolled (also amortizes loop bookkeeping)
            s_blk = s_ref[:, pl.ds(jb * _UNROLL, _UNROLL), :]

            def col_step(k, carry):
                # every per-pair carry stays 2-D (BT, 1) int32 — 1-D/bool
                # loop carries fail Mosaic's scf.for legalization
                H, E, gmax, gj, gi, found, fj, fi = carry
                col = j_tile * TT + jb * _UNROLL + k
                # NB no per-column row mask on s_col: invalid rows (i >=
                # qlen) sit BELOW all valid rows and H is zeroed there
                # every column, so neither the diagonal term nor the
                # downward-flowing F scan can leak garbage into valid
                # rows, and the column max reads Hmasked.  (Also required
                # for the int16 variant: a NEG mask would overflow
                # diag + s.)
                s_col = s_blk[:, k, :].astype(dtype)
                diag = jnp.pad(H[:, :-1], ((0, 0), (1, 0)))
                E_new = vmax(E - ge, H - go)
                Hbase = vmax(vmax(diag + s_col, jnp.asarray(0, dtype)),
                             E_new)
                # F via log-depth running max of (Hbase + ge*i) shifted
                x = jnp.pad((Hbase + ge_i)[:, :-1], ((0, 0), (1, 0)),
                            constant_values=neg)
                shift = 1
                while shift < Lq:
                    x = vmax(x, jnp.pad(x[:, :-shift],
                                        ((0, 0), (shift, 0)),
                                        constant_values=neg))
                    shift *= 2
                F = x - go - (ge_i - ge)
                H_new = jnp.where(row_valid, vmax(Hbase, F),
                                  jnp.asarray(0, dtype))

                col_valid = (col < tlens)             # (BT, 1)
                H_out = jnp.where(col_valid, H_new, H)
                E_out = jnp.where(col_valid, E_new, E)

                Hmasked = jnp.where(row_valid, H_new.astype(jnp.int32), -1)
                cmax = jnp.max(Hmasked, axis=1, keepdims=True)   # (BT, 1)
                # first-maximum argmax (Mosaic lacks integer argmax)
                ci = jnp.min(jnp.where(Hmasked == cmax, iota_q,
                                       jnp.int32(Lq)),
                             axis=1, keepdims=True).astype(jnp.int32)
                better = col_valid & (cmax > gmax)
                gmax = jnp.where(better, cmax, gmax)
                gj = jnp.where(better, col, gj)
                gi = jnp.where(better, ci, gi)
                if with_terminate:
                    hit = col_valid & (found == 0) & (cmax == term)
                    fj = jnp.where(hit, col, fj)
                    fi = jnp.where(hit, ci, fi)
                    found = jnp.where(hit, 1, found)
                return (H_out, E_out, gmax, gj, gi, found, fj, fi)

            for k in range(_UNROLL):
                carry = col_step(k, carry)
            return carry

        carry = (h_scr[:], e_scr[:], gmax_scr[:], gj_scr[:], gi_scr[:],
                 fnd_scr[:], fj_scr[:], fi_scr[:])
        carry = jax.lax.fori_loop(0, TT // _UNROLL, blk_step, carry)
        H, E, gmax, gj, gi, found, fj, fi = carry
        h_scr[:] = H
        e_scr[:] = E
        gmax_scr[:] = gmax
        gj_scr[:] = gj
        gi_scr[:] = gi
        fnd_scr[:] = found
        fj_scr[:] = fj
        fi_scr[:] = fi

    @pl.when(j_tile == n_tiles - 1)
    def _emit():
        score_ref[:] = gmax_scr[:]
        gj_ref[:] = gj_scr[:]
        gi_ref[:] = gi_scr[:]
        fnd_ref[:] = fnd_scr[:]
        fj_ref[:] = fj_scr[:]
        fi_ref[:] = fi_scr[:]


@functools.partial(
    jax.jit,
    static_argnames=("gap_open", "gap_extend", "with_terminate", "bt", "tt",
                     "interpret", "all_outputs", "use16", "per_column"))
def sw_scan_pallas(S, qlens, tlens, terminate, gap_open: int,
                   gap_extend: int, with_terminate: bool = False,
                   bt: int = 128, tt: int | None = None,
                   interpret: bool = False, all_outputs: bool = False,
                   use16: bool = False, per_column: bool = True):
    """S: (B, Lt, Lq) int8 substitution grid in the einsum's native
    layout; per-pair lens int32. Returns (score, t_end, q_end) or
    (score, fj, fi, found), or all six outputs.

    per_column=False selects the forward-only row-tracking kernel
    (_kernel_rowmax, ~1.7x faster; no terminate-column support —
    found/fj/fi outputs are placeholders)."""
    B, Lt, Lq = S.shape
    # VMEM budget: the kernel keeps ~10 live (BT, Lq) int32 arrays
    # (H/E scratch + loop temporaries) plus the double-buffered S block
    # inside the 16 MB VMEM; size BT and TT accordingly.  Measured on
    # v5e: (BT=64, TT=128) beats (128, 16) ~1.3x at Lq=512 — fewer,
    # larger S blocks amortize per-grid-step overhead.
    BT = min(bt, B)
    # joint budget: double-buffered S blocks + ~14 live (BT, Lq) i32
    # arrays (H/E/row-trackers/scratch temporaries of the unrolled
    # column step) must fit the 16 MB VMEM; the 56x factor is calibrated
    # against the compiler's measured stack usage (rung 2048 showed
    # 16.35 MB at the old 48x estimate)
    while BT > 8 and 56 * BT * Lq > 4 * 1024 * 1024:
        BT //= 2
    if tt is None:
        tt = 128
        while (tt > 8 and 2 * tt * BT * Lq + 56 * BT * Lq
               > 11 * 1024 * 1024 + 512 * 1024):
            tt //= 2
    TT = min(tt, Lt)
    assert B % BT == 0 and Lt % TT == 0 and TT % 8 == 0
    grid = (B // BT, Lt // TT)

    # int16 DP state doubles the VPU lanes per op; only legal when the
    # caller guarantees max H + Lq stays under 2^15 (DeviceAlignDB
    # computes a per-DB score upper bound)
    dt = jnp.int16 if use16 else jnp.int32
    vec = lambda: pl.BlockSpec((BT, 1), lambda i, j, nt: (i, 0),
                               memory_space=pltpu.VMEM)
    out_shapes = [jax.ShapeDtypeStruct((B, 1), jnp.int32)] * 6
    if per_column:
        kern = functools.partial(_kernel, TT=TT, Lq=Lq, gap_open=gap_open,
                                 gap_extend=gap_extend,
                                 with_terminate=with_terminate or all_outputs,
                                 dtype=dt)
        scratch = [
            pltpu.VMEM((BT, Lq), dt),            # H
            pltpu.VMEM((BT, Lq), dt),            # E
            pltpu.VMEM((BT, 1), jnp.int32),      # gmax
            pltpu.VMEM((BT, 1), jnp.int32),      # gj
            pltpu.VMEM((BT, 1), jnp.int32),      # gi
            pltpu.VMEM((BT, 1), jnp.int32),      # found
            pltpu.VMEM((BT, 1), jnp.int32),      # fj
            pltpu.VMEM((BT, 1), jnp.int32),      # fi
        ]
    else:
        kern = functools.partial(_kernel_rowmax, TT=TT, Lq=Lq,
                                 gap_open=gap_open, gap_extend=gap_extend,
                                 dtype=dt)
        scratch = [
            pltpu.VMEM((BT, Lq), dt),            # H
            pltpu.VMEM((BT, Lq), dt),            # E
            pltpu.VMEM((BT, Lq), jnp.int32),     # per-row best
            pltpu.VMEM((BT, Lq), jnp.int32),     # first achieving col
        ]
    # per-BT-block count of ACTIVE column tiles (ceil(max tlen / TT));
    # the kernels skip the DP wholesale for tiles past it, and the S
    # index map clamps so skipped blocks are never even DMA'd (repeat
    # block index -> the pipeline keeps the previous block).  Dispatch
    # sorts pairs by tlen, so blocks are tlen-homogeneous and the padded
    # rung costs ~max tlen per block instead of ~Lt.
    ntiles = ((jnp.max(tlens.astype(jnp.int32).reshape(B // BT, BT),
                       axis=1) + TT - 1) // TT).astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[vec(), vec(), vec(),
                  pl.BlockSpec(
                      (BT, TT, Lq),
                      lambda i, j, nt: (i, jnp.minimum(j, nt[i] - 1), 0),
                      memory_space=pltpu.VMEM)],
        out_specs=[vec() for _ in range(6)],
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
    )(ntiles, qlens.reshape(B, 1), tlens.reshape(B, 1),
      terminate.reshape(B, 1), S)
    score, gj, gi, fnd, fj, fi = [o[:, 0] for o in outs]
    if all_outputs:
        return score, gj, gi, fnd, fj, fi
    if with_terminate:
        return score, fj, fi, fnd != 0
    return score, gj, gi


def score_grid(prof, tseq):
    """S[b, j, i] = prof[b, :, i] . onehot(tseq[b, j]) via one MXU bf16
    einsum in its native (B, Lt, Lq) layout; cast to int8 (scores fit).
    bf16 is EXACT here: every product is 0 or an int8 profile value
    (|v| <= 127 < 2^8, representable), and each output sums exactly one
    nonzero term — measured 1.45x over the int8->int32 dot on v5e (no
    int32 accumulator tiles, no wide intermediate).  No transpose: the
    kernel reads aligned (BT, TT, Lq) blocks."""
    A = prof.shape[1]
    onehot = (tseq[:, None, :] ==
              np.arange(A, dtype=np.int32)[None, :, None]
              ).astype(jnp.bfloat16)
    S = jax.lax.dot_general(
        onehot, prof.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.bfloat16)    # (B, Lt, Lq)
    return S.astype(jnp.int8)
