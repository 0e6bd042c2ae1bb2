"""Multi-chip clustersearch: target-sharded prefilter + mesh-sharded SW.

The real pipeline over a device mesh, mirroring the reference's MPI
target-split mode (Prefiltering.cpp:575-722, Alignment.cpp:219-242):

  1. the target SetDB is cut into residue-balanced contiguous shards
     (parallel/split.py = decomposeDomainByAminoAcid semantics);
  2. the k-mer prefilter runs per shard (shard-local index, exactly the
     single-chip engine's semantics) and per-query shard hit lists are
     merged with a recomputed global histogram threshold — the analog of
     the reference's split merge + re-threshold
     (Prefiltering::mergeTargetSplits, Prefiltering.cpp:379-560);
  3. Smith-Waterman runs on the mesh: device d holds shard d's tokens
     resident in HBM and scores only pairs whose target lives in its
     shard (parallel/sw_sharded.py); per-shard results merge on host
     (or via ICI all-gather, ShardedAlignDB.gather_scores);
  4. the aggregation tail (besthit -> combinehits -> clusterhits ->
     summarize) is unchanged — it consumes the merged records.

Because the per-pair SW math and the per-target prefilter state machine
are split-invariant, an n-device sharded search produces the same
records as the single-chip path (tests/test_multichip.py asserts TSV
equality on a real-genome slice).  The only caveat, shared with the
reference's own split mode, is tie ORDER inside the --max-seqs
truncation when a query saturates the hit cap.
"""

from __future__ import annotations

import numpy as np

from ..db.setdb import SetDB
from ..search.alignment import AlignmentEngine, AlignmentParams
from ..search.prefilter import PrefilterEngine, PrefilterHit, _score_threshold
from .split import residue_balanced_splits
from .sw_sharded import ShardedAlignDB, make_mesh


def sharded_prefilter(query_db: SetDB, target_db: SetDB,
                      shards: list[tuple[int, int]],
                      sensitivity: float = 5.7, max_seqs: int = 300,
                      min_diag_score: int = 15,
                      comp_bias_correction: bool = True, mask: bool = True,
                      cov_thr: float = 0.0, cov_mode: int = 0,
                      same_qt_db: bool = False
                      ) -> dict[int, list[PrefilterHit]]:
    """Per-shard prefilter + reference-style split merge.

    Each shard runs the full single-chip engine (native batch matcher)
    against a shard-local index with no identity slot and no coverage
    filter; the merge re-applies the global histogram threshold, the
    identity slot, the --max-seqs cap, and the coverage filter in the
    single-chip order (QueryMatcher.cpp:100-210 semantics).

    Shards run CONCURRENTLY (ThreadPoolExecutor around the GIL-free
    native engine) — the in-process model of one engine per host; the
    per-shard wall times land in sharded_prefilter.last_stats for the
    scaling-efficiency accounting in bench.py.  Pool width is capped at
    cpu_count/2 (each engine is itself OpenMP-parallel) so per-shard
    walls stay meaningful on small hosts instead of measuring
    oversubscription."""
    import os
    import time
    from concurrent.futures import ThreadPoolExecutor

    def one(args):
        si, (s, e) = args
        t0 = time.perf_counter()
        # zero-copy view of the contiguous shard: with an mmapped SetDB
        # only the shard actually touched becomes resident (true
        # out-of-core; DBReader MMAP mode)
        shard_db = target_db.subrange(s, e)
        eng = PrefilterEngine(query_db, shard_db, sensitivity=sensitivity,
                              max_seqs=max_seqs,
                              min_diag_score=min_diag_score,
                              same_qt_db=False,
                              comp_bias_correction=comp_bias_correction,
                              mask=mask, cov_thr=0.0, cov_mode=0)
        hits = eng.match_all()
        out = {qk: [PrefilterHit(h.seq_id + s, h.score, h.diagonal)
                    for h in hs] for qk, hs in hits.items()}
        return out, time.perf_counter() - t0

    width = max(1, min(len(shards), (os.cpu_count() or 2) // 2))
    with ThreadPoolExecutor(max_workers=width) as pool:
        results = list(pool.map(one, enumerate(shards)))
    per_shard = [r[0] for r in results]
    t_merge0 = __import__("time").perf_counter()

    tlens = target_db.lengths
    out: dict[int, list[PrefilterHit]] = {}
    for qk in range(query_db.size):
        merged: list[PrefilterHit] = []
        for sh in per_shard:
            merged.extend(sh.get(qk, []))
        # global histogram threshold over clamped scores (mergeTargetSplits
        # re-threshold; sub-floor bins cannot change the floored result)
        clamped = np.fromiter((min(h.score, 255) for h in merged), np.int64,
                              len(merged))
        fake = np.zeros((len(merged), 3), dtype=np.int64)
        if len(merged):
            fake[:, 2] = clamped
        thr = max(min_diag_score, _score_threshold(fake, max_seqs))
        order = np.argsort(-clamped, kind="stable")
        res: list[PrefilterHit] = []
        if same_qt_db:
            res.append(PrefilterHit(seq_id=qk, score=65535, diagonal=0))
        for i in order:
            if len(res) >= max_seqs:
                break
            h = merged[i]
            if min(h.score, 255) >= thr and not (same_qt_db and h.seq_id == qk):
                res.append(h)
        if cov_thr > 0.0 and cov_mode in (0, 2, 5):
            qlen = np.float32(query_db.lengths[qk])
            kept = []
            for h in res:
                tlen = np.float32(tlens[h.seq_id])
                if cov_mode == 0:
                    ok = (qlen / tlen >= np.float32(cov_thr)
                          and tlen / qlen >= np.float32(cov_thr))
                elif cov_mode == 2:
                    ok = tlen / qlen >= np.float32(cov_thr)
                else:
                    ok = (min(tlen, qlen) / max(tlen, qlen)
                          >= np.float32(cov_thr))
                if ok:
                    kept.append(h)
            res = kept
        out[qk] = res
    sharded_prefilter.last_stats = {
        "shard_s": [round(r[1], 3) for r in results],
        "merge_s": round(__import__("time").perf_counter() - t_merge0, 3),
    }
    return out


def query_split_prefilter(query_db: SetDB, target_db: SetDB,
                          n_splits: int,
                          sensitivity: float = 5.7, max_seqs: int = 300,
                          comp_bias_correction: bool = True,
                          mask: bool = True, cov_thr: float = 0.0,
                          cov_mode: int = 0, same_qt_db: bool = False
                          ) -> dict[int, list[PrefilterHit]]:
    """Query-split mode (the reference's preferred split when the index
    fits memory, Prefiltering.cpp:273-377): every host holds the full
    target index and prefilters a residue-balanced query slice.  Unlike
    the target split, the per-query k-mer beam generation — the dominant
    cost — shards linearly, and the merge is a trivial concatenation
    (results are per-query complete).  Per-slice wall times land in
    query_split_prefilter.last_stats."""
    import time
    eng = PrefilterEngine(query_db, target_db, sensitivity=sensitivity,
                          max_seqs=max_seqs, same_qt_db=same_qt_db,
                          comp_bias_correction=comp_bias_correction,
                          mask=mask, cov_thr=cov_thr, cov_mode=cov_mode)
    splits = residue_balanced_splits(query_db.lengths, n_splits)
    out: dict[int, list[PrefilterHit]] = {}
    times = []
    for (s, e) in splits:
        t0 = time.perf_counter()
        out.update(eng.match_range(s, e))
        times.append(round(time.perf_counter() - t0, 3))
    query_split_prefilter.last_stats = {"slice_s": times}
    return out


class ShardedAlignmentEngine(AlignmentEngine):
    """AlignmentEngine whose forward/reverse SW batches run on a device
    mesh with per-device target-shard residency."""

    def __init__(self, query_db: SetDB, target_db: SetDB,
                 params: AlignmentParams, mesh,
                 shards: list[tuple[int, int]],
                 same_qt_db: bool | None = None):
        super().__init__(query_db, target_db, params, same_qt_db=same_qt_db)
        from ..native import comp_bias_batch
        self.mesh = mesh
        self.shards = shards
        self.key_bounds = np.array([s for s, _ in shards] + [shards[-1][1]],
                                   dtype=np.int64)
        qdata = np.ascontiguousarray(query_db.seq_data, dtype=np.uint8)
        qoffs = np.ascontiguousarray(query_db.offsets[:-1], dtype=np.int64)
        qlens = np.ascontiguousarray(query_db.lengths, dtype=np.int32)
        if params.comp_bias_correction:
            qbias = comp_bias_batch(
                qdata, qoffs, qlens,
                np.ascontiguousarray(self.matrix.sub_int, dtype=np.int32),
                np.ascontiguousarray(self.matrix.p_back, dtype=np.float64))
        else:
            qbias = np.zeros(len(qdata), dtype=np.int8)
        self._qoffs = qoffs
        toffs = target_db.offsets
        tok_bounds = [(int(toffs[s]), int(toffs[e])) for s, e in shards]
        self._toffs = toffs
        self._tok_starts = np.array([b[0] for b in tok_bounds], dtype=np.int64)
        self.sharded_db = ShardedAlignDB(
            mesh, qdata, qbias,
            np.ascontiguousarray(target_db.seq_data, dtype=np.uint8),
            tok_bounds, self.matrix.sub_int)

    def _shard_of(self, tkeys: np.ndarray) -> np.ndarray:
        return (np.searchsorted(self.key_bounds, tkeys, side="right")
                - 1).astype(np.int64)

    def _run_grid_jobs(self, qk, tk, ql, tl, term, reverse: bool):
        """Dispatch (qk, tk) pairs over the mesh grid; ql/tl are the
        (possibly truncated) SW lengths. Returns per-pair result tuples."""
        from ..ops.sw_engine import bucket_len, batch_width
        n = len(qk)
        out = [None] * n
        if n == 0:
            return out
        n_dev = self.mesh.devices.size
        shard = self._shard_of(tk)
        buckets: dict[tuple[int, int], list[int]] = {}
        for i in range(n):
            buckets.setdefault((bucket_len(int(ql[i])), bucket_len(int(tl[i]))),
                               []).append(i)
        for key, idxs in sorted(buckets.items()):
            per_dev: list[list[int]] = [[] for _ in range(n_dev)]
            for i in idxs:
                per_dev[shard[i]].append(i)
            W = batch_width(*key)
            rounds = max(1, -(-max(len(p) for p in per_dev) // W))
            for r in range(rounds):
                chunks = [p[r * W:(r + 1) * W] for p in per_dev]
                B = max(len(c) for c in chunks)
                if B == 0:
                    continue
                grid = np.zeros((5, n_dev, B), dtype=np.int32)
                grid[1] = 1  # qlen pad
                grid[3] = 1  # tlen pad
                for d, c in enumerate(chunks):
                    if not c:
                        continue
                    sel = np.asarray(c)
                    grid[0, d, :len(c)] = self._qoffs[qk[sel]]
                    grid[1, d, :len(c)] = ql[sel]
                    grid[2, d, :len(c)] = (self._toffs[tk[sel]]
                                           - self._tok_starts[d])
                    grid[3, d, :len(c)] = tl[sel]
                    grid[4, d, :len(c)] = term[sel]
                res = self.sharded_db.run_grid(
                    key, grid[0], grid[1], grid[2], grid[3], grid[4],
                    self.par.gap_open, self.par.gap_extend, reverse)
                for d, c in enumerate(chunks):
                    for bi, pidx in enumerate(c):
                        out[pidx] = tuple(int(x[d, bi]) for x in res)
        return out

    def _run_forward(self, pairs):
        if not pairs:
            return []
        n = len(pairs)
        qk = np.fromiter((p[0] for p in pairs), np.int64, n)
        tk = np.fromiter((p[1] for p in pairs), np.int64, n)
        ql = self.qdb.lengths[qk].astype(np.int32)
        tl = self.tdb.lengths[tk].astype(np.int32)
        term = np.zeros(n, np.int32)
        res = self._run_grid_jobs(qk, tk, ql, tl, term, reverse=False)
        return [(r[0], r[2], r[1]) for r in res]  # (score, q_end, t_end)

    def _run_reverse(self, survivors):
        if not survivors:
            return []
        n = len(survivors)
        qk = np.fromiter((s[0] for s in survivors), np.int64, n)
        tk = np.fromiter((s[1] for s in survivors), np.int64, n)
        term = np.fromiter((s[2] for s in survivors), np.int32, n)
        ql = np.fromiter((s[3] + 1 for s in survivors), np.int32, n)
        tl = np.fromiter((s[4] + 1 for s in survivors), np.int32, n)
        res = self._run_grid_jobs(qk, tk, ql, tl, term, reverse=True)
        out = []
        for (qs, ts), r in zip(((s[3], s[4]) for s in survivors), res):
            _score, fj, fi, found = r
            if not found:
                raise RuntimeError("forward/backward SW scores differ")
            out.append((qs - fi, ts - fj))
        return out


def sharded_search(query_db: SetDB, target_db: SetDB, mesh=None,
                   n_shards: int | None = None, params=None,
                   same_qt_db: bool | None = None,
                   sensitivity: float = 5.7, max_seqs: int = 300,
                   mask: bool = True):
    """Full sharded search stage: prefilter + alignment over the mesh.
    Returns records identical to PrefilterEngine + AlignmentEngine."""
    mesh = mesh or make_mesh()
    par = params or AlignmentParams()
    if same_qt_db is None:
        same_qt_db = query_db is target_db
    n = n_shards or mesh.devices.size
    shards = residue_balanced_splits(target_db.lengths, n)
    cands_hits = sharded_prefilter(
        query_db, target_db, shards, sensitivity=sensitivity,
        max_seqs=max_seqs, comp_bias_correction=par.comp_bias_correction,
        mask=mask, cov_thr=par.cov_thr, cov_mode=par.cov_mode,
        same_qt_db=same_qt_db)
    candidates = {qk: [h.seq_id for h in hs] for qk, hs in cands_hits.items()}
    eng = ShardedAlignmentEngine(query_db, target_db, par, mesh, shards,
                                 same_qt_db=same_qt_db)
    return eng.align_all(candidates)


def sharded_cluster_search(query_db: SetDB, target_db: SetDB, params=None,
                           mesh=None, n_shards: int | None = None):
    """clustersearch with the search stage sharded over a device mesh;
    the aggregation tail is the standard host path."""
    from ..workflow.clustersearch import (ClusterSearchParams,
                                          ClusterSearchResult)
    from ..cluster.aggregate import (besthit_by_set, merge_results_by_set,
                                     combine_hits)
    from ..cluster.clusterhits import cluster_hits
    from ..cluster.summarize import summarize_results, seq_to_clu

    par = params or ClusterSearchParams()
    apar = AlignmentParams(gap_open=par.gap_open, gap_extend=par.gap_extend,
                           eval_thr=par.eval_thr, cov_thr=par.cov_thr,
                           cov_mode=par.cov_mode,
                           aln_len_thr=par.aln_len_thr,
                           comp_bias_correction=par.comp_bias_correction)
    records = sharded_search(query_db, target_db, mesh=mesh,
                             n_shards=n_shards, params=apar,
                             same_qt_db=query_db is target_db,
                             sensitivity=par.sensitivity,
                             max_seqs=par.max_seqs, mask=par.mask)
    results = {qk: [[str(qk)] + r.columns() for r in recs]
               for qk, recs in records.items()}
    agg = besthit_by_set(results, target_db,
                         simple_best_hit=par.simple_best_hit,
                         subopt_hits_factor=par.subopt_hits_factor)
    merged = merge_results_by_set(agg, query_db)
    matches = combine_hits(merged, query_db, target_db, alpha=par.alpha,
                           aggregation_mode=par.aggregation_mode,
                           filter_self_match=par.filter_self_match)
    clusters = cluster_hits(matches, query_db, target_db,
                            max_gene_gaps=par.max_gene_gaps,
                            cluster_size=par.cluster_size,
                            p_clu_thr=par.p_clu_thr,
                            p_mh_thr=par.p_mh_thr, alpha=par.alpha)
    tsv = summarize_results(clusters, query_db, target_db)
    return ClusterSearchResult(tsv=tsv, clusters=clusters, matches=matches,
                               seq_to_clu=seq_to_clu(clusters))
