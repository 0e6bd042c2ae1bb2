"""Drive every native (C++) engine on real regression data — the body of
the ASan/UBSan check (tools/run_asan.sh).  Deliberately jax-free: ASan's
__cxa_throw interceptor is incompatible with jaxlib's nanobind/MLIR
bindings, so the sanitizer harness exercises the ctypes surface only
(that is where the hand-written memory management lives)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main() -> None:
    from spacedust_tpu.db.fasta import create_setdb_from_fastas
    from spacedust_tpu import native as N

    db = create_setdb_from_fastas([
        "/root/reference/examples/NC_000913.faa",
        "/root/reference/examples/NC_000915.faa"])
    sub = db.subset(list(range(200)) + list(range(4319, 4519)))
    print("db", sub.size, flush=True)

    # tantan + comp bias
    from spacedust_tpu.stats.submat import load_pinned_matrix
    seed = load_pinned_matrix("vtml80_bf8_bias")
    ratio = seed.prob / (seed.p_back[:, None] * seed.p_back[None, :])
    for k in range(0, sub.size, 37):
        N.tantan_mask(sub.sequence(k), ratio, 20)
    bias = N.comp_bias_batch(
        np.ascontiguousarray(sub.seq_data, np.uint8),
        np.ascontiguousarray(sub.offsets[:-1], np.int64),
        np.ascontiguousarray(sub.lengths, np.int32),
        np.ascontiguousarray(seed.sub_int, np.int32),
        np.ascontiguousarray(seed.p_back, np.float64))
    print("tantan/bias ok", flush=True)

    # index build + hash + full prefilter match (all hot loops)
    from spacedust_tpu.search.prefilter import PrefilterEngine
    eng = PrefilterEngine(sub, sub, same_qt_db=True, cov_thr=0.8,
                          cov_mode=2)
    hits = eng.match_all()
    n_cand = sum(len(v) for v in hits.values())
    print("prefilter ok", n_cand, flush=True)

    # cached-beam target-split surface: generate -> mask table ->
    # partition -> per-shard probe (the multi-chip prefilter path)
    from spacedust_tpu.constants import X_INDEX
    idx = eng.index
    qoffs = np.ascontiguousarray(sub.offsets[:64], np.int64)
    qdata = np.ascontiguousarray(
        sub.seq_data[:sub.offsets[63]], np.uint8)
    qlens = np.ascontiguousarray(sub.lengths[:63], np.int32)
    sc3 = np.ascontiguousarray(eng.tables.scores, np.int16)
    id3 = np.ascontiguousarray(eng.tables.idx, np.int16)
    bk, bw, boffs, corr8 = N.prefilter_generate_beams(
        qdata, qoffs[:63], qlens,
        np.ascontiguousarray(seed.sub_int, np.int32),
        np.ascontiguousarray(seed.p_back, np.float64), True,
        sc3, id3, idx.occupied, X_INDEX, eng.kmer_thr, want_corr8=True)
    sbm = np.ascontiguousarray(np.stack([idx.occupied, idx.occupied]))
    table = N.build_shard_mask_table(sbm)
    pk, pw, poffs = N.partition_beams(bk, bw, boffs, table, 2)
    N.prefilter_match_beams(
        qdata, qoffs[:63], qlens,
        np.ascontiguousarray(seed.sub_int, np.int32),
        np.ascontiguousarray(seed.p_back, np.float64), True,
        pk, pw, poffs[:64],
        idx.hkeys, idx.hoff, idx.hcnt, idx.occupied,
        np.ascontiguousarray(idx.seq_ids, np.int32),
        np.ascontiguousarray(idx.positions, np.int32),
        np.ascontiguousarray(idx.t_data, np.uint8),
        np.ascontiguousarray(idx.t_offsets, np.int64),
        np.ascontiguousarray(sub.lengths, np.int32),
        np.ascontiguousarray(eng.ungapped.sub_int, np.int32),
        300, 15, eng._bin_count, -1, 0.0, 0, corr8=corr8)
    print("beams ok", len(bk), flush=True)

    # overflow rounds (bounded match buffer) + profile-query batch
    eng._match_native(qdata, qoffs[:63], qlens, -1)  # warm path reuse
    from spacedust_tpu.native import prefilter_match_batch as _pmb
    import spacedust_tpu.native as _n
    orig = _n.prefilter_match_batch
    _n.prefilter_match_batch = (
        lambda *a, **kw: orig(*a, **{**kw, "match_cap": 512}))
    try:
        eng.match_range(0, 48)
    finally:
        _n.prefilter_match_batch = orig
    profiles = {q: (seed.sub_int[sub.sequence(q)][:, :20]
                    .astype(np.int16)) for q in range(0, 40, 7)}
    eng2 = PrefilterEngine(sub, sub, same_qt_db=True,
                           query_profiles=profiles, index=idx)
    eng2.match_all(list(profiles))
    print("overflow/profile ok", flush=True)

    # banded tracebacks (single + batch) on prefilter survivors
    from spacedust_tpu.stats.submat import load_substitution_matrix
    m = load_substitution_matrix()
    for q in list(hits)[:20]:
        qs = sub.sequence(q)
        b = bias[sub.offsets[q]:sub.offsets[q + 1]]
        self_score = int((m.sub_int[qs, qs] + b).sum())
        N.banded_align(qs, qs, b, m.sub_int.astype(np.int8),
                       score=self_score)
    # batched traceback incl. the native compressed-CIGAR emission
    ks = np.array(list(hits)[:16], np.int32)
    lens16 = sub.lengths[ks].astype(np.int32)
    _ops, _ids, _cigs = N.banded_align_batch(
        np.ascontiguousarray(sub.seq_data, np.uint8),
        np.ascontiguousarray(sub.offsets[:-1], np.int64),
        np.ascontiguousarray(sub.seq_data, np.uint8),
        np.ascontiguousarray(sub.offsets[:-1], np.int64),
        np.ascontiguousarray(bias, np.int8),
        m.sub_int.astype(np.int8), ks, ks,
        np.zeros(16, np.int32), lens16 - 1,
        np.zeros(16, np.int32), lens16 - 1,
        np.array([int((m.sub_int[sub.sequence(int(k)), sub.sequence(int(k))]
                       + bias[sub.offsets[int(k)]:sub.offsets[int(k) + 1]]
                       ).sum()) for k in ks], np.int32),
        want_cigar=True)
    assert all(c.endswith("M") for c in _cigs)
    # PROFILE_PROFILE mode + the OpenMP thread-cap export
    N.set_num_threads(2)
    qc = np.random.default_rng(5).integers(0, 20, 50).astype(np.uint8)
    pp = np.full((20, 50), -4, np.int8)
    pp[qc, np.arange(50)] = 8
    N.banded_align_profile_profile(qc, qc, pp, 0, pp, 0, 8 * 50)
    N.set_num_threads(0)
    print("banded ok", flush=True)

    # nucleotide banded extension
    rng = np.random.default_rng(0)
    a = rng.integers(0, 4, 400).astype(np.uint8)
    b = a.copy()
    b[::37] = (b[::37] + 1) % 4
    mat = np.full((5, 5), -3, np.int32)
    np.fill_diagonal(mat, 2)
    N.nucl_banded_align(a, b, 0, mat)
    print("nucl ok", flush=True)

    # clusterhits agglomeration
    K = 24
    qpos = np.arange(K, dtype=np.int64)
    tpos = np.arange(K, dtype=np.int64)
    strand = np.ones(K, dtype=np.uint8)
    lookup = np.log(np.linspace(1e-30, 1e-3, K))
    N.cluster_hits_native(qpos, tpos, strand, strand, lookup,
                          max_gene_gaps=3, s_min=0.0)
    print("clusterhits ok", flush=True)

    # PSSM reciprocal weights
    n = rng.integers(0, 5, (64, 24)).astype(np.int32)
    naa = rng.integers(1, 20, 64).astype(np.int32)
    N.w_contrib_rcp(n, naa)
    print("ALL NATIVE ENGINES OK", flush=True)


if __name__ == "__main__":
    main()
