"""3Di E-value calibration against the reference regression anchor.

The reference's --search-mode 2 path shells out to foldseek, whose
E-values come from a trained neural model that is not vendored; the
native structure engine uses Karlin-Altschul statistics of the combined
3Di+AA matrix with a pinned scale K (search/structure.py).  This script
reproduces the calibration that pinned K=300 and the 3Di seed threshold
118 against the 568-hit anchor (util/run_regression.sh:27-28):

  1. capture: run the full structure search at a loose E gate
     (eval_thr=1000) for a given seed threshold, saving every alignment
     record (K-independent up to the gate);
  2. sweep: rescale the captured E-values for candidate K values and
     replay the aggregation tail (besthit -> combinehits -> clusterhits
     -> summarize), counting final '>' hit lines;
  3. confirm: full live pipeline runs at the chosen (K, threshold)
     (SPACEDUST_3DI_K overrides K for probing).

Usage:
    python tools/calibrate_3di.py capture 118 /tmp/records.pkl
    python tools/calibrate_3di.py sweep /tmp/records.pkl 100 300 1000
"""

import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TESTDB = "/root/reference/examples/foldseek_testdb/foldseek_test"
BASE_K = 300.0   # the pinned K the capture runs with


def capture(thr: int, out: str) -> None:
    from spacedust_tpu.db.flatdb_ingest import create_setdb_from_flatdb
    from spacedust_tpu.search.structure import (StructureSearchParams,
                                                structure_search)
    db = create_setdb_from_flatdb(TESTDB)
    par = StructureSearchParams(eval_thr=1000.0, kmer_thr_3di=thr)
    recs = structure_search(db, db, par)
    with open(out, "wb") as fh:
        pickle.dump({qk: [(r.tkey, r.score, r.seq_id, r.evalue, r.qstart,
                           r.qend, r.qlen, r.tstart, r.tend, r.tlen,
                           r.backtrace, r.raw_score) for r in v]
                     for qk, v in recs.items()}, fh)
    print("captured", sum(len(v) for v in recs.values()), "records")


def sweep(path: str, ks) -> None:
    from spacedust_tpu.db.flatdb_ingest import create_setdb_from_flatdb
    from spacedust_tpu.search.records import AlnRecord
    from spacedust_tpu.cluster.aggregate import (besthit_by_set,
                                                 merge_results_by_set,
                                                 combine_hits)
    from spacedust_tpu.cluster.clusterhits import cluster_hits
    from spacedust_tpu.cluster.summarize import summarize_results

    db = create_setdb_from_flatdb(TESTDB)
    raw = pickle.load(open(path, "rb"))
    for k in ks:
        records = {}
        for qk, rows in raw.items():
            recs = []
            for (tkey, score, seq_id, evalue, qs, qe, ql, ts, te, tl,
                 bt, rscore) in rows:
                ev = evalue * (k / BASE_K)
                if ev <= 10.0:
                    recs.append(AlnRecord(
                        tkey=tkey, score=score, seq_id=seq_id, evalue=ev,
                        qstart=qs, qend=qe, qlen=ql, tstart=ts, tend=te,
                        tlen=tl, backtrace=bt, raw_score=rscore))
            recs.sort(key=lambda r: (r.evalue, -r.score, r.tlen, r.tkey))
            records[qk] = recs
        results = {qk: [[str(qk)] + r.columns() for r in recs]
                   for qk, recs in records.items()}
        agg = besthit_by_set(results, db, simple_best_hit=True,
                             subopt_hits_factor=0)
        merged = merge_results_by_set(agg, db)
        matches = combine_hits(merged, db, db, alpha=1.0,
                               aggregation_mode=0, filter_self_match=True)
        clusters = cluster_hits(matches, db, db, max_gene_gaps=3,
                                cluster_size=2, p_clu_thr=0.01,
                                p_mh_thr=0.01, alpha=1.0)
        tsv = summarize_results(clusters, db, db)
        hits = sum(1 for ln in tsv.splitlines() if ln.startswith(">"))
        print({"K": k, "hits": hits,
               "clusters": sum(1 for ln in tsv.splitlines()
                               if ln.startswith("#"))})


if __name__ == "__main__":
    if sys.argv[1] == "capture":
        capture(int(sys.argv[2]), sys.argv[3])
    else:
        sweep(sys.argv[2], [float(x) for x in sys.argv[3:]])
