"""Target-profile (exhaustive) search: query genes vs cluster profiles.

Native equivalent of the reference's exhaustive sliced target-profile
search (lib/mmseqs/src/workflow/Search.cpp:357-399 +
data/workflow/searchslicedtargetprofile.sh): the roles are inverted —
profiles run as queries against the gene DB — then results are swapped
back (swapresults, Matcher.h:93-115), recomputing each E-value from the
bit score against the profile DB's residue count.

Faithful parameter transforms (Search.cpp:365-375):
  * eval threshold scaled by #genes/#profiles for the inverted align
  * coverage mode swapped (Util::swapCoverageMode)
  * prefilter hit cap raised to max(300, #genes)
The reference's inner cluster-output align + final full align pair is
collapsed into one full align pass (identical acceptance criteria).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..db.setdb import SetDB
from ..stats.evalue import EvalueComputation, BLOSUM62_GAPPED_11_1
from ..workflow.clusterdb import ClusterDB
from .alignment import (AlignmentEngine, AlignmentParams,
                        COV_MODE_BIDIRECTIONAL, COV_MODE_QUERY,
                        COV_MODE_TARGET)
from .prefilter import PrefilterEngine
from .records import AlnRecord


def swap_coverage_mode(cov_mode: int) -> int:
    if cov_mode == COV_MODE_QUERY:
        return COV_MODE_TARGET
    if cov_mode == COV_MODE_TARGET:
        return COV_MODE_QUERY
    return cov_mode


def swap_record(rec: AlnRecord, qkey: int, evaluer: EvalueComputation
                ) -> AlnRecord:
    """Matcher::result_t::swapResult: exchange query/target fields, flip
    I<->D in the backtrace, recompute the E-value from the bit score with
    the swapped DB size (Matcher.h:93-115)."""
    raw = float(evaluer.compute_raw_score_from_bit_score(rec.score))
    evalue = float(evaluer.compute_evalue(raw, rec.tlen))
    bt = rec.backtrace.replace("I", "x").replace("D", "I").replace("x", "D")
    return AlnRecord(tkey=qkey, score=rec.score, seq_id=rec.seq_id,
                     evalue=evalue,
                     qstart=rec.tstart, qend=rec.tend, qlen=rec.tlen,
                     tstart=rec.qstart, tend=rec.qend, tlen=rec.qlen,
                     backtrace=bt, raw_score=rec.raw_score,
                     qcov=rec.tcov, tcov=rec.qcov)


@dataclass
class ProfileSearchParams:
    """clustersearch --profile-cluster-search defaults
    (src/workflow/clustersearch.cpp:29-36): e 1e-3, 100 results,
    query-cov 0.8, aln len 30, s 5.7."""
    sensitivity: float = 5.7
    eval_thr: float = 1e-3
    max_res_list_len: int = 100
    cov_thr: float = 0.8
    cov_mode: int = COV_MODE_QUERY
    aln_len_thr: int = 30
    gap_open: int = 11
    gap_extend: int = 1
    mask: bool = True
    comp_bias_correction: bool = True


def search_profile_target(query_db: SetDB, target_db: SetDB,
                          cdb: ClusterDB,
                          params: ProfileSearchParams | None = None
                          ) -> dict[int, list[AlnRecord]]:
    """Search query genes against the target's cluster-representative
    profiles. Returns query key -> profile hits (tkey = rep key), sorted
    by Matcher::compareHits and capped at max_res_list_len."""
    par = params or ProfileSearchParams()
    n_genes = query_db.size
    n_profiles = len(cdb.rep_keys)

    # inverted search: profiles are the queries
    pref = PrefilterEngine(target_db, query_db,
                           sensitivity=par.sensitivity,
                           max_seqs=max(300, n_genes),
                           same_qt_db=False,
                           comp_bias_correction=par.comp_bias_correction,
                           mask=par.mask,
                           cov_thr=par.cov_thr,
                           cov_mode=swap_coverage_mode(par.cov_mode),
                           query_profiles=cdb.pssms)
    cands = {rep: [h.seq_id for h in pref.match_query(rep)]
             for rep in cdb.rep_keys}

    inv_eval = par.eval_thr * (float(n_genes) / float(n_profiles))
    aln_par = AlignmentParams(gap_open=par.gap_open,
                              gap_extend=par.gap_extend,
                              eval_thr=inv_eval, cov_thr=par.cov_thr,
                              cov_mode=swap_coverage_mode(par.cov_mode),
                              aln_len_thr=par.aln_len_thr,
                              comp_bias_correction=par.comp_bias_correction)
    eng = AlignmentEngine(target_db, query_db, aln_par, same_qt_db=False,
                          query_profiles=cdb.aln_profiles)
    inv_records = eng.align_all(cands)

    # swapresults: profile-DB residue count = sum of profile lengths
    profile_res = int(sum(cdb.pssms[r].shape[0] for r in cdb.rep_keys))
    evaluer = EvalueComputation(profile_res, BLOSUM62_GAPPED_11_1)
    swapped: dict[int, list[AlnRecord]] = {qk: [] for qk in range(n_genes)}
    for rep, recs in inv_records.items():
        for r in recs:
            swapped[r.tkey].append(swap_record(r, rep, evaluer))
    for qk in swapped:
        swapped[qk].sort(key=lambda r: (r.evalue, -r.score, r.tlen, r.tkey))
        del swapped[qk][par.max_res_list_len:]
    return swapped
