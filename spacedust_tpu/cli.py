"""Command-line interface mirroring the reference's command surface
(src/spacedust.cpp:26-120): createsetdb, clustersearch, and utility
commands, with the reference's flag names.

Run as `python -m spacedust_tpu <command> ...`.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from .db.setdb import SetDB


def _configure_platform() -> None:
    """Honor SPACEDUST_JAX_PLATFORM (e.g. cpu/tpu). The axon TPU plugin
    overrides JAX_PLATFORMS at import, so set the config explicitly."""
    plat = os.environ.get("SPACEDUST_JAX_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)


def _add_clustersearch_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("query_db")
    p.add_argument("target_db")
    p.add_argument("output")
    p.add_argument("tmp_dir", nargs="?")
    p.add_argument("-s", "--sensitivity", type=float, default=5.7)
    p.add_argument("-e", "--eval-thr", type=float, default=10.0)
    p.add_argument("-c", "--cov-thr", type=float, default=0.8)
    p.add_argument("--cov-mode", type=int, default=2)
    p.add_argument("--max-seqs", type=int, default=300)
    p.add_argument("--aln-len", type=int, default=30, dest="aln_len_thr")
    p.add_argument("--gap-open", type=int, default=11)
    p.add_argument("--gap-extend", type=int, default=1)
    p.add_argument("--filter-self-match", action="store_true")
    p.add_argument("--suboptimal-hits", type=int, default=0)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--aggregation-mode", type=int, default=0)
    p.add_argument("--multihit-pval", type=float, default=0.01)
    p.add_argument("--cluster-pval", type=float, default=0.01)
    p.add_argument("--max-gene-gap", type=int, default=3)
    p.add_argument("--cluster-size", type=int, default=2)
    p.add_argument("--mask", type=int, default=1)
    p.add_argument("--comp-bias-corr", type=int, default=1)
    p.add_argument("--threads", type=int, default=0)


def cmd_createsetdb(argv: list[str]) -> int:
    from .workflow.createsetdb import create_setdb
    p = argparse.ArgumentParser(prog="spacedust createsetdb")
    p.add_argument("inputs", nargs="+")
    p.add_argument("out_db")
    p.add_argument("tmp_dir", nargs="?")
    p.add_argument("--gff-dir")
    p.add_argument("--gff-type", default="CDS")
    p.add_argument("--translation-table", type=int, default=1)
    p.add_argument("--file-include", default=".*")
    p.add_argument("--file-exclude", default="^$")
    a = p.parse_args(argv)
    db = create_setdb(a.inputs, a.out_db, gff_dir=a.gff_dir,
                      gff_type=a.gff_type,
                      translation_table=a.translation_table,
                      file_include=a.file_include,
                      file_exclude=a.file_exclude)
    print(f"createsetdb: {db.size} genes in {db.num_sets} sets -> {a.out_db}")
    return 0


def cmd_clustersearch(argv: list[str]) -> int:
    from .workflow.clustersearch import (ClusterSearchParams,
                                         cluster_search_to_file)
    p = argparse.ArgumentParser(prog="spacedust clustersearch")
    _add_clustersearch_args(p)
    a = p.parse_args(argv)
    qdb = SetDB.load(a.query_db)
    tdb = qdb if a.target_db == a.query_db else SetDB.load(a.target_db)
    params = ClusterSearchParams(
        sensitivity=a.sensitivity, max_seqs=a.max_seqs, cov_thr=a.cov_thr,
        cov_mode=a.cov_mode, eval_thr=a.eval_thr, aln_len_thr=a.aln_len_thr,
        gap_open=a.gap_open, gap_extend=a.gap_extend,
        subopt_hits_factor=a.suboptimal_hits, alpha=a.alpha,
        aggregation_mode=a.aggregation_mode,
        filter_self_match=a.filter_self_match,
        max_gene_gaps=a.max_gene_gap, cluster_size=a.cluster_size,
        p_clu_thr=a.cluster_pval, p_mh_thr=a.multihit_pval,
        mask=bool(a.mask), comp_bias_correction=bool(a.comp_bias_corr))
    t0 = time.time()
    res = cluster_search_to_file(qdb, tdb, a.output, a.tmp_dir, params=params)
    n_hits = sum(1 for ln in res.tsv.splitlines() if ln.startswith(">"))
    n_clusters = sum(1 for ln in res.tsv.splitlines() if ln.startswith("#"))
    print(f"clustersearch: {n_clusters} clusters / {n_hits} hits "
          f"in {time.time()-t0:.1f}s -> {a.output}")
    for k, v in res.timings.items():
        print(f"  {k}: {v:.2f}s")
    return 0


COMMANDS = {
    "createsetdb": cmd_createsetdb,
    "clustersearch": cmd_clustersearch,
}


def main(argv: list[str] | None = None) -> int:
    _configure_platform()
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] in ("-h", "--help"):
        print("spacedust_tpu — TPU-native gene-cluster discovery\n"
              "commands: " + ", ".join(COMMANDS))
        return 0
    cmd = argv[0]
    if cmd not in COMMANDS:
        print(f"unknown command: {cmd}", file=sys.stderr)
        return 1
    return COMMANDS[cmd](argv[1:])


if __name__ == "__main__":
    raise SystemExit(main())
