"""Bit-parity of the aggregation tail (besthit -> combinehits ->
clusterhits -> summarize) against intermediates produced by the reference
binary (oracle run in .tmp/oracle, see .claude/skills/verify/SKILL.md)."""

import glob
import os

import pytest

from spacedust_tpu.db.fasta import create_setdb_from_fastas
from spacedust_tpu.db.mmseqs_io import FlatDB
from spacedust_tpu.cluster.aggregate import (besthit_by_set,
                                             merge_results_by_set,
                                             combine_hits)
from spacedust_tpu.cluster.clusterhits import cluster_hits
from spacedust_tpu.cluster.summarize import summarize_results

from conftest import oracle_root

ORACLE = oracle_root()


def _oracle_tmp():
    cands = [d for d in glob.glob(f"{ORACLE}/tmp/*/")
             if os.path.exists(os.path.join(d, "result.index"))]
    return cands[0] if cands else None


pytestmark = pytest.mark.skipif(_oracle_tmp() is None,
                                reason="oracle intermediates not generated")


@pytest.fixture(scope="module")
def setdb(examples_dir):
    return create_setdb_from_fastas([
        f"{examples_dir}/NC_000913.faa", f"{examples_dir}/NC_000915.faa"])


@pytest.fixture(scope="module")
def oracle_results():
    db = FlatDB.open(_oracle_tmp() + "result")
    results = {}
    for key, data in db.entries():
        lines = [ln for ln in data.split("\n") if ln]
        # prefixid semantics: prepend the query key column
        results[key] = [[str(key)] + ln.split("\t") for ln in lines]
    return results


def test_besthit_parity(setdb, oracle_results):
    agg = besthit_by_set(oracle_results, setdb, simple_best_hit=True)
    oracle = FlatDB.open(_oracle_tmp() + "aggregate")
    mismatches = 0
    for key, data in oracle.entries():
        want = [ln for ln in data.split("\n") if ln]
        got = ["\t".join(c) for c in agg.get(key, [])]
        if got != want:
            mismatches += 1
            if mismatches <= 3:
                print(f"key {key}:\n  got  {got}\n  want {want}")
    assert mismatches == 0


def test_combine_and_cluster_parity(setdb, oracle_results):
    agg = besthit_by_set(oracle_results, setdb, simple_best_hit=True)
    merged = merge_results_by_set(agg, setdb)
    matches = combine_hits(merged, setdb, setdb, alpha=1.0,
                           filter_self_match=True)

    oracle_h = FlatDB.open(_oracle_tmp() + "matches_h")
    oracle_m = FlatDB.open(_oracle_tmp() + "matches")
    want_headers = sorted(ln for _, d in oracle_h.entries()
                          for ln in d.split("\n") if ln)
    got_headers = sorted(m.header for m in matches)
    assert got_headers == want_headers

    want_bodies = sorted(d for _, d in oracle_m.entries())
    got_bodies = sorted("".join("\t".join(c) + "\n" for c in m.lines)
                        for m in matches)
    assert got_bodies == want_bodies

    clusters = cluster_hits(matches, setdb, setdb)
    tsv = summarize_results(clusters, setdb, setdb)

    golden = open("/root/reference/examples/sample_result.tsv").read()

    def canonical(text):
        """Cluster blocks as sets (cluster ids are thread-order dependent
        in the reference; A.5 of SURVEY.md)."""
        blocks = []
        cur = None
        for ln in text.splitlines():
            if ln.startswith("#"):
                if cur:
                    blocks.append((cur[0], tuple(sorted(cur[1]))))
                cur = ("\t".join(ln.split("\t")[1:]), [])
            else:
                cur[1].append(ln)
        if cur:
            blocks.append((cur[0], tuple(sorted(cur[1]))))
        return sorted(blocks)

    assert canonical(tsv) == canonical(golden)
    # regression anchors (util/run_regression.sh:20-24)
    assert sum(1 for ln in tsv.splitlines() if ln.startswith(">")) == 308
    # the regression's awk `$4 < 1E-20` reads the pCO column (1-based $4)
    assert sum(1 for ln in tsv.splitlines()
               if ln.startswith("#") and float(ln.split("\t")[3]) < 1e-20) == 2
