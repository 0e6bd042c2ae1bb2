"""Multi-process (MPI-analog) clustersearch: merged TSV equality.

The reference's MPI mode gives each rank a split and merges through the
shared filesystem (Prefiltering.cpp:575-660, MMseqsMPI.h:26-34); the
equivalent here is query-slice workers + flat-DB rendezvous + rank-0
aggregation (spacedust_tpu/parallel/multihost.py)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_multihost_two_procs_equals_single(tmp_path):
    from __graft_entry__ import _toy_genomes
    from spacedust_tpu.parallel.multihost import run_multihost
    from spacedust_tpu.workflow.clustersearch import (ClusterSearchParams,
                                                      cluster_search)

    db = _toy_genomes()
    par = ClusterSearchParams(filter_self_match=True)
    single = cluster_search(db, db, par)
    assert any(ln.startswith(">") for ln in single.tsv.splitlines())

    db_dir = tmp_path / "db"
    db.save(db_dir)
    out = run_multihost(str(db_dir), str(tmp_path / "result.tsv"), 2, par,
                        tmp_dir=str(tmp_path / "mh_tmp"), local_devices=1)
    assert Path(out).read_text() == single.tsv
    # the seq_to_clu sidecar exists (clustersearch.sh:157-164 analog)
    assert (tmp_path / "result.tsv.seq_to_clu.tsv").exists()
