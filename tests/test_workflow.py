"""End-to-end workflow smoke test on small synthetic genomes."""

import numpy as np
import pytest

from spacedust_tpu.db.fasta import create_setdb_from_fastas
from spacedust_tpu.workflow.clustersearch import (ClusterSearchParams,
                                                 cluster_search)


@pytest.fixture(scope="module")
def tiny_genomes(tmp_path_factory):
    """Two tiny genomes sharing a conserved 3-gene neighborhood."""
    rng = np.random.default_rng(7)
    aas = "ACDEFGHIKLMNPQRSTVWY"

    def protein(n):
        return "".join(aas[i] for i in rng.integers(0, 20, n))

    shared = [protein(120), protein(150), protein(100)]
    g1 = [protein(80)] + shared + [protein(90)]
    g2 = [protein(70)] + shared + [protein(60)]

    d = tmp_path_factory.mktemp("genomes")
    for name, genes in [("g1.faa", g1), ("g2.faa", g2)]:
        with open(d / name, "w") as fh:
            for i, seq in enumerate(genes):
                start = 100 + i * 1000
                fh.write(f">ctg_{i+1} # {start} # {start+len(seq)*3-1} # 1 # X\n")
                fh.write(seq + "\n")
    return [str(d / "g1.faa"), str(d / "g2.faa")]


def test_cluster_search_finds_shared_neighborhood(tiny_genomes):
    db = create_setdb_from_fastas(tiny_genomes)
    par = ClusterSearchParams(filter_self_match=True, mask=False)
    res = cluster_search(db, db, par)
    # the 3 shared genes form one conserved cluster in each direction
    assert len(res.clusters) == 2
    for cl in res.clusters:
        assert len(cl.hits) == 3
        assert cl.p_mh < 1e-10
    # TSV renders and the seq->cluster map covers all hits
    assert res.tsv.count("#") == 2
    assert res.tsv.count(">") == 6
    assert len(res.seq_to_clu) == 6


def test_cluster_search_no_self_without_filter(tiny_genomes):
    db = create_setdb_from_fastas(tiny_genomes)
    par = ClusterSearchParams(filter_self_match=False, mask=False)
    res = cluster_search(db, db, par)
    # self-matches yield whole-genome identity clusters as well
    assert len(res.clusters) >= 2


def test_cluster_search_stage_checkpoint_resume(tiny_genomes, tmp_path,
                                                monkeypatch):
    """A rerun with the same checkpoint dir resumes after the search
    stage (the reference's notExists idiom): no prefilter engine is
    constructed and the TSV is identical."""
    db = create_setdb_from_fastas(tiny_genomes)
    par = ClusterSearchParams(filter_self_match=True, mask=False)
    ck = tmp_path / "stages"
    first = cluster_search(db, db, par, ckpt_dir=ck)
    assert (ck / "result.index").exists()
    assert (ck / "matches.index").exists()

    import spacedust_tpu.workflow.clustersearch as cs

    def boom(*a, **k):
        raise AssertionError("search stage should have been resumed")

    monkeypatch.setattr(cs, "PrefilterEngine", boom)
    second = cluster_search(db, db, par, ckpt_dir=ck)
    assert second.tsv == first.tsv


def test_cluster_search_to_file_resumes_final(tiny_genomes, tmp_path):
    db = create_setdb_from_fastas(tiny_genomes)
    par = ClusterSearchParams(filter_self_match=True, mask=False)
    out = tmp_path / "out.tsv"
    from spacedust_tpu.workflow.clustersearch import cluster_search_to_file
    r1 = cluster_search_to_file(db, db, str(out), tmp_dir=str(tmp_path),
                                params=par)
    r2 = cluster_search_to_file(db, db, str(out), tmp_dir=str(tmp_path),
                                params=par)
    assert r2.tsv == r1.tsv
