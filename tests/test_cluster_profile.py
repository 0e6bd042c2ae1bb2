"""Sequence clustering, clusterdb, expandaln, and profile-cluster-search."""

import numpy as np
import pytest

from spacedust_tpu.cluster.seqcluster import (
    MODE_CONNECTED_COMPONENT, MODE_GREEDY, SeqClusterParams,
    cluster_sequences, set_cover)
from spacedust_tpu.db.fasta import create_setdb_from_fastas
from spacedust_tpu.search.expandaln import (ExpandParams, expand_alignments,
                                            translate_backtrace)
from spacedust_tpu.search.records import AlnRecord
from spacedust_tpu.workflow.clusterdb import ClusterDB, cluster_db
from spacedust_tpu.workflow.clustersearch import (ClusterSearchParams,
                                                  cluster_search)

AAS = "ACDEFGHIKLMNPQRSTVWY"


def _protein(rng, n):
    return "".join(AAS[i] for i in rng.integers(0, 20, n))


def _mutate(rng, seq, n_mut):
    s = list(seq)
    for pos in rng.choice(len(s), size=n_mut, replace=False):
        s[pos] = AAS[rng.integers(0, 20)]
    return "".join(s)


def _write_faa(path, genes):
    with open(path, "w") as fh:
        for i, seq in enumerate(genes):
            start = 100 + i * 1000
            fh.write(f">ctg_{i+1} # {start} # {start+len(seq)*3-1} # 1 # X\n")
            fh.write(seq + "\n")


@pytest.fixture(scope="module")
def homolog_db(tmp_path_factory):
    """Two genomes; three gene families shared with light mutations, plus
    one unique gene each -> clustering should group the families."""
    rng = np.random.default_rng(11)
    fams = [_protein(rng, 120), _protein(rng, 150), _protein(rng, 100)]
    g1 = [_protein(rng, 80)] + fams
    g2 = [_protein(rng, 70)] + [_mutate(rng, f, len(f) // 20) for f in fams]
    d = tmp_path_factory.mktemp("homolog")
    _write_faa(d / "g1.faa", g1)
    _write_faa(d / "g2.faa", g2)
    return create_setdb_from_fastas([str(d / "g1.faa"), str(d / "g2.faa")])


def test_set_cover_toy():
    # star graph: node 0 connected to 1,2,3 (symmetric); node 4 isolated
    adj = [
        [(0, 1000), (1, 900), (2, 800), (3, 700)],
        [(1, 1000), (0, 900)],
        [(2, 1000), (0, 800)],
        [(3, 1000), (0, 700)],
        [(4, 1000)],
    ]
    assigned = set_cover(adj)
    assert assigned[0] == 0
    assert assigned[1] == 0 and assigned[2] == 0 and assigned[3] == 0
    assert assigned[4] == 4


def test_cluster_sequences_groups_families(homolog_db):
    clusters = cluster_sequences(
        homolog_db, SeqClusterParams(seq_id_thr=0.5, mask=False))
    # 3 family clusters of size 2 + 2 singletons
    sizes = sorted(len(v) for v in clusters.values())
    assert sizes == [1, 1, 2, 2, 2]
    # every key appears exactly once
    members = sorted(k for v in clusters.values() for k in v)
    assert members == list(range(homolog_db.size))


def test_cluster_modes_cover_all(homolog_db):
    for mode in (MODE_CONNECTED_COMPONENT, MODE_GREEDY):
        clusters = cluster_sequences(
            homolog_db, SeqClusterParams(seq_id_thr=0.5, mask=False,
                                         mode=mode))
        members = sorted(k for v in clusters.values() for k in v)
        assert members == list(range(homolog_db.size))


def test_clusterdb_roundtrip(homolog_db, tmp_path):
    cdb = cluster_db(homolog_db)
    assert sorted(cdb.rep_keys) == sorted(cdb.clusters.keys())
    for rep in cdb.rep_keys:
        L = len(homolog_db.sequence(rep))
        assert cdb.pssms[rep].shape == (L, 20)
        assert cdb.aln_profiles[rep].shape == (L, 21)
        assert cdb.consensus[rep].shape == (L,)
        # rep self-alignment present in _clu_aln
        assert any(r.tkey == rep for r in cdb.clu_aln[rep])
    cdb.save(tmp_path / "cdb")
    back = ClusterDB.load(tmp_path / "cdb")
    assert back.rep_keys == cdb.rep_keys
    assert back.clusters == cdb.clusters
    for rep in cdb.rep_keys:
        np.testing.assert_array_equal(back.pssms[rep], cdb.pssms[rep])
        assert [r.line() for r in back.clu_aln[rep]] == \
               [r.line() for r in cdb.clu_aln[rep]]


def test_expandaln_identity_composition():
    # B->C identity: composing leaves the A->B alignment unchanged
    ab = AlnRecord(tkey=5, score=100, seq_id=0.8, evalue=1e-9, qstart=3,
                   qend=42, qlen=60, tstart=10, tend=49, tlen=55,
                   backtrace="M" * 40)
    bc = AlnRecord(tkey=7, score=200, seq_id=1.0, evalue=0.0, qstart=0,
                   qend=54, qlen=55, tstart=0, tend=54, tlen=55,
                   backtrace="M" * 55)
    bt, qs, qe, ts, te = translate_backtrace(ab, bc)
    assert bt == "M" * 40
    assert (qs, qe) == (3, 42)
    assert (ts, te) == (10, 49)

    out = expand_alignments({1: [ab]}, {5: [bc]},
                            ExpandParams(eval_thr=1e-3))
    assert len(out[1]) == 1
    rec = out[1][0]
    assert rec.tkey == 7 and rec.evalue == ab.evalue and rec.score == ab.score


def test_expandaln_gap_composition():
    # A->B: MIM (gap in B), B->C: MMM -> composed per the reference's
    # always-advance rule: M,I then the trailing M pairs are exhausted
    ab = AlnRecord(tkey=1, score=10, seq_id=0.5, evalue=1e-5, qstart=0,
                   qend=2, qlen=3, tstart=0, tend=1, tlen=2,
                   backtrace="MIM")
    bc = AlnRecord(tkey=2, score=10, seq_id=0.5, evalue=1e-5, qstart=0,
                   qend=2, qlen=2, tstart=0, tend=2, tlen=3,
                   backtrace="MMM")
    bt, qs, qe, ts, te = translate_backtrace(ab, bc)
    assert bt == "MIM"
    # translateResult end-position accounting (BacktraceTranslator.h:118-127):
    # 'I' advances the db span, 'D' the query span — note this is the
    # OPPOSITE of the Matcher record convention; replicated bug-compatibly.
    assert (qs, qe) == (0, 1)
    assert (ts, te) == (0, 2)


def test_profile_cluster_search_end_to_end(tmp_path_factory):
    """--profile-cluster-search finds the shared neighborhood that the
    sequence mode finds (tiny synthetic genomes)."""
    rng = np.random.default_rng(7)
    shared = [_protein(rng, 120), _protein(rng, 150), _protein(rng, 100)]
    g1 = [_protein(rng, 80)] + shared + [_protein(rng, 90)]
    g2 = [_protein(rng, 70)] + shared + [_protein(rng, 60)]
    d = tmp_path_factory.mktemp("profsearch")
    _write_faa(d / "g1.faa", g1)
    _write_faa(d / "g2.faa", g2)
    db = create_setdb_from_fastas([str(d / "g1.faa"), str(d / "g2.faa")])

    par = ClusterSearchParams(filter_self_match=True, mask=False,
                              profile_cluster_search=True)
    res = cluster_search(db, db, par)
    assert len(res.clusters) == 2
    for cl in res.clusters:
        assert len(cl.hits) == 3


def test_profile_search_reference_oracle():
    """Pin --profile-cluster-search semantics against a reference-binary
    oracle run (VERDICT r2 missing #2): the committed fixture holds the
    reference's clusterdb artifacts trimmed to the rep union of 50
    sampled queries plus their result_clu (inverted profile search after
    swapresults) and result (expandaln) lines.  Queries were chosen with
    hit counts far below the 100-result cap, so restricting the search
    to the sampled reps cannot change their hit sets; E-value statistics
    use the full-DB overrides."""
    import json
    import os

    from spacedust_tpu.db.fasta import create_setdb_from_fastas
    from spacedust_tpu.db.mmseqs_io import FlatDB
    from spacedust_tpu.search.expandaln import ExpandParams, expand_alignments
    from spacedust_tpu.search.profilesearch import (ProfileSearchParams,
                                                    search_profile_target)
    from spacedust_tpu.workflow.clusterdb import clusterdb_from_reference

    base = os.path.join(os.path.dirname(__file__), "fixtures", "oracle",
                        "profile_mode")
    meta = json.load(open(os.path.join(base, "meta.json")))
    db = create_setdb_from_fastas(
        ["/root/reference/examples/NC_000913.faa",
         "/root/reference/examples/NC_000915.faa"])
    cdb = clusterdb_from_reference(os.path.join(base, "genome"))
    ppar = ProfileSearchParams(
        n_profiles_override=meta["n_profiles"],
        profile_res_override=meta["profile_res"])
    hits = search_profile_target(db, db, cdb, ppar)

    ref_clu = FlatDB.open(os.path.join(base, "result_clu"))
    n_lines = 0
    for qk in meta["queries"]:
        ours = [r.line() for r in hits[qk]]
        assert ours == ref_clu.lines(qk), f"query {qk}"
        n_lines += len(ours)
    assert n_lines >= 100   # the pin is not vacuous

    # expandaln (query->rep hits composed with rep->member alignments)
    ref_res = FlatDB.open(os.path.join(base, "result"))
    expanded = expand_alignments({qk: hits[qk] for qk in meta["queries"]},
                                 cdb.clu_aln,
                                 ExpandParams(eval_thr=ppar.eval_thr))
    for qk in meta["queries"]:
        ours = [r.line() for r in expanded.get(qk, [])]
        assert ours == ref_res.lines(qk), f"expanded query {qk}"


def test_sliced_profile_search_equals_exhaustive(homolog_db):
    """searchslicedtargetprofile.sh analog (VERDICT r4 next #10):
    sequential memory-bounded profile-DB slices produce record lists
    EQUAL to the exhaustive target-profile search."""
    from spacedust_tpu.search.profilesearch import (
        ProfileSearchParams, profile_slices, search_profile_target,
        search_profile_target_sliced)
    from spacedust_tpu.workflow.clusterdb import cluster_db

    db = homolog_db
    cdb = cluster_db(db)
    par = ProfileSearchParams(mask=False)
    full = search_profile_target(db, db, cdb, par)
    # a limit small enough to force one profile per slice
    limit = 2048 * 32
    slices = profile_slices(cdb, limit)
    assert len(slices) > 1                      # actually sliced
    assert sorted(r for s in slices for r in s) == sorted(cdb.rep_keys)
    sliced = search_profile_target_sliced(db, db, cdb, par,
                                          split_memory_limit=limit)
    assert set(sliced) == set(full)
    n = 0
    for qk in full:
        a = [r.line() for r in full[qk]]
        b = [r.line() for r in sliced[qk]]
        assert a == b, f"query {qk}"
        n += len(a)
    assert n > 0
