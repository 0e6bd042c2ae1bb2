"""Cascaded clustering: linclust redundancy pass, sensitivity ramp,
mergeclusters composition (cluster/cascade.py)."""

import numpy as np
import pytest

from spacedust_tpu.cluster.cascade import (LinclustParams, cascade_steps,
                                           cascaded_cluster, linclust,
                                           merge_clusters)
from spacedust_tpu.cluster.seqcluster import SeqClusterParams
from spacedust_tpu.db.fasta import create_setdb_from_fastas

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
            fh.write(f">c_{i+1} # {start} # {start+len(seq)*3-1} # 1 # X\n")
            fh.write(seq + "\n")


@pytest.fixture(scope="module")
def redundant_db(tmp_path_factory):
    """Three families: each with one master + two near-identical copies
    (2 mutations — linclust fodder), plus two singletons."""
    rng = np.random.default_rng(5)
    fams = [_protein(rng, 90), _protein(rng, 120), _protein(rng, 100)]
    genes = []
    for f in fams:
        genes.append(f)
        genes.append(_mutate(rng, f, 2))
        genes.append(_mutate(rng, f, 3))
    genes.append(_protein(rng, 60))
    genes.append(_protein(rng, 75))
    d = tmp_path_factory.mktemp("redundant")
    _write_faa(d / "g.faa", genes)
    return create_setdb_from_fastas([str(d / "g.faa")])


def test_cascade_steps():
    assert cascade_steps(1.0) == [1.0]
    assert cascade_steps(2.0) == [2.0]
    assert cascade_steps(4.0) == [1.0, 2.5, 4.0]
    assert cascade_steps(7.0) == [1.0, 4.0, 7.0]


def test_merge_clusters_composes():
    r0 = {0: [0, 1], 2: [2, 3], 4: [4]}
    r1 = {0: [0, 2], 4: [4]}
    assert merge_clusters([r0, r1]) == {0: [0, 1, 2, 3], 4: [4]}
    assert merge_clusters([]) == {}
    assert merge_clusters([r0]) == r0


def test_linclust_collapses_near_duplicates(redundant_db):
    clu = linclust(redundant_db)
    # partition sanity
    members = sorted(m for ms in clu.values() for m in ms)
    assert members == list(range(redundant_db.size))
    # the three 2-mutation copies must collapse into their family cluster
    key_rep = {m: rep for rep, ms in clu.items() for m in ms}
    for fam_start in (0, 3, 6):
        assert key_rep[fam_start] == key_rep[fam_start + 1] == \
            key_rep[fam_start + 2]
    # singletons (no homology) stay alone
    assert key_rep[9] == 9 and key_rep[10] == 10
    assert len(clu) == 5


def test_cascaded_cluster_end_to_end(redundant_db):
    clu = cascaded_cluster(redundant_db,
                           SeqClusterParams(sensitivity=4.0,
                                            seq_id_thr=0.5))
    members = sorted(m for ms in clu.values() for m in ms)
    assert members == list(range(redundant_db.size))
    key_rep = {m: rep for rep, ms in clu.items() for m in ms}
    # families whole, singletons separate
    for fam_start in (0, 3, 6):
        reps = {key_rep[fam_start + i] for i in range(3)}
        assert len(reps) == 1
    assert key_rep[9] != key_rep[10]
    assert len(clu) == 5
    # every representative is a member of its own cluster
    for rep, ms in clu.items():
        assert rep in ms


def test_linclust_short_sequences_no_kmers(tmp_path):
    # sequences shorter than k self-cluster without error
    _write_faa(tmp_path / "s.faa", ["MKVL", "ACDE"])
    db = create_setdb_from_fastas([str(tmp_path / "s.faa")])
    clu = linclust(db, LinclustParams(k=21))
    assert clu == {0: [0], 1: [1]}


def test_reduced_alphabet_matches_reference():
    """The greedy mutual-information reduction must reproduce the
    reference's printed 13-letter alphabet (ReducedMatrix.cpp; observed
    from `kmermatcher --alph-size aa:13`):
    (A S T)(C)(D N)(E Q)(F Y)(G)(H)(I V)(K R)(L M)(P)(W)(X)."""
    from spacedust_tpu.cluster.cascade import reduced_alphabet_mapping
    from spacedust_tpu.constants import AA_ORDER

    mapping = reduced_alphabet_mapping(13)
    aa_to_tok = {aa: i for i, aa in enumerate(AA_ORDER)}
    expected = ["AST", "C", "DN", "EQ", "FY", "G", "H", "IV", "KR", "LM",
                "P", "W", "X"]
    groups = {}
    for grp in expected:
        gids = {int(mapping[aa_to_tok[a]]) for a in grp}
        assert len(gids) == 1, f"group {grp} split: {gids}"
        gid = gids.pop()
        assert gid not in groups, f"groups {grp} and {groups[gid]} merged"
        groups[gid] = grp
    assert len(groups) == 13
