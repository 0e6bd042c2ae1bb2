"""aa2foldseek mapping + --search-mode 1 (mapped structure search +
unmapped sequence search)."""

import numpy as np
import pytest

from spacedust_tpu.constants import decode_aa
from spacedust_tpu.db.fasta import create_setdb_from_fastas
from spacedust_tpu.db.flatdb_ingest import create_setdb_from_flatdb
from spacedust_tpu.workflow.aa2foldseek import (Aa2FoldseekParams,
                                                StructureRef, aa2foldseek,
                                                load_mapping)
from spacedust_tpu.workflow.clustersearch import (ClusterSearchParams,
                                                  cluster_search)

TESTDB = "/root/reference/examples/foldseek_testdb/foldseek_test"


@pytest.fixture(scope="module")
def query_db(tmp_path_factory):
    """FASTA of 15 genes per genome taken from the foldseek testdb itself
    (so they map exactly), plus one random protein per genome."""
    full = create_setdb_from_flatdb(TESTDB)
    rng = np.random.default_rng(3)
    aas = "ACDEFGHIKLMNPQRSTVWY"
    d = tmp_path_factory.mktemp("a2f")
    paths = []
    for set_id, fname in [(0, "g1.faa"), (1, "g2.faa")]:
        keys = [k for k in range(full.size) if full.set_ids[k] == set_id][:15]
        with open(d / fname, "w") as fh:
            for i, k in enumerate(keys):
                start = 100 + i * 1000
                seq = decode_aa(full.sequence(k))
                fh.write(f">g_{i} # {start} # {start+len(seq)*3-1} # 1 # X\n")
                fh.write(seq + "\n")
            rnd = "".join(aas[j] for j in rng.integers(0, 20, 130))
            fh.write(f">rnd # 99000 # {99000+390} # 1 # X\n{rnd}\n")
        paths.append(str(d / fname))
    return create_setdb_from_fastas(paths)


def test_aa2foldseek_mapping(query_db, tmp_path):
    ref = StructureRef.open(TESTDB)
    m = aa2foldseek(query_db, ref)
    # all 30 real genes map; the 2 random ones do not
    assert len(m.mapping) == 30
    assert len(m.unmapped_keys(query_db)) == 2
    # mapped genes carry the reference 3Di states
    attached = m.attach(query_db)
    assert attached.has_ss
    for k in m.mapped_keys:
        assert (attached.sequence(k) == m.mapped_seq[k]).all()
        assert len(attached.ss_sequence(k)) == len(attached.sequence(k))

    # save/load roundtrip used by the CLI
    attached.save(tmp_path / "fs")
    np.save(tmp_path / "fs" / "unmapped.npy",
            np.asarray(m.unmapped_keys(query_db), dtype=np.int64))
    back = load_mapping(tmp_path / "fs")
    assert sorted(back.mapping) == sorted(m.mapping)


def test_search_mode_1(query_db):
    ref = StructureRef.open(TESTDB)
    m = aa2foldseek(query_db, ref)
    par = ClusterSearchParams(filter_self_match=True, search_mode=1)
    res = cluster_search(query_db, query_db, par,
                         query_mapping=m, target_mapping=m)
    assert isinstance(res.tsv, str)
    for cl in res.clusters:
        assert len(cl.hits) >= 2
