"""User-facing flag surface (VERDICT r4 missing #3): --spaced-kmer-mode,
-k, --threads, --max-seq-len on the search/clustersearch commands."""

import os
import subprocess

import numpy as np
import pytest

from spacedust_tpu.db.fasta import create_setdb_from_fastas
from spacedust_tpu.search.prefilter import PrefilterEngine, kmer_pattern

REFBIN = "/root/repo/.refbuild/src/spacedust"
EXAMPLES = "/root/reference/examples"


@pytest.fixture(scope="module")
def subset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("flagdb")
    recs, cur = [], None
    for ln in open(f"{EXAMPLES}/NC_000913.faa"):
        if ln.startswith(">"):
            cur = [ln]
            recs.append(cur)
        else:
            cur.append(ln)
    dst = tmp / "subset.faa"
    with open(dst, "w") as fh:
        for r in recs[:150]:
            fh.write("".join(r))
    return create_setdb_from_fastas([str(dst)]), str(dst)


def test_kmer_pattern():
    assert list(kmer_pattern(6, spaced=False)) == [0, 1, 2, 3, 4, 5]
    assert list(kmer_pattern(6, spaced=True)) == [0, 1, 3, 5, 8, 9]


@pytest.mark.skipif(not os.path.exists(REFBIN),
                    reason="reference oracle binary not built")
def test_spaced_kmer_mode_0_reference_parity(subset, tmp_path):
    """--spaced-kmer-mode 0 (consecutive seeds) hit-for-hit vs the
    reference binary's own prefilter with the same flag."""
    db, fasta = subset
    qdb = tmp_path / "qdb"
    subprocess.run([REFBIN, "createdb", fasta, str(qdb), "--shuffle", "0"],
                   check=True, capture_output=True)
    pref = tmp_path / "pref"
    subprocess.run([REFBIN, "prefilter", str(qdb), str(qdb), str(pref),
                    "--spaced-kmer-mode", "0", "-s", "5.7",
                    "--max-seqs", "300", "--threads", "2"],
                   check=True, capture_output=True)
    from spacedust_tpu.db.mmseqs_io import FlatDB
    oracle = FlatDB.open(pref)

    eng = PrefilterEngine(db, db, sensitivity=5.7, same_qt_db=True,
                          spaced_kmer_mode=0)
    hits = eng.match_all()
    n_nonempty = 0
    for qk in range(db.size):
        got = {(h.seq_id, h.score) for h in hits[qk]}
        want = {(int(c[0]), int(c[1]))
                for c in (ln.split("\t") for ln in oracle.lines(qk))}
        assert got == want, f"query {qk}"
        n_nonempty += bool(want)
    assert n_nonempty > 100


def test_max_seq_len_rejects(subset, tmp_path, capsys):
    from spacedust_tpu.cli import main
    db, _ = subset
    dbdir = tmp_path / "db"
    db.save(str(dbdir))
    with pytest.raises(SystemExit) as e:
        main(["search", str(dbdir), str(dbdir), str(tmp_path / "o.tsv"),
              "--max-seq-len", "100"])
    assert "exceed --max-seq-len" in str(e.value)


def test_threads_flag(subset, tmp_path):
    """--threads 1 runs and gives the same records as the default."""
    from spacedust_tpu.cli import main
    db, _ = subset
    dbdir = tmp_path / "db"
    db.save(str(dbdir))
    out1 = tmp_path / "o1.tsv"
    out2 = tmp_path / "o2.tsv"
    assert main(["search", str(dbdir), str(dbdir), str(out1),
                 "--threads", "1"]) == 0
    assert main(["search", str(dbdir), str(dbdir), str(out2)]) == 0
    assert out1.read_text() == out2.read_text()
    from spacedust_tpu.native import set_num_threads
    set_num_threads(0)                 # restore default for other tests
