"""Iterative profile search parity (VERDICT r4 missing #1 / next #4).

Pins search_iterative (search/iterative.py — the blastpgp.sh analog,
/root/reference/lib/mmseqs/data/workflow/blastpgp.sh:55-139, dispatched
from lib/mmseqs/src/workflow/Search.cpp:476-516) line-for-line against
the reference binary's own `search --num-iterations 2` on a real-genome
subset, and covers the CLI wiring (`--num-iterations` on `search`).
"""

import os
import subprocess

import pytest

from spacedust_tpu.db.fasta import create_setdb_from_fastas
from spacedust_tpu.search.iterative import (IterativeSearchConfig,
                                            search_iterative)

REFBIN = "/root/repo/.refbuild/src/spacedust"
EXAMPLES = "/root/reference/examples"


@pytest.fixture(scope="module")
def subset(tmp_path_factory):
    """150 E. coli + 150 H. pylori proteins in one FASTA: enough real
    homolog pairs that the realign round and the profile round both
    contribute material (the full-genome pair yields 308 cross hits)."""
    tmp = tmp_path_factory.mktemp("iterdb")
    dst = tmp / "subset.faa"
    with open(dst, "w") as fh:
        for src in ("NC_000913.faa", "NC_000915.faa"):
            recs, cur = [], None
            for ln in open(f"{EXAMPLES}/{src}"):
                if ln.startswith(">"):
                    cur = [ln]
                    recs.append(cur)
                else:
                    cur.append(ln)
            for r in recs[:150]:
                fh.write("".join(r))
    return create_setdb_from_fastas([str(dst)]), str(dst)


@pytest.mark.skipif(not os.path.exists(REFBIN),
                    reason="reference oracle binary not built")
def test_iterative_reference_parity(subset, tmp_path):
    db, fasta = subset
    qdb = tmp_path / "qdb"
    subprocess.run([REFBIN, "createdb", fasta, str(qdb), "--shuffle", "0"],
                   check=True, capture_output=True)
    aln = tmp_path / "aln"
    subprocess.run([REFBIN, "search", str(qdb), str(qdb), str(aln),
                    str(tmp_path / "reftmp"), "--num-iterations", "2",
                    "-s", "5.7", "--threads", "2"],
                   check=True, capture_output=True)
    from spacedust_tpu.db.mmseqs_io import FlatDB
    oracle = FlatDB.open(str(aln))

    cfg = IterativeSearchConfig(num_iterations=2, sensitivity=5.7,
                                eval_thr=1e-3, eval_profile=0.1,
                                cov_thr=0.0, cov_mode=0, aln_len_thr=0)
    ours = search_iterative(db, db, cfg, same_qt_db=True)

    n_lines = 0
    for qk in range(db.size):
        want = [ln for ln in oracle.lines(qk)]
        got = ["\t".join(r.columns()) for r in ours.get(qk, [])]
        assert got == want, (
            f"query {qk}:\n  ours={got[:4]}\n  ref ={want[:4]}")
        n_lines += len(want)
    assert n_lines > 150          # profile rounds added real material


def test_cli_num_iterations(subset, tmp_path):
    """CLI wiring: `search --num-iterations 2` runs the iterative path."""
    from spacedust_tpu.cli import main
    dbdir = tmp_path / "db"
    db, fasta = subset
    db.save(str(dbdir))
    out = tmp_path / "res.tsv"
    rc = main(["search", str(dbdir), str(dbdir), str(out),
               "--num-iterations", "2"])
    assert rc == 0
    text = out.read_text()
    assert len(text.splitlines()) > 150
