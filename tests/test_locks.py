"""Multi-process write safety (sources/locks.py) — the analog of the
reference's pid-lock suite (reference src/lib/table_lock_test.go:7-79
grab/release/stale-recovery; scripts/stress_ingest_digest.sh:1-27
interleaved ingest+digest processes on one table)."""

import json
import os
import subprocess
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sybil_spark.sources.locks import DirLock, LockHeld, path_lock
from sybil_spark.table import Table


def test_dirlock_mutex_and_release(tmp_path):
    a = DirLock(str(tmp_path), "t").acquire()
    b = DirLock(str(tmp_path), "t", blocking=False)
    with pytest.raises(LockHeld, match=str(os.getpid())):
        b.acquire()
    a.release()
    with b:
        pass  # acquirable again after release


def test_dirlock_timeout_names_owner(tmp_path):
    with DirLock(str(tmp_path), "t"):
        c = DirLock(str(tmp_path), "t", timeout_s=0.2)
        t0 = time.monotonic()
        with pytest.raises(LockHeld, match=str(os.getpid())):
            c.acquire()
        assert time.monotonic() - t0 >= 0.2


def test_dirlock_stale_takeover(tmp_path):
    """A lock stamped with a dead pid is stolen, not waited on —
    the reference's check_if_broken signal-0 probe."""
    child = subprocess.Popen([sys.executable, "-c", "pass"])
    child.wait()
    dead_pid = child.pid
    lock_dir = tmp_path / "t.lock"
    lock_dir.mkdir()
    (lock_dir / "pid").write_text(str(dead_pid))
    with DirLock(str(tmp_path), "t", timeout_s=2.0):
        assert (lock_dir / "pid").read_text() == str(os.getpid())


def test_dirlock_unstamped_grace(tmp_path):
    """A pid-less lock dir is respected while young (owner between
    mkdir and stamp) and stolen once past the stamp grace (owner
    crashed in that window)."""
    lock_dir = tmp_path / "t.lock"
    lock_dir.mkdir()
    young = DirLock(str(tmp_path), "t", blocking=False)
    with pytest.raises(LockHeld):
        young.acquire()
    # age the dir past the grace window -> takeable
    old = time.time() - DirLock.STAMP_GRACE_S - 1
    os.utime(lock_dir, (old, old))
    with DirLock(str(tmp_path), "t", timeout_s=2.0):
        pass


def test_dirlock_steal_respects_live_reowner(tmp_path):
    """TOCTOU regression: contender A observes a dead owner; before
    A acts, contender B completes its own steal, re-mkdirs, and
    stamps a LIVE pid. A's takeover (acting on the stale
    observation) must NOT tombstone B's fresh live lock — the
    claim-then-reverify protocol backs off instead."""
    lock_dir = tmp_path / "t.lock"
    # A's observation: dir exists with a dead owner
    child = subprocess.Popen([sys.executable, "-c", "pass"])
    child.wait()
    lock_dir.mkdir()
    (lock_dir / "pid").write_text(str(child.pid))
    a = DirLock(str(tmp_path), "t")
    assert a._owner() == "stale"          # A sees the dead owner
    # B's full takeover lands between A's observation and A's steal
    (lock_dir / "pid").write_text(str(os.getpid()))
    assert a._steal() is False            # A backs off...
    assert (lock_dir / "pid").read_text() == str(os.getpid())
    assert not (lock_dir / "claim").exists()   # ...and drops claim
    # and no tombstone of the live lock was left behind
    assert [d for d in os.listdir(tmp_path) if ".tomb-" in d] == []


def test_dirlock_steal_claim_serializes_and_clears_dead(tmp_path):
    """Only the claim holder may rename: a live rival claim blocks
    this contender's steal (no progress, dir untouched); a claim
    stamped by a DEAD process is cleared so a crashed stealer can't
    wedge takeover forever."""
    child = subprocess.Popen([sys.executable, "-c", "pass"])
    child.wait()
    lock_dir = tmp_path / "t.lock"
    lock_dir.mkdir()
    (lock_dir / "pid").write_text(str(child.pid))      # dead owner
    a = DirLock(str(tmp_path), "t")
    (lock_dir / "claim").write_text(str(os.getpid()))  # live rival
    assert a._steal() is False
    assert lock_dir.is_dir()
    (lock_dir / "claim").write_text(str(child.pid))    # dead rival
    assert a._steal() is False                 # pass 1 clears claim
    assert not (lock_dir / "claim").exists()
    assert a._steal() is True                  # pass 2 takes over
    assert not lock_dir.exists()
    with DirLock(str(tmp_path), "t", timeout_s=2.0):
        pass


def test_dirlock_unstamped_message_names_no_pid(tmp_path):
    """A young pid-less lock (owner between mkdir and stamp) must
    not be reported as 'held by pid 0' — the diagnostic names the
    mid-stamp state instead of a nonexistent owner."""
    (tmp_path / "t.lock").mkdir()
    with pytest.raises(LockHeld, match="unstamped young lock"):
        DirLock(str(tmp_path), "t", blocking=False).acquire()


def test_path_lock_lives_beside_store(tmp_path):
    """The staged compactors RENAME the store dir away mid-swap; a
    lock inside the store would travel with it."""
    store = tmp_path / "roll"
    store.mkdir()
    with path_lock(str(store)) as lk:
        assert os.path.dirname(lk.dir) == str(tmp_path)
        os.rename(store, tmp_path / "roll-moved")  # swap mid-hold
        assert os.path.isdir(lk.dir)               # lock unaffected


def test_vacuum_stage_reap_age_gate(tmp_path):
    """Query-cache vacuum only reclaims _stage-* dirs that are COLD:
    a live run's stage (fresh mtime) must survive a concurrent
    vacuum — queries stay lock-free."""
    from sybil_spark.sources import query_cache as QC
    croot = tmp_path / "cache"
    stage = croot / "_stage-live"
    stage.mkdir(parents=True)
    blocks_root = tmp_path / "blocks"
    blocks_root.mkdir()
    assert QC.vacuum(str(blocks_root), str(croot)) == 0
    assert stage.is_dir()                   # young stage kept
    old = time.time() - QC.STAGE_REAP_S - 1
    os.utime(stage, (old, old))
    assert QC.vacuum(str(blocks_root), str(croot)) == 1
    assert not stage.exists()               # cold stage reclaimed


# --------------------------------------------------------------------
# The reference's shell stress, replayed: ingest and digest processes
# interleave on ONE table; afterwards every ingested row is present
# exactly once across blocks/ + ingest/ (zero lost, zero duplicated).
# --------------------------------------------------------------------

_DIGEST_WORKER = r"""
import json, sys, time
from pyspark.sql import SparkSession
from sybil_spark.sources import compact
from sybil_spark.table import Table

db_dir, name, rounds = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = (SparkSession.builder.master("local[2]")
         .appName("digest-stress")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
t = Table(db_dir, name)
done = 0
for _ in range(rounds):
    done += compact.digest(spark, t)
    time.sleep(0.05)
print(json.dumps({"digested": done}))
spark.stop()
"""


def _append_ingest_file(table: Table, ids: list[int]) -> None:
    """What a concurrent ingest process does: land a parquet file in
    the row log (pyarrow — no second Spark needed for the writer
    side; digest reads the log with mergeSchema either way)."""
    os.makedirs(table.ingest_path, exist_ok=True)
    tbl = pa.table({"rid": pa.array(ids, pa.int64()),
                    "time": pa.array([1000 + i for i in ids], pa.int64())})
    pq.write_table(tbl, os.path.join(table.ingest_path,
                                     f"ing-{ids[0]}-{os.getpid()}.parquet"))


def test_stress_interleaved_ingest_digest_processes(spark, tmp_path):
    """Two digest PROCESSES (this one + a subprocess JVM) race over
    the same table while an ingest writer keeps appending — the
    table lock serializes the staging renames; without it the loser
    of a rename race strands a half-staged dir and the meta
    read-modify-write double-counts. Afterwards: every row exactly
    once, no stranded stage dirs, registry count exact."""
    env = dict(os.environ,
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    db = str(tmp_path)
    t = Table(db, "stress")
    os.makedirs(t.path, exist_ok=True)
    t.save_meta(t.load_meta())   # default meta; avoids racing creation
    proc = subprocess.Popen(
        [sys.executable, "-c", _DIGEST_WORKER, db, "stress", "12"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env)
    from sybil_spark.sources import compact
    total = 0
    try:
        for i in range(12):
            ids = list(range(i * 100, i * 100 + 100))
            _append_ingest_file(t, ids)
            total += len(ids)
            compact.digest(spark, t)
        out, _ = proc.communicate(timeout=240)
        assert json.loads(out.strip().splitlines()[-1])["digested"] >= 0
    finally:
        if proc.poll() is None:
            proc.kill()
    # final sweep for anything still in the log
    compact.digest(spark, t)
    df = t.read(spark, read_log=True)
    assert df.count() == total                       # zero lost
    assert df.select("rid").distinct().count() == total  # zero dup
    strays = [d for d in os.listdir(t.path) if d.startswith("stomache-")]
    assert strays == []                              # no stranded stages
    # the registry's per-column count is the canary for meta
    # read-modify-write races: a lost update under-counts, a
    # double-staged file double-counts
    assert t.load_meta().int_info["rid"]["count"] == total
