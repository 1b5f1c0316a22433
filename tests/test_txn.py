"""Transactional snapshot tables (catalog/txn.py) — the ACID layer under
operators/mutate.py's copy-on-write semantics (VERDICT r5 missing #2).

Covers: snapshot isolation, time travel, atomic publish (create-if-absent),
optimistic conflict detection, lost-update-free concurrent MERGE, and
crash-before-publish leaving the table untouched.
"""

import json
import os
import shutil
import tempfile
import threading

import pytest
from pyspark.sql import functions as F

from rad_database_parse_spark.catalog.txn import (
    CommitConflict,
    commit,
    latest_version,
    merge_upsert_txn,
    read_snapshot,
)


@pytest.fixture()
def root():
    d = tempfile.mkdtemp(prefix="txn_table_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k int, seg string, v int"
    )


def test_create_read_roundtrip(spark, root):
    v = commit(spark, root, _base(spark), "create", expected_version=None)
    assert v == 0 and latest_version(root) == 0
    got = sorted(read_snapshot(spark, root).collect())
    assert [r.k for r in got] == [1, 2, 3]


def test_time_travel_reads_old_version(spark, root):
    commit(spark, root, _base(spark), "create", expected_version=None)
    updated = _base(spark).withColumn("v", F.col("v") * 100)
    commit(spark, root, updated, "overwrite", expected_version=0)
    assert latest_version(root) == 1
    assert sorted(r.v for r in read_snapshot(spark, root).collect()) == [
        1000, 2000, 3000,
    ]
    assert sorted(r.v for r in read_snapshot(spark, root, 0).collect()) == [
        10, 20, 30,
    ]


def test_conflicting_commit_raises_and_changes_nothing(spark, root):
    commit(spark, root, _base(spark), "create", expected_version=None)
    commit(spark, root, _base(spark), "w1", expected_version=0)
    with pytest.raises(CommitConflict):
        commit(spark, root, _base(spark), "w2", expected_version=0)
    assert latest_version(root) == 1
    m = json.load(open(os.path.join(root, "_manifests", "v0000000001.json")))
    assert m["op"] == "w1"


def test_staged_data_without_manifest_is_invisible(spark, root):
    commit(spark, root, _base(spark), "create", expected_version=None)
    # simulate a writer that crashed after staging data, before publishing
    orphan = os.path.join(root, "data", "orphan")
    _base(spark).write.parquet(orphan)
    assert latest_version(root) == 0
    assert read_snapshot(spark, root).count() == 3


def test_concurrent_merges_lose_no_update(spark, root):
    commit(spark, root, _base(spark), "create", expected_version=None)
    upd_a = spark.createDataFrame([(1, "a", 111), (4, "d", 40)], "k int, seg string, v int")
    upd_b = spark.createDataFrame([(2, "b", 222), (5, "e", 50)], "k int, seg string, v int")
    errs = []

    def run(upd):
        try:
            merge_upsert_txn(spark, root, upd, "k")
        except Exception as e:  # pragma: no cover - surfaced via assert
            errs.append(e)

    t1 = threading.Thread(target=run, args=(upd_a,))
    t2 = threading.Thread(target=run, args=(upd_b,))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    # both merges landed: one won version 1, the loser retried onto it
    assert latest_version(root) == 2
    final = {r.k: r.v for r in read_snapshot(spark, root).collect()}
    assert final == {1: 111, 2: 222, 3: 30, 4: 40, 5: 50}


def test_vacuum_expires_old_versions_keeps_head(spark, root):
    import os

    from rad_database_parse_spark.catalog.txn import vacuum

    commit(spark, root, _base(spark), "create", expected_version=None)
    commit(spark, root, _base(spark).withColumn("v", F.col("v") + 1), "w1", 0)
    commit(spark, root, _base(spark).withColumn("v", F.col("v") + 2), "w2", 1)
    stats = vacuum(root, keep_last=1)
    assert stats == {
        "removed_versions": 2, "removed_data_dirs": 2, "head_version": 2,
    }
    with pytest.raises(FileNotFoundError):
        read_snapshot(spark, root, version=0)
    assert sorted(r.v for r in read_snapshot(spark, root).collect()) == [
        12, 22, 32,
    ]
    assert len(os.listdir(os.path.join(root, "data"))) == 1


def test_vacuum_removes_orphaned_staging_dirs(spark, root):
    import os

    from rad_database_parse_spark.catalog.txn import vacuum

    commit(spark, root, _base(spark), "create", expected_version=None)
    _base(spark).write.parquet(os.path.join(root, "data", "crashed_writer"))
    stats = vacuum(root, keep_last=1)
    assert stats["removed_versions"] == 0
    assert stats["removed_data_dirs"] == 1  # the orphan, not the head
    assert read_snapshot(spark, root).count() == 3


def test_committed_ops_ledger(spark, root):
    from rad_database_parse_spark.catalog.txn import committed_ops

    assert committed_ops(root) == set()
    commit(spark, root, _base(spark), "create", expected_version=None)
    commit(spark, root, _base(spark), "batch_0", expected_version=0)
    assert committed_ops(root) == {"create", "batch_0"}
