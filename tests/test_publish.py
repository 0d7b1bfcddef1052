"""Crash-injection certification of the manifest/rename publish
protocol (plans/publish.py): a writer dying at ANY barrier leaves
readers on the previous committed snapshot, bit-for-bit — old-or-new,
never torn."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from saas_analytics_pipeline_spark.plans import publish as P


class Boom(RuntimeError):
    pass


def _crash_at(barrier: str):
    def hook(b: str) -> None:
        if b == barrier:
            raise Boom(barrier)

    return hook


def _snap(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "mart")


def _frame(spark, tag: int):
    return spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") * 10 + tag).alias("v"),
    )


def test_publish_then_read_roundtrip(spark, root):
    P.publish_snapshot(spark, _frame(spark, 1), root, "tx1")
    assert _snap(P.read_current(spark, root)) == _snap(_frame(spark, 1))
    assert P.current_manifest(root)["txid"] == "tx1"


def test_reader_before_any_commit_sees_nothing(spark, root):
    # data written but writer died before the manifest landed: the root
    # holds real parquet, yet there is NO committed snapshot
    with pytest.raises(Boom):
        P.publish_snapshot(
            spark, _frame(spark, 1), root, "tx1", crash_hook=_crash_at(P.AFTER_DATA)
        )
    assert os.path.isdir(os.path.join(root, "data", "tx1"))  # torn remains
    with pytest.raises(FileNotFoundError):
        P.read_current(spark, root)


@pytest.mark.parametrize("barrier", [P.AFTER_DATA, P.AFTER_MANIFEST])
def test_crashed_republish_leaves_old_snapshot_intact(spark, root, barrier):
    """Kill the writer at every barrier of a SECOND publish: readers must
    keep seeing the first snapshot exactly — same rows, same txid."""
    P.publish_snapshot(spark, _frame(spark, 1), root, "tx1")
    before = _snap(P.read_current(spark, root))
    with pytest.raises(Boom):
        P.publish_snapshot(
            spark,
            _frame(spark, 2),  # would change every row if it leaked
            root,
            "tx2",
            crash_hook=_crash_at(barrier),
        )
    assert P.current_manifest(root)["txid"] == "tx1"
    assert _snap(P.read_current(spark, root)) == before
    # and a retry of the SAME txid after cleanup, or a fresh txid, commits
    P.publish_snapshot(spark, _frame(spark, 2), root, "tx3")
    assert P.current_manifest(root)["txid"] == "tx3"
    assert _snap(P.read_current(spark, root)) == _snap(_frame(spark, 2))


def test_old_reader_view_survives_new_publish(spark, root):
    """Snapshot isolation: a reader that resolved the manifest BEFORE a
    new publish keeps reading its file list consistently afterwards
    (published snapshot dirs are immutable — new publishes write new
    txid dirs)."""
    P.publish_snapshot(spark, _frame(spark, 1), root, "tx1")
    old_manifest = P.current_manifest(root)
    P.publish_snapshot(spark, _frame(spark, 2), root, "tx2")
    old_view = spark.read.parquet(
        *[os.path.join(root, f) for f in old_manifest["files"]]
    )
    assert _snap(old_view) == _snap(_frame(spark, 1))
    assert _snap(P.read_current(spark, root)) == _snap(_frame(spark, 2))


def test_vacuum_reclaims_only_unreferenced(spark, root):
    P.publish_snapshot(spark, _frame(spark, 1), root, "tx1")
    with pytest.raises(Boom):
        P.publish_snapshot(
            spark, _frame(spark, 9), root, "txcrash",
            crash_hook=_crash_at(P.AFTER_DATA),
        )
    P.publish_snapshot(spark, _frame(spark, 2), root, "tx2")
    removed = P.vacuum(root)
    assert removed == ["tx1", "txcrash"]
    assert _snap(P.read_current(spark, root)) == _snap(_frame(spark, 2))
    # the current snapshot's files all still exist
    m = P.current_manifest(root)
    assert all(os.path.exists(os.path.join(root, f)) for f in m["files"])


def test_duplicate_txid_refused(spark, root):
    P.publish_snapshot(spark, _frame(spark, 1), root, "tx1")
    with pytest.raises(Exception):  # noqa: B017 - Spark raises AnalysisException
        P.publish_snapshot(spark, _frame(spark, 2), root, "tx1")
    # failed re-publish of an existing txid never disturbs the pointer
    assert _snap(P.read_current(spark, root)) == _snap(_frame(spark, 1))
