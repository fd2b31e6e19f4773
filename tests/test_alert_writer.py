"""Python DataSource streaming SINK (streamalert_outputs): executor-side
delivery-ledger writes with the object-store commit pattern."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from streamalert_spark.sources.alert_writer import (
    read_ledger, register_alert_writer,
)


def _run_stream(spark, df, ledger_dir, ckpt):
    q = (
        df.writeStream.format("streamalert_outputs")
        .option("path", ledger_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_slack_bodies_flow_through_writer(spark, tmp_path):
    """Alerts routed to slack must produce ledger receipts whose body md5
    equals the REAL slack_request builder output — delivery semantics on
    the executors, not a toy body."""
    import hashlib

    from streamalert_spark.streaming.outputs import slack_request

    register_alert_writer(spark)
    in_dir, ledger, ckpt = tmp_path / "in", tmp_path / "ledger", tmp_path / "ck"
    alerts = spark.createDataFrame(
        [("a1", "ssh_watch", '["slack:secops"]', '{"host": "web-1"}'),
         ("a2", "ssh_watch", '["slack:secops", "json:audit"]', '{"host": "db-2"}')],
        "id string, rule_name string, outputs string, record string")
    alerts.write.parquet(str(in_dir))
    src = spark.readStream.schema(alerts.schema).parquet(str(in_dir))
    _run_stream(spark, src, str(ledger), str(ckpt))

    rows = {(r["id"], r["output"]): r["body_md5"]
            for r in read_ledger(spark, str(ledger)).collect()}
    assert set(rows) == {("a1", "slack:secops"), ("a2", "slack:secops"),
                         ("a2", "json:audit")}
    for aid, rec in [("a1", '{"host": "web-1"}'), ("a2", '{"host": "db-2"}')]:
        expect = slack_request(
            {"id": aid, "rule_name": "ssh_watch",
             "outputs": ["slack:secops"] if aid == "a1"
             else ["slack:secops", "json:audit"], "record": rec}, "secops")
        digest = hashlib.md5(
            json.dumps(expect, sort_keys=True, default=str).encode()).hexdigest()
        assert rows[(aid, "slack:secops")] == digest

    # no staging residue after commit
    staging = os.path.join(str(ledger), "_staging")
    assert not os.path.exists(staging) or not os.listdir(staging)


def test_commit_is_idempotent(spark, tmp_path):
    """A re-committed epoch (retry) must not duplicate ledger rows: the
    promoted file short-circuits the rename."""
    register_alert_writer(spark)
    in_dir, ledger, ckpt = tmp_path / "in", tmp_path / "ledger", tmp_path / "ck"
    alerts = spark.createDataFrame(
        [("a1", "r", '["json:x"]', "{}")],
        "id string, rule_name string, outputs string, record string")
    alerts.write.parquet(str(in_dir))
    src = spark.readStream.schema(alerts.schema).parquet(str(in_dir))
    _run_stream(spark, src, str(ledger), str(ckpt))
    first = sorted(tuple(r) for r in read_ledger(spark, str(ledger)).collect())

    # simulate the retry: re-stage a file and re-commit the same epoch
    committed = [f for f in os.listdir(str(ledger))
                 if f.startswith("epoch-") and f.endswith(".jsonl")]
    assert committed
    staging = os.path.join(str(ledger), "_staging")
    os.makedirs(staging, exist_ok=True)
    dup = os.path.join(staging, "task-0-999.jsonl")
    with open(dup, "w") as fh:
        fh.write('{"id": "a1", "output": "json:x", "service": "json", '
                 '"descriptor": "x", "body_md5": "deadbeef"}\n')

    class _M:
        staged = dup
        rows = 1

    from streamalert_spark.sources.alert_writer import promote_staged

    epoch = int(committed[0].split("-")[1])
    # retried commit of an already-promoted epoch: must drop the staged
    # duplicate and leave the committed ledger byte-identical
    promote_staged(str(ledger), [_M()], epoch)
    assert not os.path.exists(dup)
    after = sorted(tuple(r) for r in read_ledger(spark, str(ledger)).collect())
    assert after == first

    # a FRESH epoch promotes the staged file
    with open(dup, "w") as fh:
        fh.write('{"id": "a9", "output": "json:y", "service": "json", '
                 '"descriptor": "y", "body_md5": "beef"}\n')
    promote_staged(str(ledger), [_M()], epoch + 1)
    assert os.path.exists(
        os.path.join(str(ledger), f"epoch-{epoch + 1}-task-0-999.jsonl"))
    grown = read_ledger(spark, str(ledger)).count()
    assert grown == len(first) + 1


def test_crash_between_rename_and_manifest_is_exactly_once(spark, tmp_path):
    """The closed window: attempt 1 renames its files but crashes before
    the manifest lands; the retry runs with DIFFERENT partitioning
    (different task layout and receipts-per-file split). The ledger must
    contain exactly the retry's receipts — no duplicates from the
    orphaned attempt-1 parts, no lost rows."""
    import json as _json

    from streamalert_spark.sources.alert_writer import (
        promote_staged, read_ledger,
    )

    ledger = tmp_path / "ledger"
    staging = ledger / "_staging"
    staging.mkdir(parents=True)

    def _stage(name, receipts):
        p = staging / name
        with open(p, "w") as fh:
            for rid in receipts:
                fh.write(_json.dumps({
                    "id": rid, "output": "json:x", "service": "json",
                    "descriptor": "x", "body_md5": "00"}) + "\n")
        return p

    class _M:
        def __init__(self, staged):
            self.staged = str(staged)
            self.rows = 1

    # attempt 1: two tasks, receipts split (a1,a2)/(a3) — crash AFTER
    # the renames, BEFORE the manifest write
    msgs1 = [_M(_stage("task-0-100.jsonl", ["a1", "a2"])),
             _M(_stage("task-1-101.jsonl", ["a3"]))]
    real_replace = os.replace

    def crash_on_manifest(src, dst):
        if dst.endswith(".manifest.json"):
            raise OSError("simulated crash before manifest")
        return real_replace(src, dst)

    import streamalert_spark.sources.alert_writer as aw
    orig = aw.os.replace
    aw.os.replace = crash_on_manifest
    try:
        with pytest.raises(OSError):
            promote_staged(str(ledger), msgs1, 0)
    finally:
        aw.os.replace = orig
    # orphaned epoch files exist, but nothing is readable yet
    orphans = [f for f in os.listdir(ledger) if f.endswith(".jsonl")]
    assert len(orphans) == 2
    assert read_ledger(spark, str(ledger)).count() == 0

    # retry: THREE tasks this time (different partitioning), same rows
    msgs2 = [_M(_stage("task-0-200.jsonl", ["a1"])),
             _M(_stage("task-1-201.jsonl", ["a2"])),
             _M(_stage("task-2-202.jsonl", ["a3"]))]
    promote_staged(str(ledger), msgs2, 0)

    rows = sorted(r.id for r in read_ledger(spark, str(ledger)).collect())
    assert rows == ["a1", "a2", "a3"]  # exactly once, despite orphans
    # and the attempt-1 orphans were swept
    parts = [f for f in os.listdir(ledger) if f.endswith(".jsonl")]
    assert sorted(parts) == ["epoch-0-task-0-200.jsonl",
                             "epoch-0-task-1-201.jsonl",
                             "epoch-0-task-2-202.jsonl"]


def test_empty_ledger_reads_as_typed_empty_frame(spark, tmp_path):
    """Zero committed epochs (no alerts, or all outputs malformed) must
    read back as the empty typed ledger, never PATH_NOT_FOUND."""
    out = read_ledger(spark, str(tmp_path / "nothing"))
    assert out.count() == 0
    assert out.columns == ["id", "output", "service", "descriptor", "body_md5"]
