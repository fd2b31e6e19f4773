"""Alert-delivery streaming SINK as a Spark Python DataSource writer.

The reference's alert processor consumes alerts and POSTs per-service
request bodies (alert_processor/main.py:76-115); the engine's
AlertDispatcher (streaming/sinks.py) runs that loop inside foreachBatch
with a driver-side iterator — fine for tests, wrong shape for scale. This
DataSource moves delivery onto the EXECUTORS: ``write(iterator)`` runs
per partition, builds each alert's per-output request body with the
transport-free builders (streaming/outputs.py — slack / pagerduty-v2
bodies are the real protocol payloads), and stages the delivery ledger as
a task-local file; ``commit(messages, batchId)`` promotes the staged
files to ``epoch-<batchId>-part-<i>.jsonl`` exactly once (rename —
re-commit of a retried batch finds the target and skips), ``abort``
removes staging. That is the standard object-store commit pattern; swap
the local renames for a cloud store's atomic copy in production.

The ledger row is the delivery RECEIPT (alert id, output, service,
descriptor, md5 of the request body) — what the reference persists to its
alerts DynamoDB table as sent-output bookkeeping (main.py:92-115).
Bodies for unknown services are canonical sorted-key JSON of
(descriptor, id, rule_name) — deterministic and SQL-replayable, which is
what the driver-checked query hashes; slack/pagerduty bodies are
pytest-pinned instead (their mrkdwn/attachment shapes aren't SQL).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass



def _body_for(service: str, descriptor: str, alert: dict) -> dict:
    from streamalert_spark.streaming.outputs import (
        pagerduty_v2_request, slack_request,
    )

    if service == "slack":
        return slack_request(alert, descriptor)
    if service == "pagerduty-v2":
        return pagerduty_v2_request(alert, descriptor)
    return {"descriptor": descriptor, "id": alert.get("id"),
            "rule_name": alert.get("rule_name")}


def promote_staged(path: str, messages, batch_id: int) -> None:
    """Epoch commit: rename each staged task file to its final
    epoch-keyed name, then drop an epoch ``_DONE`` marker. Idempotent at
    the EPOCH level — a retried commit of a batch whose marker exists
    discards its staged files wholesale and changes nothing, so a replay
    that repartitioned differently (AQE after restart) can never append
    extra receipts next to the already-committed set. A crash BETWEEN the
    renames and the marker leaves a partially promoted epoch whose retry
    completes it; the residual window where a differently-partitioned
    retry interleaves with partially promoted files is the documented
    non-transactional-sink caveat (the same one Spark's own file sink
    closes with a driver-side manifest — use a transactional table format
    for stronger guarantees)."""
    marker = os.path.join(path, f"epoch-{batch_id}._DONE")
    if os.path.exists(marker):
        for m in messages or []:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)
        return
    for i, m in enumerate(messages):
        if m is None:
            continue
        final = os.path.join(path, f"epoch-{batch_id}-part-{i}.jsonl")
        if os.path.exists(final):
            if os.path.exists(m.staged):
                os.remove(m.staged)
            continue
        os.replace(m.staged, final)
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(str(len(messages or [])))
    os.replace(tmp, marker)


def register_alert_writer(spark) -> None:
    """Register the ``streamalert_outputs`` streaming sink format."""
    from pyspark.sql.datasource import (
        DataSource, DataSourceStreamWriter, WriterCommitMessage,
    )

    @dataclass
    class _Msg(WriterCommitMessage):
        staged: str
        rows: int

    class LedgerStreamWriter(DataSourceStreamWriter):
        def __init__(self, options):
            self.path = options.get("path")
            if not self.path:
                raise ValueError("streamalert_outputs requires option 'path'")

        def write(self, iterator):
            from pyspark import TaskContext

            ctx = TaskContext.get()
            staging = os.path.join(self.path, "_staging")
            os.makedirs(staging, exist_ok=True)
            # taskAttemptId is unique per attempt: a zombie task can never
            # clobber the retry's file; only committed files are ever read
            staged = os.path.join(
                staging,
                f"task-{ctx.partitionId()}-{ctx.taskAttemptId()}.jsonl")
            n = 0
            import hashlib

            with open(staged, "w") as fh:
                for row in iterator:
                    alert = row.asDict()
                    outputs = alert.get("outputs")
                    if isinstance(outputs, str):
                        outputs = json.loads(outputs)
                    for output in outputs or []:
                        if ":" not in output:
                            continue
                        service, descriptor = output.split(":", 1)
                        body = _body_for(service, descriptor, alert)
                        digest = hashlib.md5(
                            json.dumps(body, sort_keys=True, default=str)
                            .encode()).hexdigest()
                        fh.write(json.dumps({
                            "id": alert.get("id"),
                            "output": output,
                            "service": service,
                            "descriptor": descriptor,
                            "body_md5": digest,
                        }, sort_keys=True) + "\n")
                        n += 1
            return _Msg(staged=staged, rows=n)

        def commit(self, messages, batchId) -> None:
            promote_staged(self.path, messages, batchId)

        def abort(self, messages, batchId) -> None:
            for m in messages or []:
                if m is not None and os.path.exists(m.staged):
                    os.remove(m.staged)

    class AlertOutputsDataSource(DataSource):
        @classmethod
        def name(cls) -> str:
            return "streamalert_outputs"

        def streamWriter(self, schema, overwrite):
            return LedgerStreamWriter(self.options)

    spark.dataSource.register(AlertOutputsDataSource)


_LEDGER_SCHEMA = ("id string, output string, service string, "
                  "descriptor string, body_md5 string")


def read_ledger(spark, path: str):
    """Committed ledger rows (staged files are never visible here). A
    run that committed no epochs — zero alerts, or every row's outputs
    malformed — yields the EMPTY typed ledger, not a PATH_NOT_FOUND."""
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(path, "epoch-*.jsonl")))
    if not files:
        return spark.createDataFrame([], _LEDGER_SCHEMA)
    return spark.read.schema(_LEDGER_SCHEMA).json(files)
