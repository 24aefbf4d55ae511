"""Conversion send orchestration — the W10 send path behind the payload
templaters in :mod:`jitsu_spark.operators.conversion`.

Reference semantics (re-derived, no code ported): the reference drains a
per-destination persistent queue with workers that POST one event at a
time and re-enqueue on error (`server/adapters/facebook_conversion_api.go:149`
``Send``, `server/adapters/google_analytics.go:76` ``Send``; the retry loop
lives in the events queue that feeds them). Delivery is at-least-once;
effective exactly-once comes from the RECEIVER deduplicating on the
deterministic event id carried in every payload (the documented contract
of both conversion APIs). This engine keeps that contract but reshapes the
egress for Spark:

- payloads are deterministically BATCHED (md5-bucket on the event id — no
  global sort, no single-partition window, oracle-expressible),
- batches are SPOOLED as one NDJSON directory per batch (the staged-copy
  analog; on a cluster this is object storage any relay can drain),
- sends fan out EXECUTOR-SIDE over the pending batches (mapInPandas — a
  1000-executor cluster posts 1000 batches concurrently; the driver only
  ever sees O(n_batches) ack rows),
- per-batch acks commit to an ack manifest AFTER the send job, so the
  crash window (sent, not yet acked) re-sends whole batches — safe under
  the idempotent-receiver contract,
- permanently failed batches are recorded (status=failed, attempts, last
  error) and re-sent only via :meth:`ConversionSendJob.replay_failed` —
  the reference's re-enqueue, made explicit.

The transport is a pluggable callable ``transport(batch_no, payloads)``
(raise to fail) because this sandbox has no network; a real deployment
passes an HTTP POST closure. json.loads inside the send task is the
unavoidable boundary cost of handing Python strings to a Python transport
— it is egress, not the data plane.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def assign_send_batches(
    df: DataFrame, id_col: str, n_batches: int, batch_col: str = "batch_no"
) -> DataFrame:
    """Deterministic batch assignment: first 4 hex chars of md5(id) mod
    ``n_batches``. Hash-based (not row_number) so no global sort and no
    count() is needed, and a DuckDB oracle can recompute it exactly."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10)
    return df.withColumn(
        batch_col, F.pmod(h.cast("long"), F.lit(n_batches)).cast("int")
    )


@dataclass
class SendReport:
    sent: int
    failed: int
    skipped_acked: int
    attempts: int


class ConversionSendJob:
    """Spool a payload frame into deterministic batches, then deliver each
    batch through ``transport`` with bounded retries and a durable per-batch
    ack manifest. ``send()`` skips batches already acked (sent OR failed);
    ``replay_failed()`` clears failed acks and re-sends only those."""

    def __init__(
        self,
        work_dir: str,
        transport: Callable[[int, list[str]], None],
        *,
        id_col: str = "event_id",
        payload_col: str = "payload",
        n_batches: int = 16,
        max_retries: int = 3,
    ):
        self.work_dir = work_dir
        self.transport = transport
        self.id_col = id_col
        self.payload_col = payload_col
        self.n_batches = n_batches
        self.max_retries = max_retries
        self.spool_dir = os.path.join(work_dir, "spool")
        self.acks_dir = os.path.join(work_dir, "acks")
        self.manifest_path = os.path.join(work_dir, "manifest.json")
        os.makedirs(self.acks_dir, exist_ok=True)

    # -- spool ---------------------------------------------------------

    def spool(self, df: DataFrame) -> dict[str, int]:
        """Write one NDJSON directory per batch plus a batch->n_events
        manifest carrying a per-batch CONTENT signature (order-independent
        xor of xxhash64(id, payload)). Re-spooling the same frame rewrites
        identical content, so a crashed spool is safely re-run; re-spooling
        DIFFERENT content into the same work_dir invalidates the old acks
        (they are tied to the old signatures) — without that, day-2 data in
        a reused work_dir would be silently 'already sent'."""
        batched = assign_send_batches(
            df.select(
                F.col(self.id_col).cast("string").alias("id"),
                F.col(self.payload_col).cast("string").alias("payload"),
            ),
            "id",
            self.n_batches,
        )
        stats = batched.groupBy("batch_no").agg(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64("id", "payload")).alias("sig"),
        ).collect()  # bounded: <= n_batches rows
        if any(r["batch_no"] is None for r in stats):
            raise ValueError(
                f"payload frame contains NULL {self.id_col!r} values — "
                "every conversion event needs a deterministic id"
            )
        counts = {int(r["batch_no"]): int(r["n"]) for r in stats}
        sigs = {int(r["batch_no"]): f"{int(r['sig']) & 0xFFFFFFFFFFFFFFFF:016x}" for r in stats}
        (
            batched.repartition(self.n_batches, "batch_no")
            .sortWithinPartitions("id")
            .write.mode("overwrite")
            .partitionBy("batch_no")
            .json(self.spool_dir)
        )
        # drop acks that no longer match this spool's content before the
        # manifest flips, so a crash between the two steps fails safe
        # (stale manifest + cleared acks -> re-send, never silent skip)
        for b, ack in self.acks().items():
            if ack.get("sig") != sigs.get(b):
                os.remove(os.path.join(self.acks_dir, f"batch_{b}.json"))
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    str(k): {"n": counts[k], "sig": sigs[k]}
                    for k in sorted(counts)
                },
                f,
            )
        os.replace(tmp, self.manifest_path)
        return counts

    # -- ack manifest ----------------------------------------------------

    def _manifest_raw(self) -> dict[int, dict]:
        with open(self.manifest_path) as f:
            raw = json.load(f)
        # legacy flat {batch: n} manifests read as sig-less entries
        return {
            int(k): (v if isinstance(v, dict) else {"n": v, "sig": None})
            for k, v in raw.items()
        }

    def _manifest(self) -> dict[int, int]:
        return {b: e["n"] for b, e in self._manifest_raw().items()}

    def acks(self) -> dict[int, dict]:
        out: dict[int, dict] = {}
        for name in os.listdir(self.acks_dir):
            if name.startswith("batch_") and name.endswith(".json"):
                with open(os.path.join(self.acks_dir, name)) as f:
                    ack = json.load(f)
                out[int(ack["batch_no"])] = ack
        return out

    def _write_ack(self, ack: dict) -> None:
        path = os.path.join(self.acks_dir, f"batch_{ack['batch_no']}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(ack, f)
        os.replace(tmp, path)

    # -- send ------------------------------------------------------------

    def _send_batches(self, spark: SparkSession, pending: list[int]) -> SendReport:
        if not pending:
            return SendReport(0, 0, len(self.acks()), 0)
        spool_dir = self.spool_dir
        transport = self.transport
        max_retries = self.max_retries

        def send_part(frames) -> Iterator:
            import pandas as pd

            for pdf in frames:
                rows = []
                for b in pdf["batch_no"]:
                    b = int(b)
                    bdir = os.path.join(spool_dir, f"batch_no={b}")
                    payloads = []
                    for part in sorted(os.listdir(bdir)):
                        if not part.endswith(".json"):
                            continue
                        with open(os.path.join(bdir, part)) as f:
                            for line in f:
                                if line.strip():
                                    payloads.append(json.loads(line)["payload"])
                    attempts, err = 0, None
                    while attempts < max_retries:
                        attempts += 1
                        try:
                            transport(b, payloads)
                            err = None
                            break
                        except Exception as exc:  # noqa: BLE001 — transport boundary
                            err = f"{type(exc).__name__}: {exc}"
                    rows.append(
                        (b, "sent" if err is None else "failed", attempts, err)
                    )
                yield pd.DataFrame(
                    rows, columns=["batch_no", "status", "attempts", "error"]
                )

        pend_df = spark.createDataFrame(
            [(b,) for b in sorted(pending)], "batch_no int"
        ).repartition(min(len(pending), 32), "batch_no")
        ack_rows = pend_df.mapInPandas(
            send_part, "batch_no int, status string, attempts int, error string"
        ).collect()  # bounded: one row per pending batch

        manifest = self._manifest_raw()
        sent = failed = attempts = 0
        for r in ack_rows:
            entry = manifest.get(int(r["batch_no"]), {"n": 0, "sig": None})
            ack = {
                "batch_no": int(r["batch_no"]),
                "status": r["status"],
                "attempts": int(r["attempts"]),
                "error": r["error"],
                "n_events": entry["n"],
                # ties the ack to the spool CONTENT it acknowledges
                "sig": entry["sig"],
            }
            self._write_ack(ack)
            attempts += ack["attempts"]
            if ack["status"] == "sent":
                sent += 1
            else:
                failed += 1
        return SendReport(sent, failed, len(self.acks()) - sent - failed, attempts)

    def send(self, spark: SparkSession) -> SendReport:
        """Deliver every spooled batch that has no ack yet (resume-safe:
        a crash after the send job but before acks re-sends those batches
        — at-least-once under the idempotent-receiver contract)."""
        acked = self.acks()
        manifest = self._manifest_raw()
        pending = [
            b
            for b, e in manifest.items()
            if b not in acked or acked[b].get("sig") != e["sig"]
        ]
        return self._send_batches(spark, pending)

    def replay_failed(self, spark: SparkSession) -> SendReport:
        """Re-send ONLY batches whose ack is status=failed (the reference's
        re-enqueue, as an explicit operator)."""
        failed = [b for b, a in self.acks().items() if a["status"] == "failed"]
        for b in failed:
            os.remove(os.path.join(self.acks_dir, f"batch_{b}.json"))
        return self._send_batches(spark, failed)

    # -- observability -----------------------------------------------------

    def ack_frame(self, spark: SparkSession) -> DataFrame:
        """The ack manifest as a DataFrame (batch_no, status, attempts,
        n_events) — the SQL-queryable send ledger."""
        acks = sorted(self.acks().values(), key=lambda a: a["batch_no"])
        return spark.createDataFrame(
            [
                (a["batch_no"], a["status"], a["attempts"], a["n_events"])
                for a in acks
            ],
            "batch_no int, status string, attempts int, n_events long",
        )
