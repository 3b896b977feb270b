"""``clickhouse_tail`` — a Structured Streaming SOURCE that tails a
growing remote table by a monotonically increasing key.

This is the read-direction completion of the streaming federation
story and the distributed extension of the reference's result
streaming (src/stream.rs:110-131 drains one query's RecordBatches into
a single client; here every micro-batch is a key-range delta and every
PARTITION of it is pulled by an executor over its own connection to
the remote's Arrow endpoint — the ``op: query`` half of
``ArrowIngestServer``). The write-direction twin is the executor-
parallel ingest path (engine._stream_insert_executors).

Semantics
---------
* Offset = the high-water mark of ``key`` (a BIGINT column). A
  micro-batch covers ``(start.key, end.key]``; ``latestOffset`` polls
  ``max(key)``. Offsets are checkpointable JSON, so a restarted query
  resumes from the committed watermark — combined with the sink side
  (``stream_to_remote_table(exactly_once=True)``) this gives an
  end-to-end exactly-once remote→Spark→remote pipeline.
* The table must be APPEND-ONLY IN ``key``: a row inserted with a key
  at or below a committed watermark is never seen (the same contract
  as every watermark CDC tail; use an auto-increment/ingest-time key).
* Partition planning is SKEW-PROOF: batch key ranges are split at
  ``ntile`` boundaries of the actual keys in range (one remote window
  query per micro-batch), not at arithmetic midpoints, so a range
  whose keys cluster densely still yields equal-row partitions.

100 TB note: the driver never touches a data row — it runs two scalar
queries per micro-batch (max-key poll + boundary ntile); rows flow
remote→executor N-ways in Arrow batches. Backpressure is
``max_rows_per_batch``: ``latestOffset`` advances at most that many
rows past the committed watermark per micro-batch (clamped via a
windowed nth-key probe), the Kafka ``maxOffsetsPerTrigger`` analog.
The cap holds across restarts INCLUDING the catch-up batch: capped
tails persist their plan-time watermark in a remote
``<table>__tail_progress`` row (monotone greatest-wins upsert, keyed
by ``tail_id``), which is always at or above the committed watermark
— the restart-safe cap base the checkpoint-blind reader cannot
otherwise know (see ``_recover_base``). One API-shaped caveat: the Python DataSourceStreamReader protocol has
no separate report-true-latest hook, so a capped ``latestOffset`` is
also what ``processAllAvailable`` compares against — a capped stream
looks "caught up" after each batch, and test-style drains must loop
until the counts stabilize (continuous/interval triggers, the
production shape, are unaffected: the next trigger re-polls).
"""

from __future__ import annotations

import json
import socket
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

TAIL_FORMAT_NAME = "clickhouse_tail"


def _wire_query(host: str, port: int, sql: str, batch_rows: int = 65536):
    """Run ``sql`` against the remote's Arrow endpoint; yield
    RecordBatches. Used by the driver (scalar polls) and by executors
    (range scans) alike — the source's only data plane."""
    import pyarrow as pa

    with socket.create_connection((host, port)) as s:
        f = s.makefile("rwb")
        hdr = json.dumps({"op": "query", "sql": sql,
                          "batch_rows": batch_rows}).encode()
        f.write(len(hdr).to_bytes(4, "big"))
        f.write(hdr)
        f.flush()
        status = f.read(1)
        if status != b"\x00":
            ln = int.from_bytes(f.read(4), "big")
            raise RuntimeError("remote query failed: "
                               + f.read(ln).decode())
        reader = pa.ipc.open_stream(f)
        for batch in reader:
            yield batch


def _scalar(host: str, port: int, sql: str):
    """First column of the first row of ``sql`` (None when empty)."""
    for batch in _wire_query(host, port, sql):
        if batch.num_rows:
            return batch.column(0)[0].as_py()
    return None


@dataclass
class _KeyRangePartition(InputPartition):
    host: str
    port: int
    sql: str
    batch_rows: int


class ClickHouseTailStreamReader(DataSourceStreamReader):
    """See module docstring. Options (via ``tail_remote_table`` or
    ``spark.readStream.format("clickhouse_tail")``):

    - ``host``/``port`` — the remote's Arrow endpoint
      (``RemoteEngine.start_ingest_server``).
    - ``table`` — remote table to tail; ``key`` — the monotonic
      column.
    - ``key_type`` — ``bigint`` (default) or ``timestamp`` (the
      event-time CDC shape): watermarks are tracked as epoch
      MICROSECONDS (exact at the remote's timestamp resolution), while
      range predicates compare the raw column against timestamp
      literals, so the remote's ordering/partitioning on the key stays
      usable. A ClickHouse retarget swaps the conversion pair
      ``epoch_us``/``make_timestamp`` for
      ``toUnixTimestamp64Micro``/``fromUnixTimestamp64Micro``.
    - ``columns`` (default ``*``) — projection pushed to the remote.
    - ``num_partitions`` (default 4) — executor pulls per micro-batch.
    - ``start_key`` — tail from this watermark (exclusive); default:
      everything (``min(key) - 1``). Epoch micros for timestamp keys.
    - ``max_rows_per_batch`` — micro-batch size cap (backpressure).
    """

    def __init__(self, options):
        self._host = options["host"]
        self._port = int(options["port"])
        self._table = options["table"]
        self._key = options["key"]
        self._key_type = options.get("key_type", "bigint").lower()
        self._cols = options.get("columns", "*")
        self._nparts = int(options.get("num_partitions", "4"))
        self._batch_rows = int(options.get("batch_rows", "65536"))
        self._start_key = options.get("start_key")
        self._max_rows = options.get("max_rows_per_batch")
        self._last: int | None = None
        # capped streams persist their PLAN-TIME watermark remote-side
        # so the cap survives restarts (see _recover_base)
        self._tail_id = (options.get("tail_id")
                         or f"{self._table}/{self._key}").replace("'", "''")
        self._progress = f"{self._table}__tail_progress"
        self._progress_ready = False

    def _knum(self) -> str:
        """The key as a BIGINT-valued SQL expression (offset plane)."""
        if self._key_type == "timestamp":
            return f"epoch_us({self._key})"
        return self._key

    def _klit(self, v: int) -> str:
        """An offset value as a key-typed SQL literal (predicate plane)."""
        if self._key_type == "timestamp":
            return f"make_timestamp({int(v)})"
        return str(int(v))

    # -- offsets ------------------------------------------------------
    def initialOffset(self) -> dict:
        if self._start_key is not None:
            self._last = int(self._start_key)
        else:
            lo = _scalar(self._host, self._port,
                         f"SELECT CAST(min({self._knum()}) - 1 AS BIGINT) "
                         f"FROM {self._table}")
            # empty table: any watermark below the first future key
            # works; 0 pairs with auto-increment/rowid-style keys and
            # start_key exists for anything exotic
            self._last = int(lo) if lo is not None else 0
        return {"key": self._last}

    def _exec(self, sql: str) -> None:
        for _ in _wire_query(self._host, self._port, sql):
            pass

    def _ensure_progress(self) -> None:
        if not self._progress_ready:
            self._exec(f"CREATE TABLE IF NOT EXISTS {self._progress} "
                       f"(tail_id VARCHAR PRIMARY KEY, watermark BIGINT)")
            self._progress_ready = True

    def _recover_base(self) -> int:
        """The cap base when this reader holds no in-memory watermark.

        Spark calls latestOffset BEFORE initialOffset on a fresh query
        and before partitions() on a restart (traced on 4.1), and
        accepts offsets it has not seen verbatim — a cap computed from
        a base below the committed watermark plans a BACKWARDS batch,
        Spark commits it, and the in-between keys replay as duplicates
        (the e2e pipeline test crashes mid-run to pin this). The safe
        base is the remote-side progress row: partitions() writes its
        PLAN-TIME watermark there with a monotone (greatest) upsert,
        and every committed batch was planned first, so the stored
        value is always >= the committed watermark. No row = a fresh
        tail = the initialOffset value is the true base."""
        self._ensure_progress()
        stored = _scalar(
            self._host, self._port,
            f"SELECT CAST(watermark AS BIGINT) FROM {self._progress} "
            f"WHERE tail_id = '{self._tail_id}'")
        if stored is not None:
            return int(stored)
        return int(self.initialOffset()["key"])

    def latestOffset(self) -> dict:
        if self._max_rows is not None:
            # backpressure: advance at most max_rows keys' worth — the
            # nth smallest key above the watermark (ORDER BY + LIMIT
            # pushed to the remote; rows never leave it). The base is
            # the in-memory watermark, recovered restart-safely from
            # the remote progress row when unknown (_recover_base), so
            # the cap holds even for the catch-up batch after a cold
            # start or restart — the batch where it matters most.
            if self._last is None:
                self._last = self._recover_base()
            hi = _scalar(
                self._host, self._port,
                f"SELECT CAST(max(k) AS BIGINT) FROM ("
                f"SELECT {self._knum()} AS k FROM {self._table} "
                f"WHERE {self._key} > {self._klit(self._last)} "
                f"ORDER BY k LIMIT {int(self._max_rows)})")
        else:
            hi = _scalar(self._host, self._port,
                         f"SELECT CAST(max({self._knum()}) AS BIGINT) "
                         f"FROM {self._table}")
        if hi is not None and (self._last is None or hi > self._last):
            self._last = int(hi)
        return {"key": self._last if self._last is not None else 0}

    # -- planning / reading -------------------------------------------
    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["key"]), int(end["key"])
        # the offsets Spark hands back are authoritative (they include
        # WAL-recovered batches on restart) — re-sync the in-memory
        # watermark from BOTH ends so a capped latestOffset never plans
        # below them (lo is the committed watermark on recovery)
        if self._last is None or max(lo, hi) > self._last:
            self._last = max(lo, hi)
        if self._max_rows is not None:
            # persist the plan-time watermark (monotone: greatest wins,
            # so concurrent tails sharing a tail_id can only raise it —
            # a too-high base softens the cap, never replays keys); the
            # restart-safe cap base _recover_base reads this back
            self._ensure_progress()
            self._exec(
                f"INSERT INTO {self._progress} VALUES "
                f"('{self._tail_id}', {self._last}) "
                f"ON CONFLICT (tail_id) DO UPDATE SET watermark = "
                f"greatest(excluded.watermark, watermark)")
        rng = (f"{self._key} > {self._klit(lo)} "
               f"AND {self._key} <= {self._klit(hi)}")
        # equal-ROW split boundaries via a discrete-quantile AGGREGATE —
        # one pass, no full sort (an ntile window materializes and sorts
        # the whole range per micro-batch, which dominates large
        # catch-up batches). quantile_disc returns actual key values, so
        # every boundary is a real row's key; a ClickHouse retarget
        # swaps in quantilesExact (this SQL only ever runs on the
        # remote's dialect, never through the local parser).
        qs = ", ".join(f"{(i + 1) / self._nparts:.6f}"
                       for i in range(self._nparts))
        raw = _scalar(
            self._host, self._port,
            f"SELECT quantile_disc({self._knum()}, [{qs}]) "
            f"FROM {self._table} WHERE {rng}")
        bounds = sorted({int(b) for b in (raw or []) if b is not None})
        if not bounds or bounds[-1] != hi:
            # hi always terminates the last range: quantile boundaries
            # come from rows present NOW, and the planned end must win
            bounds = [b for b in bounds if b < hi] + [hi]
        parts, prev = [], lo
        for b in bounds:
            # no ORDER BY: a sort per partition pull buys nothing (rows
            # within a Spark partition carry no order contract) and
            # costs the remote a sort of every range every micro-batch
            parts.append(_KeyRangePartition(
                self._host, self._port,
                f"SELECT {self._cols} FROM {self._table} "
                f"WHERE {self._key} > {self._klit(prev)} "
                f"AND {self._key} <= {self._klit(b)}",
                self._batch_rows))
            prev = b
        return parts

    def read(self, partition: _KeyRangePartition):
        yield from _wire_query(partition.host, partition.port,
                               partition.sql, partition.batch_rows)

    def commit(self, end: dict) -> None:
        pass  # the remote is the source of truth; nothing to ack


class ClickHouseTailDataSource(DataSource):
    """USAGE: ``spark.readStream.format("clickhouse_tail")
    .option("host", h).option("port", p).option("table", t)
    .option("key", k).load()`` — or the
    :func:`~clickhouse_datafusion_spark.streaming.tail_remote_table`
    wrapper, which wires the options from an attached RemoteEngine."""

    @classmethod
    def name(cls) -> str:
        return TAIL_FORMAT_NAME

    def schema(self) -> StructType:
        from pyspark.sql.pandas.types import from_arrow_schema

        import pyarrow as pa

        host = self.options["host"]
        port = int(self.options["port"])
        table = self.options["table"]
        cols = self.options.get("columns", "*")
        with socket.create_connection((host, port)) as s:
            f = s.makefile("rwb")
            hdr = json.dumps({
                "op": "query",
                "sql": f"SELECT {cols} FROM {table} LIMIT 0"}).encode()
            f.write(len(hdr).to_bytes(4, "big"))
            f.write(hdr)
            f.flush()
            status = f.read(1)
            if status != b"\x00":
                ln = int.from_bytes(f.read(4), "big")
                raise RuntimeError("clickhouse_tail schema probe failed: "
                                   + f.read(ln).decode())
            arrow_schema = pa.ipc.open_stream(f).schema
        return from_arrow_schema(arrow_schema, prefer_timestamp_ntz=True)

    def streamReader(self, schema: StructType) -> ClickHouseTailStreamReader:
        return ClickHouseTailStreamReader(dict(self.options))


def register_clickhouse_tail(spark) -> None:
    """Register the ``clickhouse_tail`` streaming source on the session."""
    spark.dataSource.register(ClickHouseTailDataSource)
