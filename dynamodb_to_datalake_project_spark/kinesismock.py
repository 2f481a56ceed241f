"""S6 hot-side connector contract, proven against a Kinesis-shaped
mock: a shard-partitioned stream with sequence-number offsets, wired
into Structured Streaming as a REAL source via PySpark 4's Python
data source API (`pyspark.sql.datasource`) — shard fan-out becomes
one InputPartition per shard, resume-from-sequence rides Spark's own
offset log, and every downstream plan (`start_cdc_merge`,
watermarked windows) is unchanged from the file-drop source.

The reference consumes DynamoDB Streams through a Lambda
(lambda_functions/dynamodb_stream_consumer.py:31-49) whose event
source mapping is shard-parallel with checkpointed sequence numbers
(cdk_define.py:249-256 sets batch size / window — the knobs this
source mirrors as `max_records_per_shard_per_batch`). A real
deployment swaps `MockKinesisStream` for the Kinesis SDK with the
SAME contract: records are routed to shards by the MD5 of their
partition key (the Kinesis hash-range rule), each shard is totally
ordered by sequence number, and a consumer resumes from the last
committed sequence per shard.

The mock is DIRECTORY-backed (one JSON file per record under
`shard-N/<seq>.json`) so producers append between micro-batches and
executor tasks read independently — the same durability seam the
JSON-drop source uses, but with the shard/sequence topology of the
real service.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

#: the wire schema every record carries (the spark-kinesis connector
#: shape: opaque data blob + stream metadata)
RECORD_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.StringType()),
        T.StructField("sequence_number", T.LongType()),
        T.StructField("partition_key", T.StringType()),
        T.StructField("data", T.StringType()),
    ]
)


def shard_for_key(partition_key: str, n_shards: int) -> int:
    """Kinesis routing: MD5 of the partition key as a 128-bit int,
    mapped onto the shard hash ranges (equal ranges here)."""
    h = int.from_bytes(hashlib.md5(partition_key.encode()).digest(), "big")
    return h * n_shards >> 128


class MockKinesisStream:
    """Producer/admin handle for a directory-backed mock stream."""

    def __init__(self, root: str, n_shards: int = 4):
        self.root = root
        self.n_shards = n_shards
        for s in range(n_shards):
            os.makedirs(os.path.join(root, f"shard-{s}"), exist_ok=True)
        self._seq_file = os.path.join(root, "_next_seq")
        self._claims_dir = os.path.join(root, "_seq_claims")
        os.makedirs(self._claims_dir, exist_ok=True)

    def _next_seq(self, shard: int) -> int:
        """Atomically allocate the next global sequence number. The
        O_EXCL claim file (named by sequence, content = shard) is the
        allocation authority — two concurrent producers can never win
        the same sequence; `_next_seq` (the counter file) is only a
        starting-point hint, racy by design and never trusted.
        Claim files are kept: they double as the in-flight ledger
        `shard_sequences` uses to hold batch end-offsets below any
        claimed-but-not-yet-durable record (without that fence a
        batch boundary passing a pending sequence would skip the
        record forever)."""
        seq = 0
        if os.path.isfile(self._seq_file):
            with open(self._seq_file) as f:
                try:
                    seq = int(f.read())
                except ValueError:
                    seq = 0
        while True:
            try:
                fd = os.open(
                    os.path.join(self._claims_dir, f"{seq:012d}"),
                    os.O_CREAT | os.O_EXCL | os.O_WRONLY,
                )
                break
            except FileExistsError:
                seq += 1
        with os.fdopen(fd, "w") as f:
            f.write(str(shard))
        tmp = self._seq_file + f".{seq}.tmp"
        with open(tmp, "w") as f:
            f.write(str(seq + 1))
        os.replace(tmp, self._seq_file)
        return seq

    def put_record(self, partition_key: str, data: dict) -> int:
        """PutRecord: route by MD5(partition_key), assign the next
        sequence number, persist durably. Returns the sequence."""
        shard = shard_for_key(partition_key, self.n_shards)
        seq = self._next_seq(shard)
        path = os.path.join(
            self.root, f"shard-{shard}", f"{seq:012d}.json"
        )
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"partition_key": partition_key, "data": data}, f)
        os.replace(tmp, path)
        return seq

    def _pending_floor(self) -> "int | None":
        """Lowest sequence claimed by a producer whose record is not
        yet durable (crash-or-in-flight), or None when every claim is
        backed by a durable record."""
        floor = None
        for f in sorted(os.listdir(self._claims_dir)):
            if not f.isdigit():
                continue
            with open(os.path.join(self._claims_dir, f)) as fh:
                shard = fh.read().strip()
            rec = os.path.join(self.root, f"shard-{shard}", f + ".json")
            if not os.path.isfile(rec):
                floor = int(f)
                break
        return floor

    def shard_sequences(self) -> "dict[str, int]":
        """Per shard: one past the highest durable sequence number
        (the exclusive end offset a consumer reads to) — capped below
        the pending-claim floor so a sequence claimed but not yet
        durable when the batch boundary passes is picked up by the
        NEXT batch instead of skipped forever."""
        out = {}
        floor = self._pending_floor()
        for s in range(self.n_shards):
            d = os.path.join(self.root, f"shard-{s}")
            seqs = [
                int(f[:-5])
                for f in os.listdir(d)
                if f.endswith(".json")
                and (floor is None or int(f[:-5]) < floor)
            ]
            out[f"shard-{s}"] = max(seqs) + 1 if seqs else 0
        return out


class _ShardSlice(InputPartition):
    def __init__(self, root: str, shard: str, start: int, end: int):
        self.root = root
        self.shard = shard
        self.start = start
        self.end = end


class _KinesisMockStreamReader(DataSourceStreamReader):
    """One InputPartition per shard per micro-batch; offsets are the
    per-shard exclusive end sequences, serialized into Spark's
    streaming offset log (checkpointLocation) — restart resumes from
    the committed sequences without touching this module."""

    def __init__(self, options: dict):
        self.root = options["path"]
        self.n_shards = int(options.get("n_shards", "4"))
        self.max_per_shard = int(
            options.get("max_records_per_shard_per_batch", "10000")
        )
        # last end offset THIS reader returned: anchor for the
        # per-batch ingestion bound (see latestOffset)
        self._last_end: "dict | None" = None

    def initialOffset(self) -> dict:
        return {f"shard-{s}": 0 for s in range(self.n_shards)}

    def latestOffset(self) -> dict:
        """Next batch's end offsets. The T6 ingestion bound
        (`max_records_per_shard_per_batch`) is applied HERE, not in
        `partitions`: Spark commits whatever this returns as the new
        start, so a `partitions` that reads less than [start, end)
        would skip the gap forever. Capping is anchored to the end
        this reader returned last batch; the first batch after a
        restart is uncapped (the checkpointed start isn't visible
        here — a pacing knob, never a correctness one)."""
        latest = MockKinesisStream(self.root, self.n_shards).shard_sequences()
        end = {k: int(v) for k, v in latest.items()}
        if self._last_end is not None:
            end = {
                k: max(
                    self._last_end.get(k, 0),
                    min(v, self._last_end.get(k, 0) + self.max_per_shard),
                )
                for k, v in end.items()
            }
        self._last_end = end
        return end

    def partitions(self, start: dict, end: dict):
        # must cover EXACTLY [start, end): Spark commits `end`
        return [
            _ShardSlice(self.root, shard, int(lo), int(end[shard]))
            for shard, lo in start.items()
        ]

    def read(self, partition: _ShardSlice):
        d = os.path.join(partition.root, partition.shard)
        if not os.path.isdir(d):
            return
        for f in sorted(os.listdir(d)):
            if not f.endswith(".json"):
                continue
            seq = int(f[:-5])
            if not (partition.start <= seq < partition.end):
                continue
            with open(os.path.join(d, f)) as fh:
                rec = json.load(fh)
            yield (
                partition.shard,
                seq,
                rec["partition_key"],
                json.dumps(rec["data"]),
            )

    def commit(self, end: dict) -> None:
        pass  # durable retention is the stream's concern (mock keeps all)


class KinesisMockDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kinesis_mock"

    def schema(self):
        return RECORD_SCHEMA

    def streamReader(self, schema):
        return _KinesisMockStreamReader(self.options)


def read_kinesis_stream(
    spark: SparkSession,
    stream_root: str,
    payload_schema: T.StructType,
    n_shards: int = 4,
    max_records_per_shard_per_batch: int = 10000,
) -> DataFrame:
    """S6 hot side: shard-parallel Kinesis-shaped stream -> rows of
    (shard_id, sequence_number, partition_key) + the payload columns
    parsed from the data blob. Drop-in ahead of `start_cdc_merge`'s
    foreachBatch merge — same plan as the JSON-drop source, different
    transport."""
    spark.dataSource.register(KinesisMockDataSource)
    raw = (
        spark.readStream.format("kinesis_mock")
        .option("path", stream_root)
        .option("n_shards", str(n_shards))
        .option(
            "max_records_per_shard_per_batch",
            str(max_records_per_shard_per_batch),
        )
        .load()
    )
    return raw.select(
        "shard_id",
        "sequence_number",
        "partition_key",
        F.from_json("data", payload_schema).alias("p"),
    ).select("shard_id", "sequence_number", "partition_key", "p.*")
