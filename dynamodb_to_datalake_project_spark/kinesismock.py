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

    def _next_seq(self) -> int:
        seq = 0
        if os.path.isfile(self._seq_file):
            with open(self._seq_file) as f:
                seq = int(f.read())
        with open(self._seq_file, "w") as f:
            f.write(str(seq + 1))
        return seq

    def put_record(self, partition_key: str, data: dict) -> int:
        """PutRecord: route by MD5(partition_key), assign the next
        sequence number, persist durably. Returns the sequence."""
        shard = shard_for_key(partition_key, self.n_shards)
        seq = self._next_seq()
        path = os.path.join(
            self.root, f"shard-{shard}", f"{seq:012d}.json"
        )
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"partition_key": partition_key, "data": data}, f)
        os.replace(tmp, path)
        return seq

    def shard_sequences(self) -> "dict[str, int]":
        """Per shard: one past the highest durable sequence number
        (the exclusive end offset a consumer reads to)."""
        out = {}
        for s in range(self.n_shards):
            d = os.path.join(self.root, f"shard-{s}")
            seqs = [
                int(f[:-5])
                for f in os.listdir(d)
                if f.endswith(".json")
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

    def initialOffset(self) -> dict:
        return {f"shard-{s}": 0 for s in range(self.n_shards)}

    def latestOffset(self) -> dict:
        latest = MockKinesisStream(self.root, self.n_shards).shard_sequences()
        return {k: int(v) for k, v in latest.items()}

    def partitions(self, start: dict, end: dict):
        out = []
        for shard, lo in start.items():
            hi = min(int(end[shard]), int(lo) + self.max_per_shard)
            out.append(_ShardSlice(self.root, shard, int(lo), hi))
        return out

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
