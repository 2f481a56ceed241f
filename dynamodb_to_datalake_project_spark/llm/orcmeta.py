"""ORC tail metadata parse — completes the columnar-format trio
(parquet: `llm.parquetmeta`, avro: `llm.avrofile`). The ORC file tail
is protobuf: a 1-byte postscript length at the very end, the
PostScript message before it (compression kind, footer length, the
"ORC" magic as field 8000), and the Footer message before THAT
(stripe list with per-stripe row counts, the type tree, total rows,
content length). The generic protobuf wire reader from
`llm.tfrecord` decodes both messages by the public orc_proto field
numbers — no ORC library anywhere.

Subset contract: NONE-compressed tails fully parsed (pyarrow's
default); ZLIB- and ZSTD-compressed tails are decoded per the ORC
chunked codec framing (3-byte header: length<<1 | is_original; ZSTD
chunks are RFC 8878 frames via the zero-dep `llm.zstd` decoder);
SNAPPY/LZO/LZ4 tails raise NotImplementedError. Malformed tails
raise ValueError (quarantine)."""

from __future__ import annotations

import zlib

from dynamodb_to_datalake_project_spark.llm.tfrecord import _PbReader

_ORC_COMPRESSION = {
    0: "NONE", 1: "ZLIB", 2: "SNAPPY", 3: "LZO", 4: "LZ4", 5: "ZSTD",
}

#: orc_proto.Type.Kind enum names (public spec)
_ORC_KINDS = {
    0: "BOOLEAN", 1: "BYTE", 2: "SHORT", 3: "INT", 4: "LONG", 5: "FLOAT",
    6: "DOUBLE", 7: "STRING", 8: "BINARY", 9: "TIMESTAMP", 10: "LIST",
    11: "MAP", 12: "STRUCT", 13: "UNION", 14: "DECIMAL", 15: "DATE",
    16: "VARCHAR", 17: "CHAR",
}


def _orc_decompress(buf: bytes, kind: int) -> bytes:
    """ORC compressed-stream framing: repeated [3-byte little-endian
    header = chunk_len << 1 | is_original][chunk]."""
    if kind == 0:
        return buf
    if kind not in (1, 5):
        raise NotImplementedError(
            f"orc: {_ORC_COMPRESSION.get(kind, kind)} tails not implemented"
        )
    out = bytearray()
    at = 0
    while at < len(buf):
        if at + 3 > len(buf):
            raise ValueError("orc: truncated compression chunk header")
        hdr = int.from_bytes(buf[at : at + 3], "little")
        ln, original = hdr >> 1, hdr & 1
        at += 3
        chunk = buf[at : at + ln]
        if len(chunk) != ln:
            raise ValueError("orc: truncated compression chunk")
        at += ln
        if original:
            out += chunk
        elif kind == 1:
            try:
                out += zlib.decompress(chunk, -15)
            except zlib.error as exc:
                raise ValueError(f"orc: bad ZLIB chunk: {exc}")
        else:  # ZSTD: each non-original chunk is one RFC 8878 frame
            from dynamodb_to_datalake_project_spark.llm.zstd import (
                zstd_decompress,
            )

            out += zstd_decompress(chunk)
    return bytes(out)


def parse_orc_tail(payload: bytes) -> dict:
    """Parse an ORC file's tail: postscript (compression, footer
    length, magic), then the footer (stripes, type tree, row counts).
    Returns the audit surface: {"compression", "num_rows",
    "content_length", "n_stripes", "stripe_rows": [...],
    "column_kinds": [...], "field_names": [...]}."""
    n = len(payload)
    if n < 4:
        raise ValueError("orc: too short for a postscript")
    ps_len = payload[-1]
    if ps_len == 0 or n < 1 + ps_len:
        raise ValueError("orc: bad postscript length")
    ps_raw = payload[n - 1 - ps_len : n - 1]
    footer_len = None
    compression = 0
    magic = None
    for field, wire, v in _PbReader(ps_raw).fields():
        if field == 1 and wire == 0:
            footer_len = v
        elif field == 2 and wire == 0:
            compression = v
        elif field == 8000 and wire == 2:
            magic = v
    if magic != b"ORC":
        raise ValueError(f"orc: postscript magic {magic!r}")
    if footer_len is None:
        raise ValueError("orc: postscript missing footerLength")
    foot_end = n - 1 - ps_len
    if footer_len > foot_end:
        raise ValueError("orc: footer overruns the file")
    footer = _orc_decompress(
        payload[foot_end - footer_len : foot_end], compression
    )

    num_rows = content_length = None
    stripe_rows: "list[int]" = []
    kinds: "list[str]" = []
    field_names: "list[str]" = []
    for field, wire, v in _PbReader(footer).fields():
        if field == 2 and wire == 0:
            content_length = v
        elif field == 3 and wire == 2:  # StripeInformation
            rows = 0
            for sf, sw, sv in _PbReader(v).fields():
                if sf == 5 and sw == 0:
                    rows = sv
            stripe_rows.append(rows)
        elif field == 4 and wire == 2:  # Type
            kind = 0
            for tf, tw, tv in _PbReader(v).fields():
                if tf == 1 and tw == 0:
                    kind = tv
                elif tf == 3 and tw == 2:
                    field_names.append(tv.decode("utf-8"))
            kinds.append(_ORC_KINDS.get(kind, f"UNKNOWN({kind})"))
        elif field == 6 and wire == 0:
            num_rows = v
    if num_rows is None:
        raise ValueError("orc: footer missing numberOfRows")
    if stripe_rows and sum(stripe_rows) != num_rows:
        raise ValueError(
            f"orc: stripe rows {sum(stripe_rows)} disagree with "
            f"numberOfRows {num_rows}"
        )
    return {
        "compression": _ORC_COMPRESSION.get(compression, str(compression)),
        "num_rows": num_rows,
        "content_length": content_length,
        "n_stripes": len(stripe_rows),
        "stripe_rows": stripe_rows,
        "column_kinds": kinds,
        "field_names": field_names,
    }


def orc_audit_stats(docs):
    """Per doc: the words become a 2-column ORC file audited by the
    hand-parsed tail alone — rows, stripe census (one stripe at this
    size; the writer splits at 1024-row batches, proven multi-stripe
    in the unit tests), type-tree kinds and field names."""
    from collections.abc import Iterator as _Iterator

    import pandas as _pd
    from pyspark.sql import types as T

    schema_t = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("num_rows", T.LongType()),
            T.StructField("n_stripes", T.LongType()),
            T.StructField("n_columns", T.LongType()),
            T.StructField("schema_sig", T.StringType()),
            T.StructField("compression", T.StringType()),
        ]
    )

    def op(batches: "_Iterator[_pd.DataFrame]") -> "_Iterator[_pd.DataFrame]":
        import io

        import pyarrow as pa
        from pyarrow import orc as _orc

        out: dict[str, list] = {f.name: [] for f in schema_t.fields}
        for pdf in batches:
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                did = int(did)
                words = [w for w in text.split(" ") if w]
                table = pa.table(
                    {
                        "idx": pa.array(range(len(words)), pa.int64()),
                        "word": pa.array(words, pa.string()),
                    }
                )
                buf = io.BytesIO()
                _orc.write_table(table, buf)
                d = parse_orc_tail(buf.getvalue())
                assert d["num_rows"] == len(words)
                assert sum(d["stripe_rows"]) == len(words)
                out["doc_id"].append(did)
                out["num_rows"].append(d["num_rows"])
                out["n_stripes"].append(d["n_stripes"])
                out["n_columns"].append(len(d["field_names"]))
                out["schema_sig"].append(
                    ",".join(
                        f"{n}:{k}"
                        for n, k in zip(
                            d["field_names"], d["column_kinds"][1:]
                        )
                    )
                )
                out["compression"].append(d["compression"])
        yield _pd.DataFrame(out)

    spark = docs.sparkSession
    par = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return (
        docs.select("doc_id", "text").repartition(par)
        .mapInPandas(op, schema_t)
    )


def _register() -> None:
    from dynamodb_to_datalake_project_spark.catalog import query
    from dynamodb_to_datalake_project_spark.lake import load_table

    @query(
        "orc_tail_audit",
        oracle="""
        WITH t AS (
          SELECT doc_id,
                 len(list_filter(string_split(text, ' '), w -> w <> ''))
                   AS n
          FROM documents
        )
        SELECT doc_id,
               CAST(n AS BIGINT) AS num_rows,
               CAST((n + 1023) // 1024 AS BIGINT) AS n_stripes,
               CAST(2 AS BIGINT) AS n_columns,
               'idx:LONG,word:STRING' AS schema_sig,
               'NONE' AS compression
        FROM t
        """,
    )
    def q_orc_tail_audit(spark, sf_dir):
        """ORC audit over the documents table: each doc's words become
        a real pyarrow-written ORC file, audited by the
        hand-parsed protobuf tail alone — postscript, footer, stripe
        list, type tree. The oracle recomputes rows, the stripe
        packing arithmetic, and the schema signature from the word
        formula; the unit tests cross-check stripes/rows/compression
        against pyarrow's own ORCFile metadata, including
        ZLIB-compressed tails."""
        docs = load_table(spark, sf_dir, "documents")
        return orc_audit_stats(docs)


_register()
