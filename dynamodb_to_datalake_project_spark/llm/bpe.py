"""Distributed BPE merge training — the tokenizer-training step of an
LLM data pipeline, as an iterative Spark job.

Mirrors the classic Sennrich et al. (2016) word-internal BPE trainer:
count corpus word frequencies once, then repeatedly (1) count adjacent
symbol pairs weighted by word frequency, (2) pick the most frequent
pair, (3) merge it greedily left-to-right inside every word.

Scale design (cf. `graph.py`'s connected-components loop for the same
iterative discipline):
- The corpus is scanned ONCE: the working set is the distinct-word
  vocabulary with frequencies (explode + map-side-combinable count) —
  at 100 TB that's ~10-100 M rows, not corpus-sized, and every
  iteration touches only this frame.
- Per iteration: one map-only pair explode + one bounded-key groupBy
  (keys = distinct symbol pairs), and exactly ONE row collected to the
  driver (the argmax pair — `TakeOrderedAndProject`, no full sort).
  The merge application is a pure per-row array fold, embarrassingly
  parallel.
- `localCheckpoint(eager=True)` after each merge truncates the lineage
  (n_merges chained folds would otherwise compound the plan) and
  re-materializes the shrinking vocab — the standard iterative-Spark
  pattern.

The merge list itself is driver-sized by contract (a tokenizer's merge
table is the ARTIFACT, thousands of rows), exactly like the CC loop's
O(1) convergence signature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dynamodb_to_datalake_project_spark.catalog import query
from dynamodb_to_datalake_project_spark.lake import load_table
from dynamodb_to_datalake_project_spark.llm.text import tokens


def word_frequencies(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — one explode + one combinable
    count aggregation; the only corpus-sized pass of BPE training."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _merge_step(syms, left: str, right: str):
    """Greedy left-to-right non-overlapping merge of (left, right) in a
    symbol array, as one fold: append each symbol unless it closes the
    pair with the accumulator's last element, in which case replace
    that element with the merged symbol. Non-overlap falls out of the
    fold: a merged occurrence's last element is `left+right`, which can
    no longer match `left` (symbols are non-empty)."""
    merged = left + right
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (s == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int = 16,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Learn `n_merges` BPE merges from a corpus; returns a DataFrame
    (rank, left, right, pair_count) ordered by rank. Deterministic:
    ties in pair count break lexicographically on (left, right).
    Stops early when no pair reaches `min_count`."""
    spark = docs.sparkSession
    wf = word_frequencies(docs, text_col)
    vocab = wf.select(
        "freq",
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.col("word").substr(i, F.lit(1)),
        ).alias("syms"),
    ).localCheckpoint(eager=True)
    last_ckpt = vocab

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pairs = (
            vocab.filter(F.size("syms") >= 2)
            .select(
                "freq",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at(F.col("syms"), i).alias("l"),
                            F.element_at(F.col("syms"), i + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not top or top[0]["cnt"] < min_count:
            break
        left, right, cnt = top[0]["l"], top[0]["r"], int(top[0]["cnt"])
        merges.append((rank, left, right, cnt))
        nxt = vocab.select("freq", _merge_step(F.col("syms"), left, right).alias("syms"))
        # Truncate lineage every 4 merges, not every merge: a chain of
        # ≤4 fold projections is a small plan (analysis stays linear),
        # while an eager materialization per merge pays a full job +
        # block-manager write each iteration. The un-checkpointed tail
        # merges are recomputed at most once by the next pair-count.
        if (rank + 1) % 4 == 0:
            nxt = nxt.localCheckpoint(eager=True)
            last_ckpt.unpersist()
            last_ckpt = nxt
        vocab = nxt
    last_ckpt.unpersist()
    return spark.createDataFrame(
        merges, schema="rank bigint, left string, right string, pair_count bigint"
    )


@query("bpe_train_merges")  # rows-only: iterative argmax loop, not ANSI-SQL
def q_bpe_train_merges(spark, sf_dir):
    """Train 16 BPE merges on the documents corpus. Correctness is
    pinned by `tests/test_llm.py::test_bpe_matches_reference`, which
    replays the identical algorithm in pure Python on the same corpus
    and asserts the full (rank, left, right, pair_count) table."""
    docs = load_table(spark, sf_dir, "documents")
    return train_bpe_merges(docs, n_merges=16, min_count=2)
