"""Training-data pipeline primitives: deterministic splits, per-group
caps, and token-window chunking over the documents table.

These are the corpus-engineering steps between "deduped documents" and
"training batches"; all three are single-pass, shuffle-minimal, and
cross-engine deterministic:

- **split_assign**: hash-based train/valid/test assignment. The split is a
  pure function of the stable document id (md5 — portable, so the DuckDB
  oracle reproduces it bit-for-bit), NOT rand(): re-running the pipeline,
  adding machines, or retrying tasks can never move a document across
  splits (leakage-by-nondeterminism is the classic eval bug). Map-only —
  no shuffle at all.
- **cap_per_group**: bound each group's row count (language/source
  rebalancing). row_number over (group, deterministic order) keeps the
  FIRST ``cap`` docs per group — one shuffle on the group key; at scale the
  window is per-group-partial thanks to WindowGroupLimit pushdown (rank
  filter recognized by Catalyst).
- **chunk_documents**: explode each document into fixed-size token windows
  with overlap (sequence packing for context-length training). Pure
  integer window math + ``posexplode(sequence(...))`` — the output row
  count is exactly ``ceil((n_tokens - overlap) / stride)`` per doc and
  every boundary is integer-derived, so the oracle matches value-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

SPLITS = ("train", "valid", "test")


def split_bucket(id_col: str = "doc_id", buckets: int = 100) -> Column:
    """Deterministic [0, buckets) bucket from md5 of the id — the first 8
    hex chars as an integer, mod buckets. Portable to any engine."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        % buckets
    )


def split_assign(
    docs: DataFrame,
    train_pct: int = 80,
    valid_pct: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """-> input + ``split`` column ('train'/'valid'/'test'); map-only."""
    b = split_bucket(id_col)
    return docs.withColumn(
        "split",
        F.when(b < train_pct, SPLITS[0])
        .when(b < train_pct + valid_pct, SPLITS[1])
        .otherwise(SPLITS[2]),
    )


def cap_per_group(
    docs: DataFrame,
    group_col: str = "lang",
    cap: int = 50,
    order_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, by ascending ``order_col``
    (deterministic — never rand()-sampled, so reruns agree)."""
    w = Window.partitionBy(group_col).orderBy(F.asc(order_col))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= cap)
        .drop("rn")
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Explode docs into overlapping token windows.

    -> (doc_id, chunk_id, start_tok, n_chunk_tokens, chunk_text). Windows
    start every ``chunk_tokens - overlap`` tokens; the last window is
    short rather than padded. Token = single-space split (the corpus
    convention shared with operators/text.py).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(f"need 0 <= overlap < chunk_tokens, got {overlap}")
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # number of windows covering [0, n) with the given stride: at least 1,
    # then one per full stride past the first chunk
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)).cast("int") + 1,
    )
    c = docs.select(
        "doc_id",
        toks.alias("toks"),
        n.alias("n_toks"),
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id", "_i"),
    )
    start = F.col("chunk_id") * stride
    return c.select(
        "doc_id",
        F.col("chunk_id").cast("int").alias("chunk_id"),
        start.cast("int").alias("start_tok"),
        F.least(F.lit(chunk_tokens), F.col("n_toks") - start)
        .cast("int")
        .alias("n_chunk_tokens"),
        F.concat_ws(
            " ", F.slice("toks", start + 1, F.lit(chunk_tokens))
        ).alias("chunk_text"),
    )
