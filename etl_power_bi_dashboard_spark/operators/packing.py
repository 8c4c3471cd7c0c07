"""Training-sequence packing operators (SURVEY §7.4 extensions; no
counterpart in the reference — this is the step between a filtered corpus
and a pretraining dataloader).

Two packing disciplines, matching the two in common use:

- :func:`pack_concat_chunk` — GPT-style concatenate-then-chunk: documents
  are concatenated in a deterministic content-hash order and the stream is
  cut into fixed ``ctx_len``-token sequences; documents may straddle a
  boundary. Pure window arithmetic (cumulative sums), fully
  oracle-checkable in SQL.
- :func:`pack_greedy` — first-fit bin packing that never splits a
  document: within each bucket, documents are taken in hash order and
  each goes into the lowest-numbered bin that still has room, opening a
  new bin only when none fits. Inherently sequential per bucket (bin
  state carries across rows), so it runs as an Arrow-batched
  ``applyInPandas`` over buckets.

Scale design: both operators first salt documents into ``n_buckets``
content-hash buckets and pack WITHIN a bucket, so the window sort /
grouped map is per-bucket across the cluster — no global ORDER BY, no
single-task stage. Bucket count is the parallelism knob: at 100 TB you
size it so one bucket's token stream fits an executor's sort budget
(e.g. 2^14 buckets ≈ 6 GB/bucket). Sequence ids are (bucket, seq_no)
pairs, so numbering needs no cross-bucket coordination; determinism
comes from the content-hash order, not from partition layout.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import token_count


def _bucket(text: Column, n_buckets: int) -> Column:
    """Content-hash bucket (md5-prefix, engine-portable like p8's split)."""
    return (
        F.conv(F.substring(F.md5(text), 1, 4), 16, 10).cast("int") % n_buckets
    )


def pack_concat_chunk(
    docs: DataFrame, ctx_len: int = 512, n_buckets: int = 8
) -> DataFrame:
    """Concatenate-then-chunk packing plan.

    Within each content-hash bucket, documents are ordered by
    (md5(text), doc_id) and laid end-to-end; the resulting token stream is
    chunked into ``ctx_len``-token sequences. Each document reports the
    sequence its first token lands in (``seq_no``) and its starting
    ``seq_offset`` inside that sequence.

    One shuffle (the per-bucket window sort); cumulative sums AND the
    chunk assignment (``start DIV ctx_len`` — integer division, not
    FLOOR over an IEEE divide) are exact integer arithmetic, so the
    layout is bit-identical on any engine at any stream length (a double
    divide would lose exactness once a bucket's cumulative token count
    passed 2^53). NULL-text documents are dropped up front — they have
    no tokens to lay out, and a NULL hash/count would otherwise poison
    the bucket key and the cumulative sums.
    """
    w = Window.partitionBy("bucket").orderBy("h", "doc_id")
    laid = (
        docs.filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            token_count(F.col("text")).cast("bigint").alias("n_tokens"),
            F.md5(F.col("text")).alias("h"),
            _bucket(F.col("text"), n_buckets).alias("bucket"),
        )
        .withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn("start", F.col("cum") - F.col("n_tokens"))
    )
    return laid.select(
        "doc_id",
        "bucket",
        "n_tokens",
        F.expr(f"start DIV {int(ctx_len)}").cast("int").alias("seq_no"),
        (F.col("start") % ctx_len).cast("int").alias("seq_offset"),
    )


def pack_greedy(
    docs: DataFrame, ctx_len: int = 512, n_buckets: int = 8
) -> DataFrame:
    """First-fit greedy packing (documents never split across sequences).

    Within each bucket, documents are visited in (md5(text), doc_id)
    order; each joins the lowest-numbered bin whose fill + n_tokens still
    fits ``ctx_len`` (earlier bins remain candidates — true first-fit,
    not next-fit), opening a new bin only when no bin has room. Documents
    longer than ``ctx_len`` get a bin of their own (the caller decides
    whether to truncate or drop them).

    Bin state is sequential per bucket, so the packer is a grouped-map
    pandas pass over buckets (Arrow-batched, one invocation per bucket) —
    the documented pattern for per-partition imperative logic. Output:
    (doc_id, bucket, n_tokens, bin_no, bin_fill) where bin_fill is the
    bin's running token total after placing the document. NULL-text
    documents are dropped up front (no tokens to pack; a NULL count
    would arrive in pandas as NaN and kill the grouped map).
    """
    prepped = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        F.md5(F.col("text")).alias("h"),
        _bucket(F.col("text"), n_buckets).alias("bucket"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["h", "doc_id"]).reset_index(drop=True)
        # true first-fit: each doc goes into the LOWEST-numbered bin with
        # room (closed bins stay candidates), opening a new bin only when
        # none fits; an oversized doc gets a bin of its own
        open_fills: list[int] = []
        bins, fills = [], []
        for nt in pdf["n_tokens"]:
            nt = int(nt)
            target = None
            for b, f in enumerate(open_fills):
                if f + nt <= ctx_len:
                    target = b
                    break
            if target is None:
                open_fills.append(0)
                target = len(open_fills) - 1
            open_fills[target] += nt
            bins.append(target)
            fills.append(open_fills[target])
        pdf["bin_no"] = bins
        pdf["bin_fill"] = fills
        return pdf[["doc_id", "bucket", "n_tokens", "bin_no", "bin_fill"]]

    return prepped.groupBy("bucket").applyInPandas(
        pack, "doc_id long, bucket int, n_tokens long, bin_no long, bin_fill long"
    )
