"""The reference's user-programming surface, re-expressed on Spark.

The reference's entire query API is two user functions
(``mp/worker.go:14-17``):

  MapperInterface: one input file -> R partitioned intermediate files
  ReduceInterface: all shards of one partition -> final output

Spark-first equivalents (SURVEY.md §2.9 U1-U3):

- ``map_partitions``   = MapperInterface minus the hand-rolled
  partitioning/IO: the user writes "iterator of pandas batches in,
  iterator of batches out"; Spark owns splits, shuffle, and fault
  tolerance.  Arrow-vectorized via ``mapInPandas``.
- ``group_reduce``     = ReduceInterface: the user sees one FULL group
  as a pandas DataFrame (exactly "all shards of partition Cur merged",
  ``test.go:53-65``) via ``applyInPandas``.
- ``grouped_agg_udaf`` = the UDAF surface the reference lacks (U7):
  a pandas Series -> scalar aggregate usable inside ``agg``.

These are the *escape hatch* — the engine's guidance (and the rest of
this codebase) prefers built-in columnar expressions, which are
10-100x faster.  The word-count pair below exists as the parity demo
proving the surface can express the reference's flagship job.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DataType


def map_partitions(
    df: DataFrame,
    fn: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]],
    schema: DataType | str,
) -> DataFrame:
    """Mapper surface (U1): per-partition batch transform, Arrow-backed."""
    return df.mapInPandas(fn, schema=schema)


def group_reduce(
    df: DataFrame,
    keys: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    schema: DataType | str,
) -> DataFrame:
    """Reducer surface (U2): ``fn`` receives one complete group as a
    pandas DataFrame — the exact contract of ``TestReduce``
    (``test.go:44-71``) with shuffle/merge handled by Spark.

    HIGH-CARDINALITY WARNING: ``applyInPandas`` materializes one pandas
    DataFrame per key — at millions of keys that is millions of tiny
    Arrow batches and the per-group Python dispatch dominates.  Reach
    for this surface only when the reduction genuinely needs the whole
    group as a table (sequential recurrences like ``packing.pack_greedy``,
    cross-row logic).  For per-group SCALAR reduction use
    :func:`grouped_agg_udaf` (measured in
    ``tests/test_udf_surface.py::test_grouped_agg_udaf_vs_group_reduce_high_cardinality``:
    ~3x faster at 50k single-digit-row groups, and the gap widens with
    key count); for anything expressible in ``pyspark.sql.functions``
    use the built-ins (~10-100x, see ``udf_wordcount``)."""
    return df.groupBy(*keys).applyInPandas(fn, schema=schema)


# ---------------------------------------------------------------------------
# parity demo: the reference's word count on the UDF surface (U5)
# ---------------------------------------------------------------------------


def _wc_map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Mapper UDF: lines -> (token, partial count) per batch.

    Mirrors ``TestMap`` (``test.go:13-42``): tokenize + local
    pre-aggregation (the map-side combine at ``test.go:22-25``).
    """
    for pdf in batches:
        toks = pdf["text"].str.split(" ").explode()
        counts = toks.value_counts()
        yield pd.DataFrame({"token": counts.index.astype(str), "cnt": counts.to_numpy()})


def _wc_reduce(pdf: pd.DataFrame) -> pd.DataFrame:
    """Reducer UDF: merge partial counts of one token group
    (``TestReduce``, ``test.go:51-65``)."""
    return pd.DataFrame({"token": [pdf["token"].iloc[0]], "cnt": [int(pdf["cnt"].sum())]})


def udf_wordcount(docs: DataFrame) -> DataFrame:
    """Word count expressed purely through the user-function surface:
    map_partitions (partial counts) -> shuffle -> group_reduce (merge).

    Same result as ``operators.wordcount.word_count``; exists to prove
    U1/U2 parity.  ~10x slower than the columnar plan — documented, and
    exactly why the engine treats UDFs as the slow path.
    """
    partial = map_partitions(
        docs.select("text"), _wc_map, "token string, cnt long"
    )
    return group_reduce(partial, ["token"], _wc_reduce, "token string, cnt long")


def grouped_agg_udaf(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    fn: Callable[[pd.Series], float],
    alias: str = "udaf_value",
) -> DataFrame:
    """UDAF surface (U7): pandas Series -> scalar, map-side combinable by
    Spark only per-group (Arrow grouped-agg pandas UDF)."""

    # pandas_udf picks SCALAR vs GROUPED_AGG from the callable's type
    # hints; the annotated adapter pins GROUPED_AGG so un-annotated
    # callables (lambdas) work too
    def _agg(s: pd.Series) -> float:
        return fn(s)

    udaf = F.pandas_udf(_agg, "double")
    return df.groupBy(*keys).agg(udaf(F.col(value_col)).alias(alias))


def udtf_chunk_documents(
    spark,
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 8,
    eager_cleanup: bool = False,
) -> DataFrame:
    """U7's table-function half through the MODERN surface: a real
    Python UDTF (Spark 4 ``@udtf``) applied with a SQL LATERAL join —
    one input document expands to N chunk rows inside the engine's
    UDTF evaluation, not via explode.  Output contract is IDENTICAL to
    ``text_analysis.chunk_documents`` (same recurrence, same edge
    cases: null text chunks as one empty 1-token chunk, the last chunk
    keeps the remainder), so the columnar operator's DuckDB oracle
    verifies this UDTF value-exactly.

    Use the columnar ``chunk_documents`` in production — it stays in
    whole-stage codegen; this is the parity/API-surface demo (the
    reference's UDF story, ``mp/worker.go:14-17``, extended to
    table-valued functions).  Still Arrow-batched, still a narrow
    per-row expansion: zero shuffles at any scale.
    """
    import math

    from pyspark.sql.functions import udtf

    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"udtf_chunk_documents: need 0 <= overlap < chunk_tokens, "
            f"got overlap={overlap} chunk_tokens={chunk_tokens}"
        )
    stride = chunk_tokens - overlap

    @udtf(returnType="chunk_idx: bigint, chunk_text: string, n_tokens: bigint")
    class ChunkDoc:
        def eval(self, text: str):  # noqa: ANN202 - UDTF eval signature
            toks = (text if text is not None else "").split(" ")
            n = len(toks)
            n_chunks = 1 + max(0, math.ceil((n - chunk_tokens) / stride))
            for i in range(n_chunks):
                s = i * stride
                yield (
                    i,
                    " ".join(toks[s : s + chunk_tokens]),
                    min(chunk_tokens, n - s),
                )

    # unique view/function names per call: a fixed name would let two
    # interleaved lazy plans clobber each other's input view, silently
    # chunking the wrong DataFrame when the earlier plan finally
    # executes (ADVICE r4).  uuid4, not a module counter — an
    # unsynchronized counter can collide across driver threads.  In
    # the default lazy mode the registrations accumulate for the
    # session lifetime (a lazy plan may execute arbitrarily late, so
    # they cannot be dropped here); a long-lived session making heavy
    # call volume should pass ``eager_cleanup=True``, which
    # materializes the result (localCheckpoint) and drops both
    # registrations before returning (ADVICE r5).
    import uuid

    suffix = uuid.uuid4().hex[:12]
    fn_name = f"chunk_doc_udtf_{suffix}"
    view_name = f"__udtf_docs_{suffix}"
    spark.udtf.register(fn_name, ChunkDoc)
    docs.createOrReplaceTempView(view_name)
    out = spark.sql(
        f"SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens "
        f"FROM {view_name} d, LATERAL {fn_name}(d.text) c"
    )
    if eager_cleanup:
        # eager materialization detaches the result from the view/UDTF
        # lineage, so both registrations can be dropped immediately —
        # catalog state stays O(1) per call instead of growing forever
        out = out.localCheckpoint(eager=True)
        spark.catalog.dropTempView(view_name)
        spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {fn_name}")
    return out
