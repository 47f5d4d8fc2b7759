"""Skew helpers + sink layouts."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduceimpl_spark.functions.skew import salted_join, two_phase_agg
from mapreduceimpl_spark.sources.sinks import write_files, write_partitioned


def test_salted_join_equals_plain_join(tables):
    plain = tables["orders"].join(tables["customer"], tables["orders"].o_custkey == tables["customer"].c_custkey)
    salted = salted_join(
        tables["orders"],
        tables["customer"].withColumnRenamed("c_custkey", "o_custkey"),
        "o_custkey",
        n_salts=4,
    )
    assert salted.count() == plain.count()
    a = salted.select("o_orderkey", "c_name")
    b = plain.select("o_orderkey", "c_name")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_salted_left_join_preserves_unmatched(spark):
    left = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], ["k", "v"])
    right = spark.createDataFrame([(1, "r1")], ["k", "r"])
    out = salted_join(left, right, "k", n_salts=3, how="left")
    rows = {r["k"]: r["r"] for r in out.collect()}
    assert rows == {1: "r1", 2: None, 3: None}


def test_salted_join_rejects_outer_modes(spark):
    """right/full outer would emit each unmatched small-side row once
    per salt — the helper must refuse instead of being silently wrong."""
    import pytest

    left = spark.createDataFrame([(1, "x")], ["k", "v"])
    right = spark.createDataFrame([(2, "r")], ["k", "r"])
    for how in ("right", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="unsupported"):
            salted_join(left, right, "k", how=how)


def test_two_phase_agg_matches_direct(tables):
    direct = (
        tables["orders"]
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").alias("mn"),
            F.max("o_totalprice").alias("mx"),
        )
    )
    salted = two_phase_agg(
        tables["orders"],
        ["o_orderstatus"],
        [("count", "o_orderkey", "n"), ("min", "o_totalprice", "mn"), ("max", "o_totalprice", "mx")],
        n_salts=4,
    )
    assert salted.exceptAll(direct).count() == 0
    assert direct.exceptAll(salted).count() == 0


def test_write_partitioned_layout(tables, tmp_path):
    out = str(tmp_path / "orders_by_status")
    write_partitioned(tables["orders"], out, ["o_orderstatus"])
    spark = tables["orders"].sparkSession
    back = spark.read.parquet(out)
    assert back.count() == tables["orders"].count()
    # partition pruning: filter on the partition col reads one dir
    import os

    dirs = [d for d in os.listdir(out) if d.startswith("o_orderstatus=")]
    assert len(dirs) >= 2


def test_write_files_count(tables, tmp_path):
    out = str(tmp_path / "one_file")
    write_files(tables["nation"], out, n_files=1)
    import glob

    assert len(glob.glob(f"{out}/part-*.parquet")) == 1


def test_bucketed_join_skips_shuffle(tables):
    """Two tables bucketed on the join key with equal bucket counts
    join WITHOUT any Exchange — the write-time shuffle is reused by
    every later join (the persistent analogue of the reference's
    hash-partitioned intermediate files, test.go:28-40)."""
    from mapreduceimpl_spark.plans import explain_str
    from mapreduceimpl_spark.sources.sinks import write_bucketed

    spark = tables["orders"].sparkSession
    write_bucketed(
        tables["orders"].select("o_orderkey", "o_custkey", "o_totalprice"),
        "t_orders_bkt",
        ["o_custkey"],
        n_buckets=8,
    )
    write_bucketed(
        tables["customer"].select("c_custkey", "c_name"),
        "t_cust_bkt",
        ["c_custkey"],
        n_buckets=8,
    )
    o = spark.table("t_orders_bkt")
    c = spark.table("t_cust_bkt")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(c, o.o_custkey == c.c_custkey)
        plan = explain_str(joined, "simple")
        assert "SortMergeJoin" in plan, plan
        assert plan.count("Exchange") == 0, plan
        # and the result is still correct
        assert joined.count() == tables["orders"].count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_bkt")
        spark.sql("DROP TABLE IF EXISTS t_cust_bkt")


def test_salted_join_accepts_short_aliases(spark):
    """Spark's 'semi'/'anti' aliases are valid and salt-safe."""
    left = spark.createDataFrame([(1, "x"), (2, "y")], ["k", "v"])
    right = spark.createDataFrame([(1, "r")], ["k", "r"])
    semi = salted_join(left, right, "k", how="semi").collect()
    assert [r["k"] for r in semi] == [1]
    anti = salted_join(left, right, "k", how="anti").collect()
    assert [r["k"] for r in anti] == [2]


def test_write_range_sorted_files_cover_disjoint_key_slices(tables, tmp_path):
    """Each output file must span a narrow slice of l_shipdate so its
    parquet min/max stats make range predicates skip files: a 1-year
    filter over ~6.6 years of data should intersect well under half
    of the 8 range slices (an unclustered write intersects ALL)."""
    import glob

    import pyarrow.parquet as pq

    from mapreduceimpl_spark.sources.sinks import write_range_sorted

    path = str(tmp_path / "li_range")
    write_range_sorted(
        tables["lineitem"], path, range_cols=["l_shipdate"], n_files=8
    )
    files = sorted(glob.glob(path + "/part-*.parquet"))
    assert len(files) >= 6  # range split produced multiple slices

    import datetime as dt

    lo, hi = dt.datetime(1996, 1, 1), dt.datetime(1997, 1, 1)
    spans = []
    for f in files:
        md = pq.read_metadata(f)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "l_shipdate"
            )
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        spans.append((min(mins), max(maxs)))
    overlapping = sum(1 for mn, mx in spans if mx >= lo and mn < hi)
    assert overlapping <= len(files) // 2, spans

    # slices are pairwise non-overlapping (true range clustering)
    spans.sort()
    for (_, prev_max), (next_min, _) in zip(spans, spans[1:]):
        assert prev_max <= next_min, spans

    # and the data round-trips
    got = tables["lineitem"].sparkSession.read.parquet(path)
    assert got.count() == tables["lineitem"].count()


def test_write_zorder_skips_files_on_both_columns(tables, tmp_path):
    """Z-ordering (l_partkey, l_suppkey) must make parquet min/max
    stats selective on BOTH columns: a quartile-range predicate on
    either column intersects a strict minority of the 16 files.  A
    single-column sort gives perfect skipping on its key and NONE on
    the other — that contrast is asserted too."""
    import glob

    import pyarrow.parquet as pq

    from mapreduceimpl_spark.sources.sinks import write_range_sorted, write_zorder

    li = tables["lineitem"]
    path = str(tmp_path / "li_zorder")
    write_zorder(li, path, cols=["l_partkey", "l_suppkey"], n_files=16)
    files = sorted(glob.glob(path + "/part-*.parquet"))
    # range boundaries come from a sampled sketch, so the non-empty
    # slice count wobbles a little run to run
    assert len(files) >= 8

    def spans(files, column):
        out = []
        for f in files:
            md = pq.read_metadata(f)
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                col = next(
                    md.row_group(rg).column(i)
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == column
                )
                mins.append(col.statistics.min)
                maxs.append(col.statistics.max)
            out.append((min(mins), max(maxs)))
        return out

    def hit_fraction(files, column, lo, hi):
        s = spans(files, column)
        return sum(1 for mn, mx in s if mx >= lo and mn <= hi) / len(s)

    # quartile ranges of each key space
    pk_lo, pk_hi = 1, 500        # parts are 1..2000 at sf0.001? use data bounds
    import pyspark.sql.functions as F
    b = li.agg(F.min("l_partkey"), F.max("l_partkey"),
               F.min("l_suppkey"), F.max("l_suppkey")).collect()[0]
    pk_lo, pk_q = b[0], b[0] + (b[1] - b[0]) // 4
    sk_lo, sk_q = b[2], b[2] + (b[3] - b[2]) // 4

    # sampled range boundaries make exact fractions run-dependent;
    # the point is BOTH columns skip a substantial share of files
    # while the single-key layout (below) skips none on the 2nd key
    assert hit_fraction(files, "l_partkey", pk_lo, pk_q) <= 0.7
    assert hit_fraction(files, "l_suppkey", sk_lo, sk_q) <= 0.7

    # contrast: single-key range sort skips nothing on the OTHER key
    path2 = str(tmp_path / "li_pk_sorted")
    write_range_sorted(li, path2, range_cols=["l_partkey"], n_files=16)
    files2 = sorted(glob.glob(path2 + "/part-*.parquet"))
    assert hit_fraction(files2, "l_suppkey", sk_lo, sk_q) > 0.9

    # data round-trips intact
    got = li.sparkSession.read.parquet(path)
    assert got.count() == li.count()


def test_zorder_key_validation_and_clamp(tables):
    import pytest

    from mapreduceimpl_spark.sources.sinks import zorder_key

    with pytest.raises(ValueError):
        zorder_key(tables["lineitem"], ["l_partkey"])
    z, stats = zorder_key(tables["lineitem"], ["l_partkey", "l_suppkey"], bits_per_col=8)
    import pyspark.sql.functions as F
    mx = tables["lineitem"].select(z.alias("z")).agg(F.max("z"), F.min("z")).collect()[0]
    assert 0 <= mx[1] and mx[0] < (1 << 16)  # 8 bits x 2 cols


def test_compact_files_reduces_count_preserves_rows(spark, tmp_path, docs):
    import os

    from mapreduceimpl_spark.sources.sinks import compact_files

    path = str(tmp_path / "fragmented")
    docs.repartition(20).write.parquet(path)
    before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert before == 20
    rows_before = sorted(r["doc_id"] for r in spark.read.parquet(path).collect())

    n_after = compact_files(spark, path, target_files=2)
    assert n_after <= 2
    rows_after = sorted(r["doc_id"] for r in spark.read.parquet(path).collect())
    assert rows_after == rows_before


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """mergeSchema unifies a column added mid-corpus — the schema-drift
    posture a long-lived 100 TB table needs (new columns arrive; old
    files backfill NULL)."""
    from pyspark.sql import functions as F

    base = str(tmp_path / "evolving")
    v1 = spark.range(5).select(F.col("id").alias("doc_id"), F.lit("a").alias("text"))
    v1.write.parquet(base + "/batch=1")
    v2 = spark.range(5, 10).select(
        F.col("id").alias("doc_id"),
        F.lit("b").alias("text"),
        F.lit("en").alias("lang"),
    )
    v2.write.parquet(base + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(merged.columns) == {"doc_id", "text", "lang", "batch"}
    rows = {r["doc_id"]: r["lang"] for r in merged.collect()}
    assert rows[0] is None and rows[7] == "en"
    assert merged.count() == 10


def test_compact_files_rerunnable_after_stale_dirs(spark, tmp_path, docs):
    """Leftover __old / __compacting dirs from a crashed run must not
    block the next run; a missing live dir restores from __old."""
    import os
    import shutil

    from mapreduceimpl_spark.sources.sinks import compact_files

    path = str(tmp_path / "frag2")
    docs.repartition(8).write.parquet(path)
    rows = sorted(r["doc_id"] for r in spark.read.parquet(path).collect())

    # simulate a crash after the swap: stale __old and __compacting
    shutil.copytree(path, path + "__old")
    os.makedirs(path + "__compacting", exist_ok=True)
    assert compact_files(spark, path, target_files=2) <= 2
    assert sorted(r["doc_id"] for r in spark.read.parquet(path).collect()) == rows

    # simulate a crash between the renames: data only under __old
    os.rename(path, path + "__old_tmp")
    shutil.rmtree(path + "__old", ignore_errors=True)
    os.rename(path + "__old_tmp", path + "__old")
    assert compact_files(spark, path, target_files=1) <= 1
    assert sorted(r["doc_id"] for r in spark.read.parquet(path).collect()) == rows


def test_compact_files_rejects_remote_scheme(spark):
    """os.rename cannot address object stores — fail fast with a clear
    error instead of stranding a staging dir (ADVICE r4)."""
    import pytest as _pytest

    from mapreduceimpl_spark.sources.sinks import compact_files

    for path in ("s3a://bucket/table", "hdfs://nn/warehouse/t"):
        with _pytest.raises(ValueError, match="local filesystem"):
            compact_files(spark, path, target_files=2)


def test_compact_files_accepts_file_uri(spark, tmp_path, docs):
    """A file:// URI passes the scheme guard — the os-level atomic-swap
    steps must strip the scheme or they fail mid-rename, stranding the
    staging dir (ADVICE r5)."""
    from mapreduceimpl_spark.sources.sinks import compact_files

    path = str(tmp_path / "compact_uri")
    docs.repartition(6).write.format("parquet").save(path)
    n_after = compact_files(spark, f"file://{path}", target_files=2)
    assert n_after <= 2
    readback = spark.read.parquet(path)
    assert readback.count() == docs.count()
