"""Source registry: formats, schema handling, nanos timestamps, cache."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduceimpl_spark.sources import load_table, read_text_lines
from mapreduceimpl_spark.sources.registry import _TABLE_CACHE, read_csv, read_json


def test_unknown_table_rejected(spark):
    with pytest.raises(KeyError, match="unknown table"):
        load_table(spark, "/root/testdata/sf0.001", "nope")


def test_events_nanos_to_timestamp(spark):
    e = load_table(spark, "/root/testdata/sf0.001", "events")
    assert dict(e.dtypes)["ts"] == "timestamp"
    yr = e.select(F.min(F.year("ts")).alias("y")).collect()[0]["y"]
    assert 2000 <= yr <= 2100


def test_table_cache_hit(spark):
    a = load_table(spark, "/root/testdata/sf0.001", "region")
    b = load_table(spark, "/root/testdata/sf0.001", "region")
    assert a is b
    key = (spark.sparkContext.applicationId, "/root/testdata/sf0.001", "region")
    assert key in _TABLE_CACHE


def test_read_text_lines_multipath(spark, tmp_path):
    p1, p2 = tmp_path / "a.txt", tmp_path / "b.txt"
    p1.write_text("x\ny\n")
    p2.write_text("z\n")
    df = read_text_lines(spark, str(p1), str(p2))
    assert df.columns == ["value"]
    assert df.count() == 3


def test_read_csv_with_schema(spark, tmp_path):
    p = tmp_path / "t.csv"
    p.write_text("id,name\n1,alpha\n2,beta\n")
    df = read_csv(spark, str(p), schema="id long, name string")
    assert df.dtypes == [("id", "bigint"), ("name", "string")]
    assert df.count() == 2


def test_read_json_lines(spark, tmp_path):
    p = tmp_path / "t.jsonl"
    p.write_text('{"id": 1, "v": 2.5}\n{"id": 2, "v": 3.5}\n')
    df = read_json(spark, str(p), schema="id long, v double")
    assert df.agg(F.sum("v")).collect()[0][0] == 6.0


def test_orc_roundtrip(spark, tmp_path):
    """ORC sink + scan (SURVEY S7 columnar formats beyond parquet)."""
    src = load_table(spark, "/root/testdata/sf0.001", "nation")
    out = str(tmp_path / "nation_orc")
    src.write.format("orc").mode("overwrite").save(out)
    back = spark.read.orc(out)
    assert back.count() == src.count()
    assert set(back.columns) == set(src.columns)
    assert back.exceptAll(src).count() == 0


def test_register_views_sql_surface(spark):
    """register_views + spark.sql: the engine's SQL entry point."""
    from mapreduceimpl_spark.sources import register_views

    register_views(spark, "/root/testdata/sf0.001")
    got = spark.sql(
        """
        SELECT n_name, COUNT(*) AS n_cust
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_cust DESC, n_name LIMIT 3
        """
    ).collect()
    assert len(got) == 3
    assert got[0]["n_cust"] >= got[1]["n_cust"] >= got[2]["n_cust"]


def test_variant_json_path_matches_string_path(spark, tables):
    """Spark 4 VARIANT ingestion (parse_json -> variant_get) extracts
    the same values as the string-path get_json_object route used by
    the json_extract catalog entry — the semi-structured column type a
    modern lakehouse table would store props as (parse once, binary
    encoding, typed access), verified against the classic path."""
    from pyspark.sql import functions as F

    e = tables["events"].select("event_id", "props")
    via_variant = e.select(
        "event_id",
        F.variant_get(F.parse_json("props"), "$.k", "bigint").alias("k"),
    )
    via_string = e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    a = sorted(map(tuple, via_variant.collect()))
    b = sorted(map(tuple, via_string.collect()))
    assert a == b and len(a) > 0
    assert all(k is not None for _, k in a)


def test_variant_tolerates_malformed_json(spark):
    """try_parse_json returns NULL on garbage instead of failing the
    task — the permissive-ingest posture a 100 TB raw feed needs."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, '{"k": 5}'), (2, "not json"), (3, None)], ["id", "props"]
    )
    out = {
        r["id"]: r["k"]
        for r in df.select(
            "id",
            F.variant_get(F.try_parse_json("props"), "$.k", "bigint").alias("k"),
        ).collect()
    }
    assert out == {1: 5, 2: None, 3: None}
