"""MapReduceJob facade: the reference driver program (main.go) ported
user-for-user, validated against source/*.dat-shaped input."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mapreduceimpl_spark.operators.mapreduce_api import MapReduceJob


def _write_inputs(tmp_path):
    """Recreate the reference's fixture shape: 3 files, one short
    token per line, small alphabet with duplication (source/1-3.dat)."""
    contents = {
        "1.dat": ["a", "b", "c", "d", "e"],
        "2.dat": ["a", "b", "c", "d", "e"],
        "3.dat": ["a", "b", "c", "d", "e", "a"],
    }
    paths = []
    for name, lines in contents.items():
        p = tmp_path / name
        p.write_text("\n".join(lines) + "\n")
        paths.append(str(p))
    return paths


def test_wordcount_job_end_to_end(spark, tmp_path):
    """Default job == the reference's word count: same totals, R output
    files (main.go: M=3 inputs, R=2)."""
    paths = _write_inputs(tmp_path)
    out_dir = str(tmp_path / "output")
    job = MapReduceJob(spark, r=2).add_tasks(paths)
    files = job.run(out_dir)
    assert len(files) == 2

    parsed = (
        spark.read.text(out_dir)
        .select(F.split("value", " ").alias("kv"))
        .select(F.col("kv").getItem(0).alias("k"), F.col("kv").getItem(1).cast("long").alias("v"))
    )
    got = {r["k"]: r["v"] for r in parsed.collect()}
    assert got == {"a": 4, "b": 3, "c": 3, "d": 3, "e": 3}


def test_add_tasks_dedupes(spark, tmp_path):
    """Duplicate registration is ignored (mp/master.go:212-215)."""
    paths = _write_inputs(tmp_path)
    job = MapReduceJob(spark).add_tasks(paths).add_tasks(paths)
    assert job._paths == paths
    counts = {r["key"]: r["value"] for r in job.dataframe().collect()}
    assert counts["a"] == 4  # not 8


def test_custom_mapper_reducer(spark, tmp_path):
    """User-supplied UDF pair: line length histogram."""
    paths = _write_inputs(tmp_path)

    def mapper(batches):
        for pdf in batches:
            lens = pdf["value"].str.len().value_counts()
            yield pd.DataFrame({"key": lens.index.astype(str), "value": lens.to_numpy()})

    def reducer(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"key": [pdf["key"].iloc[0]], "value": [int(pdf["value"].sum())]})

    job = (
        MapReduceJob(spark, r=3)
        .add_tasks(paths)
        .with_mapper(mapper)
        .with_reducer(reducer)
    )
    counts = {r["key"]: r["value"] for r in job.dataframe().collect()}
    assert counts == {"1": 16}


def test_run_requires_tasks(spark):
    with pytest.raises(ValueError, match="no input tasks"):
        MapReduceJob(spark).dataframe()
