"""Drop-in job API mirroring the reference's driver surface.

The reference's user program (``main.go:10-55``) is:

  master = NewMaster(M, R, addr);  master.AddTasks(files)
  workers: NewNode(...).WithMapperFunc(TestMap) / .WithReduceFunc(TestReduce)
  master.StartSchedule()  ->  list of R output files

``MapReduceJob`` keeps that mental model — input file registration
with dedup (``mp/master.go:205-226``), a mapper UDF, a reducer UDF,
R-way partitioned text output (``test.go:46-69``) — while everything
the reference hand-rolls (scheduling, shuffle files, barriers, retries,
worker registry: ``mp/master.go`` entirely) is Spark's runtime.

The M knob (mapper count) intentionally does not exist: input-split
planning replaces file-granularity map tasks, so a 100 TB input gets
thousands of splits instead of one task per file.  R survives as the
output partition count.

UDF contracts (Arrow-vectorized versions of ``mp/worker.go:14-17``):

  mapper(iter of pandas.DataFrame['value']) -> iter of DataFrame['key','value']
  reducer(pandas.DataFrame['key','value'])  -> DataFrame (one full group)

Defaults reproduce the word-count job (``test.go:13-81``).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduceimpl_spark.operators.udf_surface import group_reduce, map_partitions


def _default_mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """TestMap parity (``test.go:13-42``): line -> (line, partial count),
    pre-aggregated per batch (the map-side combine of ``test.go:22-25``)."""
    for pdf in batches:
        counts = pdf["value"].value_counts()
        yield pd.DataFrame({"key": counts.index.astype(str), "value": counts.to_numpy()})


def _default_reducer(pdf: pd.DataFrame) -> pd.DataFrame:
    """TestReduce parity (``test.go:44-71``): merge all partial counts
    of one key."""
    return pd.DataFrame({"key": [pdf["key"].iloc[0]], "value": [int(pdf["value"].sum())]})


class MapReduceJob:
    """Fluent job builder with the reference's API shape."""

    def __init__(self, spark: SparkSession, r: int = 2) -> None:
        self._spark = spark
        self._r = r
        self._paths: list[str] = []
        self._mapper: Callable = _default_mapper
        self._reducer: Callable = _default_reducer
        self._intermediate_schema = "key string, value long"

    def add_tasks(self, paths: list[str]) -> MapReduceJob:
        """Register input files, deduplicated (``mp/master.go:212-215``)."""
        for p in paths:
            if p not in self._paths:
                self._paths.append(p)
        return self

    def with_mapper(
        self, fn: Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]],
        intermediate_schema: str = "key string, value long",
    ) -> MapReduceJob:
        """``WithMapperFunc`` parity (``mp/worker.go:162-165``)."""
        self._mapper = fn
        self._intermediate_schema = intermediate_schema
        return self

    def with_reducer(self, fn: Callable[[pd.DataFrame], pd.DataFrame]) -> MapReduceJob:
        """``WithReduceFunc`` parity (``mp/worker.go:167-170``)."""
        self._reducer = fn
        return self

    def dataframe(self) -> DataFrame:
        """The job as a (lazy) DataFrame: scan -> mapper -> hash shuffle
        on key into R partitions -> reducer.  The repartition is the
        reference's FNV-mod-R shuffle (``test.go:77-81``); the reducer
        sees one complete key group like ``TestReduce``."""
        if not self._paths:
            raise ValueError("no input tasks registered; call add_tasks()")
        lines = self._spark.read.text(self._paths)
        mapped = map_partitions(lines, self._mapper, self._intermediate_schema)
        shuffled = mapped.repartition(self._r, "key")
        return group_reduce(shuffled, ["key"], self._reducer, self._intermediate_schema)

    def run(self, output_dir: str) -> list[str]:
        """Execute and write R text files ``part-*`` (the reference's
        ``output/reduce-<id>-<cur>``, ``test.go:46-69``); returns the
        output file paths like ``getResult`` (``mp/master.go:112-117``)."""
        result = self.dataframe()
        cols = [F.col(c).cast("string") for c in result.columns]
        (
            result.repartition(self._r, "key")
            .select(F.concat_ws(" ", *cols).alias("value"))
            .write.mode("overwrite")
            .text(output_dir)
        )
        # list part files from the filesystem (Hadoop FS API, so any
        # scheme works) — re-reading with input_file_name() would omit
        # EMPTY part files, returning < R paths where the reference
        # always returns R reducer files (mp/master.go:112-117)
        jvm_path = self._spark._jvm.org.apache.hadoop.fs.Path(output_dir)
        fs = jvm_path.getFileSystem(self._spark.sparkContext._jsc.hadoopConfiguration())
        return sorted(
            status.getPath().toString()
            for status in fs.listStatus(jvm_path)
            if status.getPath().getName().startswith("part-")
        )
