"""S6/K7 — recursive content scan + the fix-imports rewrite pipeline.

Reference: walk directories reading source files (solidity-naive-checksum.py
:17-29, find-duplicates.py:7-18), build a basename index of sibling files
(fix-imports-solidity.py:68, stripping the ``NN_NN_`` sequence prefix :31),
rewrite each import line whose basename resolves, falling back to a
node_modules path (:27-33), and write the file back only when changed
(:50-58).

Spark-first: ``spark.read.format("binaryFile")`` is the distributed dir walk
(S6); the line rewrite is posexplode -> regexp_extract (F6) -> broadcast
index join (J4) -> reassemble with an ordered array_join; the relative-path
computation (F12) is the one genuinely non-SQL string op — a vectorized
pandas UDF. The write-back is ``SnapshotTable.overwrite`` (K7), not an
in-place file mutation.
"""

from __future__ import annotations

import posixpath

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions.text import import_basename, strip_seq_prefix

FILES_DDL = "path string, length long, text string"


def scan_files(spark: SparkSession, path_glob: str) -> DataFrame:
    """S6 — distributed recursive content scan. binaryFile pushes a
    PathGlobFilter into the file index; content arrives as one binary column
    (no driver-side os.walk)."""
    raw = spark.read.format("binaryFile").load(path_glob)
    return raw.select(
        "path",
        "length",
        F.decode(F.col("content"), "UTF-8").alias("text"),
    )


def _relpath_series(path: pd.Series, start: pd.Series) -> pd.Series:
    return pd.Series(
        [
            posixpath.relpath(p, s) if p is not None and s is not None else None
            for p, s in zip(path, start)
        ]
    )


def relpath_udf(path, start):
    """F12 — os.path.relpath as a vectorized pandas UDF (pure string math;
    no filesystem access — fix-imports-solidity.py:23-24). Wrapped lazily so
    importing this module needs no active SparkSession."""
    from pyspark.sql.types import StringType

    return pandas_udf(_relpath_series, StringType())(path, start)


def build_file_index(files: DataFrame) -> DataFrame:
    """J4's lookup side: basename (sequence prefix stripped) -> file path.
    One row per basename — ties broken by min path for determinism."""
    base = strip_seq_prefix(F.element_at(F.split(F.col("path"), "/"), -1))
    return (
        files.select(base.alias("basename"), F.col("path"))
        .groupBy("basename")
        .agg(F.min("path").alias("idx_path"))
    )


def fix_imports(files: DataFrame, node_modules: str = "node_modules") -> DataFrame:
    """The full rewrite pipeline. Returns (path, text, new_text, changed).

    Each line either passes through untouched or — when it is an import whose
    basename resolves in the sibling-file index — is rewritten to a relative
    import of the indexed path; unresolved imports fall back to the
    node_modules prefix (fix-imports-solidity.py:27-33).
    """
    idx = build_file_index(files)
    dirname = F.regexp_replace(F.col("path"), r"/[^/]+$", "")
    lines = files.select(
        "path",
        "text",
        dirname.alias("dir"),
        F.posexplode(F.split(F.col("text"), "\n", -1)).alias("pos", "line"),
    ).withColumn("basename", import_basename(F.col("line")))
    joined = lines.join(F.broadcast(idx), "basename", "left")
    rewritten = F.when(
        F.col("basename") == "",  # not an import line
        F.col("line"),
    ).when(
        F.col("idx_path").isNotNull(),
        F.concat(F.lit('import "'), relpath_udf(F.col("idx_path"), F.col("dir")), F.lit('";')),
    ).otherwise(
        F.concat(F.lit(f'import "{node_modules}/'), F.col("basename"), F.lit('";'))
    )
    reassembled = (
        joined.withColumn("new_line", rewritten)
        .groupBy("path", "text")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "new_line"))),
                    lambda s: s["new_line"],
                ),
                "\n",
            ).alias("new_text")
        )
    )
    return reassembled.withColumn("changed", F.col("new_text") != F.col("text"))
