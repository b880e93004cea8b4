"""Scalar-function layer: Spark Column expressions (JVM-side, codegen'd).

Maps the reference's per-row Python string/hash helpers (SURVEY.md §2.7) onto
built-in ``pyspark.sql.functions`` so the hot path never leaves the JVM.
"""
