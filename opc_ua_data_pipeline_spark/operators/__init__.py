"""Operator inventory (SURVEY.md §2), one module per operator family.

Every module exposes:

* builder functions returning DataFrames (Spark-first, declarative), and
* ``QUERIES`` — ``{name: callable(spark, sf_dir) -> DataFrame}``, and
* ``ORACLES`` — ``{name: ANSI-SQL string for DuckDB}``,

which ``__spark_entry__.py`` merges into the driver contract.
"""
