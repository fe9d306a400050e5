"""Fixture DataFrames from the seeded simulator (FIXTURES.md §1)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..schemas import OPCUA_DATA_SCHEMA
from .simulator import deviation_scenario_rows, generate_rows


def opcua_fixture(
    spark: SparkSession, n_ticks: int = 3600, seed: int = 42
) -> DataFrame:
    """The bronze opcua_data fixture table with all corner rows."""
    return spark.createDataFrame(generate_rows(n_ticks, seed), OPCUA_DATA_SCHEMA)


def deviation_fixture(spark: SparkSession) -> DataFrame:
    """Target/Actual pair series engineered for the W3 rule matrix."""
    return spark.createDataFrame(deviation_scenario_rows(), OPCUA_DATA_SCHEMA)
