"""Shared pytest fixtures: one local SparkSession per test run.

Mirrors the reference's test strategy (SURVEY.md §5): small local
session, golden-column fixtures, collect-and-compare assertions.
"""

from __future__ import annotations

import datetime as dt
import tempfile

import pytest

from sf_datalake_spark.session import get_spark_session


@pytest.fixture(scope="session")
def spark():
    s = get_spark_session(
        "tests", master="local[2]", shuffle_partitions=4,
        extra_conf={
            "spark.sql.debug.maxToStringFields": "2000",
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="spark-warehouse-"),
        },
    )
    yield s


def d(s: str) -> dt.date:
    return dt.date.fromisoformat(s)


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def panel(spark):
    """Two-entity monthly panel with a missing month for entity 'b'
    (exercises calendar-aware vs row-based window semantics), unicode
    column names like the reference's (siren, période)."""
    rows = [
        ("a", d("2023-01-01"), 10.0),
        ("a", d("2023-02-01"), 20.0),
        ("a", d("2023-03-01"), 30.0),
        ("a", d("2023-04-01"), 40.0),
        ("b", d("2023-01-01"), 100.0),
        # 2023-02 missing for b
        ("b", d("2023-03-01"), 300.0),
        ("b", d("2023-04-01"), 400.0),
    ]
    return spark.createDataFrame(rows, "siren string, `période` date, ca double")
