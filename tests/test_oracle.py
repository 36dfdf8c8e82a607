"""Oracle-differential tests — the local twin of the driver's t2 gate.

Runs every queries()[name] on Spark and the matching oracle_sql()[name]
on DuckDB at sf0.001, then compares row count, column names, and values
(order-insensitive, exact after the contract's explicit rounding).
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from kommunedata_data_pipeline_spark.schemas import STAR_TABLES

SF_SMALL = "/root/testdata/sf0.001"

QUERY_NAMES = sorted(entrymod.queries().keys())
ORACLES = entrymod.oracle_sql()


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in STAR_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v):
    """Dtype-preserving canonical form. The driver's value-hash treats an
    int64 3 and a float64 3.0 as DIFFERENT (the r1 q_pivot_event_types /
    q_sessionize failures were DuckDB HUGEINT→float64 vs Spark bigint);
    Python's `3 == 3.0` would mask that, so numerics carry a type tag."""
    if v is None:
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return ("f", "NaN")
        return ("f", f)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime().replace(tzinfo=None)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, np.ndarray):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, (list, tuple)):
        return tuple(_canon_cell(x) for x in v)
    return v


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = [tuple(_canon_cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r))


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_SMALL)
    spark_pd = sdf.toPandas()
    if name not in ORACLES:
        # rows-only check (non-SQL-expressible op)
        assert spark_pd is not None
        return
    con = _duck(SF_SMALL)
    duck_pd = con.execute(ORACLES[name]).df()
    assert sorted(spark_pd.columns) == sorted(duck_pd.columns), (
        f"{name}: columns differ: {sorted(spark_pd.columns)} vs {sorted(duck_pd.columns)}"
    )
    assert len(spark_pd) == len(duck_pd), (
        f"{name}: row counts differ: spark={len(spark_pd)} duckdb={len(duck_pd)}"
    )
    s_rows = _canon(spark_pd)
    d_rows = _canon(duck_pd)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches: {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
