"""Replicates the driver's DuckDB oracle gate (SURVEY.md §5.2): for every
queries() entry with an oracle, run Spark and DuckDB on the same parquet
and compare row count + column names + order-insensitive value hash.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c


def _canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NaN"
        return repr(round(v, 9))
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _rowset(cols, rows):
    # order-insensitive: sort columns by name, then sort row tuples
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


def _assert_driver_safe_arrow(name, schema):
    """The driver fetches both sides via Arrow and canonicalizes with
    pandas sort_values + value hashing. Two failure classes are invisible
    to a plain fetchall() gate and must be caught here:

    - DECIMAL/HUGEINT oracle columns (e.g. an uncast DuckDB SUM(BIGINT))
      arrive as decimal128 ⇒ Decimal('42') hash-mismatches Spark's 42
      even when values agree (the r2 q36/q41 failure);
    - list/struct columns can't be factorized by pandas sort_values
      (the r2 q33 crash).
    """
    import pyarrow.types as pt

    for field in schema:
        t = field.type
        ok = (
            pt.is_integer(t)
            or pt.is_floating(t)
            or pt.is_string(t)
            or pt.is_large_string(t)
            or pt.is_boolean(t)
            or pt.is_timestamp(t)
            or pt.is_date(t)
        )
        assert ok, (
            f"{name}: column '{field.name}' has driver-unsafe Arrow type {t} "
            f"(decimal ⇒ cast ::BIGINT/::DOUBLE in the oracle SQL; "
            f"list/struct ⇒ digest-project in the Spark query)"
        )


def _assert_driver_safe_spark(name, sdf):
    from pyspark.sql import types as T

    for field in sdf.schema.fields:
        assert not isinstance(
            field.dataType, (T.ArrayType, T.MapType, T.StructType, T.BinaryType)
        ), (
            f"{name}: Spark column '{field.name}' is {field.dataType.simpleString()} — "
            f"the driver's pandas canonicalizer cannot sort/hash it; "
            f"project a scalar digest instead"
        )


ORACLE_NAMES = sorted(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, sf_dir, con, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]

    sdf = q(spark, sf_dir)
    _assert_driver_safe_spark(name, sdf)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    # fetch via Arrow first: this is how the driver sees the oracle, and
    # it surfaces HUGEINT/DECIMAL typing that fetchall() silently folds
    # into Python int (the r2 q36/q41 blind spot)
    duck_tbl = con.execute(sql).arrow()
    _assert_driver_safe_arrow(name, duck_tbl.schema)

    res = con.execute(sql)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    got = _rowset(spark_cols, spark_rows)
    want = _rowset(duck_cols, duck_rows)
    if got != want:
        diffs = [(g, w) for g, w in zip(got, want) if g != w][:3]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_rows_only_queries_run(spark, sf_dir):
    """Queries without oracle must still run and have stable schema."""
    qs = entry_mod.queries()
    for name in sorted(set(qs) - set(entry_mod.oracle_sql())):
        df = qs[name](spark, sf_dir)
        assert df.columns, name
        _assert_driver_safe_spark(name, df)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == ["seq", "url_canon", "host", "priority"]


def test_registry_consistency():
    """Driver-contract invariants: every oracle key names a registered
    query, names are unique q-prefixed slugs, and oracle SQL is
    non-empty DuckDB-parseable text."""
    import duckdb

    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert all(n.startswith("q") and "_" in n for n in qs)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('/root/testdata/sf0.001/{t}.parquet')"
        )
    for name, sql in osql.items():
        con.execute(f"SELECT * FROM ({sql}) LIMIT 0")  # parses + binds
