"""Cross-engine comparison helpers (Spark result vs DuckDB oracle).

Mirrors the driver's correctness gate: row count + sorted column names +
order-insensitive multiset of canonicalized row values.  Exact equality
here implies any reasonable value-hash matches.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb

from lambda_arc_events_filter_spark.catalog import TABLES, table_path


def canon(v):
    """Canonicalize a value for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v


def rowset(cols: list[str], rows: list[tuple]) -> dict[tuple, int]:
    """Multiset of rows with columns re-ordered by sorted column name."""
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out: dict[tuple, int] = {}
    for r in rows:
        key = tuple(canon(r[i]) for i in idx)
        out[key] = out.get(key, 0) + 1
    return out


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """DuckDB connection with the ten fixture views registered, as the
    driver registers them."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def compare_frames(
    scols: list[str], srows: list[tuple], dcols: list[str], drows: list[tuple]
) -> list[str]:
    """Return a list of mismatch descriptions (empty = equal)."""
    problems: list[str] = []
    if sorted(scols) != sorted(dcols):
        problems.append(f"cols spark={sorted(scols)} duck={sorted(dcols)}")
    if len(srows) != len(drows):
        problems.append(f"rowcount spark={len(srows)} duck={len(drows)}")
    if not problems:
        sset = rowset(scols, srows)
        dset = rowset(dcols, drows)
        if sset != dset:
            only_s = [k for k in sset if sset[k] != dset.get(k, 0)][:3]
            only_d = [k for k in dset if dset[k] != sset.get(k, 0)][:3]
            problems.append(f"values; spark-only={only_s} duck-only={only_d}")
    return problems


def check_query(spec, spark, con, sf_dir: str) -> list[str]:
    """Run one QuerySpec on both engines; return mismatch list (empty=pass).

    For oracle-less specs, just runs the Spark side (errors propagate) and
    returns [].
    """
    sdf = spec.fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        return []
    ddf = con.sql(spec.oracle)
    dcols = list(ddf.columns)
    drows = ddf.fetchall()
    return compare_frames(scols, srows, dcols, drows)
