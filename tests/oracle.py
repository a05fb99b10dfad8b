"""Local mirror of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet tables, then
compare row count, schema arity, and order-insensitive values (columns
sorted by name, rows sorted by their full tuple, values normalized).
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb
import pandas as pd


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, Decimal):
        return round(float(v), 9)
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "ndim") and getattr(v, "ndim", 0) > 0:  # numpy arrays
        return tuple(_norm_cell(x) for x in v.tolist())
    if hasattr(v, "item"):  # numpy scalars
        return _norm_cell(v.item())
    return v


def normalize(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in row))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str) -> list[str]:
    """Return list of mismatch descriptions (empty = pass)."""
    errs: list[str] = []
    sp = spark_df.toPandas()
    rel = con.execute(sql)
    # The driver hashes typed values: DuckDB HUGEINT (bare integer SUM) never
    # hash-matches a Spark BIGINT even when every value is equal. Flag it here
    # so the fix (CAST(... AS BIGINT) in the oracle string) happens locally.
    try:
        typed = con.sql(sql)
        for cname, ctype in zip(typed.columns, typed.types):
            if "HUGEINT" in str(ctype).upper():
                errs.append(
                    f"{name}: oracle column {cname} is {ctype} — CAST it "
                    "(driver value-hash will mismatch Spark BIGINT)"
                )
    except Exception:
        pass
    du = rel.fetchdf()
    if len(sp) != len(du):
        errs.append(f"{name}: row count spark={len(sp)} duckdb={len(du)}")
    s_cols, d_cols = sorted(sp.columns), sorted(du.columns)
    if s_cols != d_cols:
        errs.append(f"{name}: columns spark={s_cols} duckdb={d_cols}")
        return errs
    ns, nd = normalize(sp), normalize(du)
    if ns != nd:
        diff_idx = [i for i, (a, b) in enumerate(zip(ns, nd)) if a != b][:3]
        for i in diff_idx:
            errs.append(f"{name}: row {i} spark={ns[i]} duckdb={nd[i]}")
        if not diff_idx:
            errs.append(f"{name}: value mismatch (row sets differ)")
    return errs
