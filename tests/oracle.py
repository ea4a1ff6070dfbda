"""Local replica of the driver's correctness gate: run a registry query on
Spark and its DuckDB oracle side-by-side, canonicalize, and diff exactly.

Canonicalization: sort columns by name, sort rows, normalize timestamps to
µs-precision naive datetimes, compare floats exactly (the driver hashes
values — rounding must already have happened inside the queries).
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb

from aetherium_trader_datapipeline_spark.tables import TABLE_NAMES


def duckdb_run(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def spark_run(df):
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    return cols, rows


def _norm(v):
    if isinstance(v, datetime):
        return v.replace(microsecond=v.microsecond, tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact repr — mirrors a value-hash; queries must pre-round
        return repr(v)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    try:  # Decimal → exact string
        import decimal

        if isinstance(v, decimal.Decimal):
            return str(v.normalize())
    except ImportError:
        pass
    return v


def canonical(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def compare(spark_df, oracle_sql_text: str, sf_dir: str, key: str = "") -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass)."""
    problems = []
    s_cols, s_rows = spark_run(spark_df)
    d_cols, d_rows = duckdb_run(oracle_sql_text, sf_dir)
    sc, sr = canonical(s_cols, s_rows)
    dc, dr = canonical(d_cols, d_rows)
    if sc != dc:
        problems.append(f"{key}: column mismatch spark={sc} duckdb={dc}")
        return problems
    if len(sr) != len(dr):
        problems.append(f"{key}: row count spark={len(sr)} duckdb={len(dr)}")
    limit_shown = 0
    for i, (a, b) in enumerate(zip(sr, dr)):
        if a != b:
            problems.append(f"{key}: row {i} spark={a} duckdb={b}")
            limit_shown += 1
            if limit_shown >= 5:
                break
    return problems
