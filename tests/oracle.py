"""Local replica of the driver's correctness gate: run a registry query on
Spark and its DuckDB oracle side-by-side, canonicalize, and diff exactly.

Canonicalization: sort columns by name, sort rows, normalize timestamps to
µs-precision naive datetimes, compare floats exactly (the driver hashes
values — rounding must already have happened inside the queries).
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime

import duckdb

from aetherium_trader_datapipeline_spark.tables import TABLE_NAMES


def duckdb_run(sql: str, sf_dir: str):
    cols, rows, _ = duckdb_run_typed(sql, sf_dir)
    return cols, rows


def duckdb_run_typed(sql: str, sf_dir: str):
    """Run the oracle and also return DuckDB's logical result types.

    The driver's value hash is TYPE-SENSITIVE: a DuckDB HUGEINT (int128,
    e.g. from SUM over BIGINT) hashes differently from Spark's BIGINT even
    when every value is identical (the x138 r3 failure).  Returning the
    types lets the local gate reject that class of bug before the driver
    sees it."""
    cfg = {}
    ml = os.environ.get("SPARK_GRAFT_DUCKDB_MEMLIMIT")
    if ml:
        # scale sweeps cap the oracle so a heavy query spills to disk
        # instead of stressing the whole host's RAM (the r9 sf1 x46
        # oracle reached 97 GB RSS unbounded)
        cfg["memory_limit"] = ml
    con = duckdb.connect(config=cfg)
    for t in TABLE_NAMES:
        # the driver fixtures are single files; scale replicas written by
        # Spark (scripts/make_scale_fixture.py) are DIRECTORIES of part
        # files — glob those so the same oracle gate runs on both
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    rel = con.sql(sql)
    cols = list(rel.columns)
    types = [str(t) for t in rel.types]
    rows = rel.fetchall()
    con.close()
    return cols, rows, types


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


def _duck_kind(t: str) -> str:
    """Reduce a DuckDB logical type to the driver-hash-relevant KIND.

    Empirically (CORRECTNESS_r03), the driver's value hash tolerates width
    differences within a kind (x139: Spark INT vs DuckDB BIGINT green) but
    fails when the fetched value REPR changes: DuckDB exports HUGEINT as
    float64 (x138's 165-row exact match still hash-failed), and a decimal
    scale or int/float/decimal kind flip changes the canonical string
    ('3' vs '3.0' vs '3.00').

    DECIMAL finals are banned outright (see no_decimal_final_problems):
    CORRECTNESS_r07 proved the driver hashes Decimal finals through a repr
    the local Decimal.normalize() canonicalization erases — all 7 keys in
    the r7 window whose final schema carried a DECIMAL column (x203 x204
    x206 x239 x240 x242 x244) were rows+schema-green but hash-red, and the
    43 non-decimal keys were all green.  (An earlier revision of this
    docstring claimed the driver green-lit x253 at decimal(28,4); that was
    wrong — no CORRECTNESS file has ever had an x253 row, and no
    decimal-final key had been driver-tested before r7.)"""
    t = t.strip()
    u = t.upper()
    if u in ("HUGEINT", "UHUGEINT", "UUID", "INTERVAL", "BIT"):
        return f"!{u.lower()}"  # no repr-stable Spark counterpart: always flag
    ints = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
            "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT")
    if u in ints:
        return "int"
    if u in ("FLOAT", "DOUBLE"):
        return "float"
    if u.startswith("DECIMAL"):
        scale = u.rstrip(")").split(",")[-1].strip()
        return f"decimal.s{scale}"
    if u in ("VARCHAR", "JSON", "ENUM"):
        return "string"  # all fetch as python str
    if u == "BLOB":
        return "binary"
    if u == "BOOLEAN":
        return "boolean"
    if u == "DATE":
        return "date"
    if u.startswith("TIMESTAMP") or u.startswith("TIME"):
        return "timestamp"
    if u.endswith("[]"):
        return f"array<{_duck_kind(t[:-2])}>"
    return f"?{u.lower()}"


def _spark_kind(dt) -> str:
    s = dt.simpleString()
    if s in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if s in ("float", "double"):
        return "float"
    if s.startswith("decimal"):
        scale = s.rstrip(")").split(",")[-1].strip()
        return f"decimal.s{scale}"
    if s in ("timestamp", "timestamp_ntz"):
        return "timestamp"
    if s.startswith("array<"):
        from pyspark.sql.types import ArrayType

        if isinstance(dt, ArrayType):
            return f"array<{_spark_kind(dt.elementType)}>"
    return s


def type_problems(spark_df, d_cols, d_types, key: str = "") -> list[str]:
    """Per-column KIND check mirroring the driver's type-sensitive value
    hash (see _duck_kind). Columns matched by NAME (driver sorts by name)."""
    s_map = {f.name: _spark_kind(f.dataType) for f in spark_df.schema.fields}
    d_map = {c: _duck_kind(t) for c, t in zip(d_cols, d_types)}
    problems = []
    for c in sorted(set(s_map) & set(d_map)):
        if s_map[c] != d_map[c]:
            problems.append(
                f"{key}: TYPE-KIND mismatch on '{c}': spark={s_map[c]} duckdb={d_map[c]}"
                " (driver hash is repr-sensitive: HUGEINT→float64, scale/kind"
                " flips change the canonical value string)"
            )
    return problems


def no_decimal_final_problems(spark_df, key: str = "") -> list[str]:
    """Hard ban on DECIMAL columns in an oracle-paired key's FINAL schema.

    The r7 driver window proved decimal finals hash-red even when every
    value matches (see _duck_kind docstring).  Decimal math must stay
    INTERNAL; finals are double (ROUND(CAST(x AS DOUBLE), s)), fixed-point
    BIGINT, or STRING (for >2^53 exact checksums)."""
    out = []
    for f in spark_df.schema.fields:
        if f.dataType.simpleString().startswith("decimal"):
            out.append(
                f"{key}: DECIMAL-final column '{f.name}' "
                f"({f.dataType.simpleString()}) — the driver's value hash "
                "diverges on decimal finals (CORRECTNESS_r07 red family); "
                "finalize as double/bigint/string"
            )
    return out


def compare(spark_df, oracle_sql_text: str, sf_dir: str, key: str = "",
            oracle_result=None) -> list[str]:
    """Returns a list of mismatch descriptions (empty = pass).

    ``oracle_result``: optional precomputed (cols, rows, types) triple —
    sweep tooling passes this to run the DuckDB side in a killable
    subprocess (a wedged in-process DuckDB query survives job-group
    cancellation and has taken a whole sweep down; ADVICE r8 / r9)."""
    problems = []
    problems.extend(no_decimal_final_problems(spark_df, key=key))
    s_cols, s_rows = spark_run(spark_df)
    if oracle_result is not None:
        d_cols, d_rows, d_types = oracle_result
    else:
        d_cols, d_rows, d_types = duckdb_run_typed(oracle_sql_text, sf_dir)
    problems.extend(type_problems(spark_df, d_cols, d_types, key=key))
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
