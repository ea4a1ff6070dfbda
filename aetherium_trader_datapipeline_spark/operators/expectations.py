"""Declarative data-quality expectations — the dbt-test / Great-
Expectations pattern as a tiny Spark-first rule engine.

The reference validates ROWS at ingest (tick guard predicates,
`ingestion/domain/src/validation.rs` — our operators/validate.py twin);
this operator validates TABLES at rest: a suite of declarative rules
compiles to one small aggregate per rule (COUNT of violating rows), and
the union of those single-row frames is the quality report a 100 TB
pipeline gates a publish on.

Rule kinds:
- ``not_null(col)``          — NULLs in a required column
- ``unique(cols)``           — duplicate key tuples (COUNT - COUNT DISTINCT)
- ``accepted_range(col, lo, hi)`` — values outside [lo, hi]
- ``accepted_values(col, values)`` — values outside an enum
- ``referential(fk, parent_df, pk)`` — child keys missing from the parent
  (LEFT ANTI join; the parent side is typically the broadcastable dim)
- ``predicate(sql)``         — rows violating an arbitrary boolean SQL

Scale posture: every rule is one aggregate over a scan — Catalyst fuses
the scan per table when rules share it; no rule materializes violating
rows (callers re-query with the rule's predicate to fetch samples).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    name: str
    table: str
    kind: str
    col: str | None = None
    cols: tuple[str, ...] = field(default=())
    lo: object = None
    hi: object = None
    values: tuple = field(default=())
    parent: DataFrame | None = None
    pk: str | None = None
    sql: str | None = None


def not_null(name: str, table: str, col: str) -> Rule:
    return Rule(name, table, "not_null", col=col)


def unique(name: str, table: str, *cols: str) -> Rule:
    return Rule(name, table, "unique", cols=tuple(cols))


def accepted_range(name: str, table: str, col: str, lo, hi) -> Rule:
    return Rule(name, table, "accepted_range", col=col, lo=lo, hi=hi)


def accepted_values(name: str, table: str, col: str, *values) -> Rule:
    return Rule(name, table, "accepted_values", col=col, values=tuple(values))


def referential(name: str, table: str, col: str, parent: DataFrame, pk: str) -> Rule:
    return Rule(name, table, "referential", col=col, parent=parent, pk=pk)


def predicate(name: str, table: str, sql: str) -> Rule:
    """`sql` states what MUST hold; violations = rows where it is false
    or NULL."""
    return Rule(name, table, "predicate", sql=sql)


def _violations(df: DataFrame, r: Rule) -> DataFrame:
    if r.kind == "not_null":
        v = df.where(F.col(r.col).isNull()).agg(F.count(F.lit(1)).alias("n"))
    elif r.kind == "unique":
        v = df.agg(
            (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in r.cols])).alias(
                "n"
            )
        )
    elif r.kind == "accepted_range":
        v = df.where(
            F.col(r.col).isNull()
            | (F.col(r.col) < F.lit(r.lo))
            | (F.col(r.col) > F.lit(r.hi))
        ).agg(F.count(F.lit(1)).alias("n"))
    elif r.kind == "accepted_values":
        v = df.where(~F.col(r.col).isin(*r.values) | F.col(r.col).isNull()).agg(
            F.count(F.lit(1)).alias("n")
        )
    elif r.kind == "referential":
        v = (
            df.select(F.col(r.col)).where(F.col(r.col).isNotNull())
            .join(
                F.broadcast(r.parent.select(F.col(r.pk).alias(r.col)).distinct()),
                r.col,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )
    elif r.kind == "predicate":
        v = df.where(~F.coalesce(F.expr(r.sql), F.lit(False))).agg(
            F.count(F.lit(1)).alias("n")
        )
    else:
        raise ValueError(f"unknown rule kind: {r.kind!r}")
    return v.select(
        F.lit(r.name).alias("rule"),
        F.lit(r.table).alias("table_name"),
        F.col("n").cast("bigint").alias("n_violations"),
        (F.col("n") == 0).alias("passed"),
    )


def run_expectations(tables: dict[str, DataFrame], rules: list[Rule]) -> DataFrame:
    """Evaluate every rule; returns (rule, table_name, n_violations,
    passed) ordered by rule name."""
    frames = [_violations(tables[r.table], r) for r in rules]
    return reduce(lambda a, b: a.unionByName(b), frames).orderBy("rule")
