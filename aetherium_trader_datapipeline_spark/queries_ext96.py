"""Wave 96 (x372–x374): forward as-of, overlap counting, survival curves.

x372 — FORWARD as-of ("time to next"): for each tick, the next ERROR
event of the same user strictly after it — the mirror of the backward
as-of family (x10 join, x339 strict-before PIT), and the primitive
behind time-to-failure / time-to-conversion labels.  Same tagged
log-merge discipline, reversed: the ignore-nulls FIRST value over the
FOLLOWING frame on one (user, ts, tag) sort, with the anchor sorting
AFTER a same-instant candidate so a same-timestamp event is NOT "next"
(strictness in the sort key, x339's trick mirrored).  Exact BIGINT
epoch micros; reports per-user-bucket label counts and total
time-to-next.

x373 — overlapping-PAIR counting via the plane sweep: how many
interval pairs overlap per key, WITHOUT the quadratic pair join — at
each interval start, the number of currently-open intervals is exactly
the number of pairs that start contributes, so total pairs = one
running sum over the boundary-event stream (+1 at start, −1 at end,
ends sorting before the starts they abut since [s, e) is half-open).
The x352 sweep answers "how much is covered"; this answers "how much
CONTENTION" — double-booking audits, position-overlap checks — same
one-window cost.

x374 — discrete Kaplan–Meier survival of user activity lifetimes
(days from first to last event, right-censored at the corpus horizon):
S(t) = Π(1 − d_j/n_j) over event days, computed EXACTLY by the
log-space rewrite — per-day ln(1 − d/n) terms quantized to 1e12, a
cumulative integer sum over the ≤31-row day frame, exp at the end per
row (the x340 quantize-before-sum discipline making a cumulative
PRODUCT engine-safe).  Censored lifetimes enter risk sets but never
the death counts — the estimator's defining property, visible in the
output's n_censored column.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x372: forward as-of (time to next error) ----------------------------------
# tag 1 = anchor sorts AFTER tag 0 = error candidate at equal ts, so a
# same-instant error is already "past" the anchor and excluded — strict
# after via sort key alone (mirror of x339).

_X372_FMT = """
    WITH tagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'error' THEN 0 ELSE 1 END AS tag,
             CASE WHEN event_type = 'error' THEN {epoch_us} END AS err_us
      FROM events
    ),
    merged AS (
      SELECT user_id, ts, event_id, tag,
             {fv_next} AS next_err_us
      FROM tagged
    ),
    anchors AS (
      SELECT user_id, event_id,
             next_err_us - {epoch_us} AS wait_us
      FROM merged WHERE tag = 1
    )
    SELECT CAST(user_id % 100 AS BIGINT) AS user_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_anchors,
           CAST(SUM(CASE WHEN wait_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_with_next,
           CAST(CAST(SUM(CASE WHEN wait_us IS NOT NULL
                              THEN CAST(wait_us AS DECIMAL(28,0)) END)
                AS DECIMAL(38,0)) AS BIGINT) AS total_wait_us
    FROM anchors GROUP BY user_id % 100 ORDER BY user_bucket
"""

register_sql(
    "x372_forward_asof",
    spark_sql=_X372_FMT.format(
        epoch_us="unix_micros(ts)",
        fv_next=(
            "first_value(err_us, true) OVER (PARTITION BY user_id "
            "ORDER BY ts, tag, event_id "
            "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)"
        ),
    ),
    duckdb_sql=_X372_FMT.format(
        epoch_us="epoch_us(ts)",
        fv_next=(
            "first_value(err_us IGNORE NULLS) OVER (PARTITION BY user_id "
            "ORDER BY ts, tag, event_id "
            "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)"
        ),
    ),
    tags=("asof", "window"),
)

# -- x373: overlap-pair counting by plane sweep --------------------------------
# boundary events: (+1, t=s) and (-1, t=e); [s, e) half-open, so an end
# at t sorts BEFORE a start at t (kind -1 < +1) and abutting intervals
# do not pair. pairs = sum over starts of open-before count.  The filter
# requires the ROUNDED microsecond duration >= 1 (not just |value| > 0):
# a |value| < 5e-7 would round to a degenerate [t, t) interval whose end
# event sorts before its own start and transiently decrements open_before.

_X373_FMT = """
    WITH iv AS (
      SELECT user_id % 10 AS k, event_id,
             {epoch_us} AS s,
             {epoch_us} + CAST(ROUND(ABS(value) * 1000000, 0) AS BIGINT) AS e
      FROM events
      WHERE value IS NOT NULL AND ROUND(ABS(value) * 1000000, 0) >= 1
    ),
    bounds AS (
      SELECT k, s AS t, 1 AS kind, event_id FROM iv
      UNION ALL
      SELECT k, e AS t, -1 AS kind, event_id FROM iv
    ),
    swept AS (
      SELECT k, kind,
             COALESCE(SUM(kind) OVER (PARTITION BY k ORDER BY t, kind, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS open_before
      FROM bounds
    )
    SELECT CAST(k AS BIGINT) AS k,
           CAST(COUNT(*) / 2 AS BIGINT) AS n_intervals,
           CAST(SUM(CASE WHEN kind = 1 THEN open_before ELSE 0 END) AS BIGINT)
             AS n_overlapping_pairs,
           CAST(MAX(CASE WHEN kind = 1 THEN open_before + 1 ELSE 0 END)
             AS BIGINT) AS max_concurrency
    FROM swept GROUP BY k ORDER BY k
"""

register_sql(
    "x373_overlap_pairs",
    spark_sql=_X373_FMT.format(epoch_us="unix_micros(ts)"),
    duckdb_sql=_X373_FMT.format(epoch_us="epoch_us(ts)"),
    tags=("window", "audit"),
)

# -- x374: Kaplan-Meier survival of activity lifetimes -------------------------

_X374_FMT = """
    WITH spans AS (
      SELECT user_id,
             MIN(CAST(ts AS DATE)) AS d0,
             MAX(CAST(ts AS DATE)) AS d1
      FROM events GROUP BY user_id
    ),
    horizon AS (SELECT MAX(d1) AS dmax FROM spans),
    lifetimes AS (
      SELECT s.user_id,
             {days_life} AS life_d,
             CASE WHEN s.d1 = h.dmax THEN 1 ELSE 0 END AS censored
      FROM spans s CROSS JOIN horizon h
    ),
    risk AS (
      SELECT life_d AS t,
             CAST(SUM(1 - censored) AS BIGINT) AS deaths,
             CAST(SUM(censored) AS BIGINT) AS censored_here
      FROM lifetimes GROUP BY life_d
    ),
    ordered AS (
      SELECT t, deaths, censored_here,
             CAST(SUM(deaths + censored_here) OVER (ORDER BY t DESC)
               AS BIGINT) AS n_at_risk
      FROM risk
    ),
    terms AS (
      SELECT t, deaths, censored_here, n_at_risk,
             CASE WHEN deaths > 0 AND deaths < n_at_risk
                  THEN CAST(FLOOR(LN(1 - CAST(deaths AS DOUBLE) / n_at_risk)
                                  * 1e12) AS BIGINT)
                  WHEN deaths = 0 THEN 0
                  ELSE NULL END AS lg_fp
      FROM ordered
    )
    SELECT CAST(t AS BIGINT) AS lifetime_days,
           deaths, censored_here, n_at_risk,
           ROUND(EXP(CAST(CAST(SUM(CAST(lg_fp AS DECIMAL(18,0)))
                 OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND
                       CURRENT ROW) AS DECIMAL(38,0)) AS DOUBLE) / 1e12), 6)
             AS survival
    FROM terms WHERE lg_fp IS NOT NULL ORDER BY lifetime_days
"""

register_sql(
    "x374_kaplan_meier",
    spark_sql=_X374_FMT.format(days_life="DATEDIFF(s.d1, s.d0)"),
    duckdb_sql=_X374_FMT.format(days_life="DATEDIFF('day', s.d0, s.d1)"),
    tags=("stats", "audit"),
)
