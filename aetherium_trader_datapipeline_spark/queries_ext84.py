"""Wave 84 (x336–x338): VPIN toxicity, WoE/IV scoring bins, triple-barrier labels.

x336 is VPIN (Easley, López de Prado, O'Hara) — flow toxicity as the
mean absolute buy/sell imbalance over VOLUME buckets.  It composes two
verified pieces: x315's zero-tick-rule trade signs and x314's
volume-bucket assignment (exclusive DECIMAL prefix volume ÷ V), so the
bucket boundaries and the classification are both engine-exact; each
bucket's imbalance ratio is quantized to 1e9 fixed-point before the
per-sym mean (the x321 discipline).  One sorted window pass feeds both
the sign carry and the bucket id.

x337 is Weight-of-Evidence / Information-Value binning — the credit-
scoring standard for screening a feature before logistic modeling:
bins of l_quantity vs the returnflag='R' outcome, WoE = ln of the
bad-share/good-share ratio per bin, IV term = (share difference)·WoE.
Counts are exact; WoE/IV are per-bin rounded doubles (no cross-row
float sum — the scalar IV is the sum of reported terms, x326's
convention).

x338 is triple-barrier labeling (López de Prado) — the event-based
alternative to fixed-horizon returns for training labels: from each
anchor (every 50th tick), the label is whichever comes first within a
100-tick horizon: +1 profit barrier, −1 stop barrier, 0 timeout.  The
naive formulation is a range theta-join (anchor × next-100-ticks) that
Spark can only BNLJ — banned by this repo's plan audit for
data-proportional build sides — so each tick instead EXPLODES to its ≤3
candidate anchor blocks and equi-joins on (sym, block), with the exact
range check as a post-filter (the x177 explode/equi-join rewrite).
Work is ≤ horizon/stride + 1 ≈ 3 rows per tick: strictly linear,
two hash shuffles, no BNLJ anywhere.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# -- x336: VPIN ----------------------------------------------------------------

_X336_FMT = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, ts, event_id,
             CAST(ABS(value) AS DECIMAL(18,6)) AS vol,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    diffs AS (
      SELECT sym, ts, event_id, vol,
             px - LAG(px) OVER (PARTITION BY sym ORDER BY ts, event_id) AS d,
             COALESCE(SUM(vol) OVER (
               PARTITION BY sym ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), CAST(0 AS DECIMAL(18,6))) AS pvol
      FROM ticks
    ),
    signed AS (
      SELECT sym, ts, event_id, vol,
             CAST(FLOOR(pvol / 500) AS BIGINT) AS bucket,
             CASE WHEN d > 0 THEN 1 WHEN d < 0 THEN -1 ELSE NULL END AS s0
      FROM diffs
    ),
    carried AS (
      SELECT sym, bucket, vol,
             {last_nonzero} AS s
      FROM signed
    ),
    buckets AS (
      SELECT sym, bucket,
             CAST(SUM(CASE WHEN s = 1 THEN vol ELSE 0 END) AS DECIMAL(28,6))
               AS v_buy,
             CAST(SUM(CASE WHEN s = -1 THEN vol ELSE 0 END) AS DECIMAL(28,6))
               AS v_sell,
             CAST(SUM(vol) AS DECIMAL(28,6)) AS v_tot
      FROM carried GROUP BY sym, bucket
    ),
    imb AS (
      SELECT sym,
             CAST(FLOOR(ABS(CAST(v_buy AS DOUBLE) - CAST(v_sell AS DOUBLE))
                        / CAST(v_tot AS DOUBLE) * 1e9) AS BIGINT) AS imb_fp
      FROM buckets WHERE v_tot > 0
    )
    SELECT CAST(sym AS BIGINT) AS sym,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           ROUND(CAST(CAST(SUM(CAST(imb_fp AS DECIMAL(18,0))) AS DECIMAL(38,0))
                      AS DOUBLE) / COUNT(*) / 1e9, 6) AS vpin
    FROM imb GROUP BY sym ORDER BY sym
"""

_LAST_NONZERO_SPARK = (
    "last_value(s0, true) OVER (PARTITION BY sym ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
)
_LAST_NONZERO_DUCK = (
    "last_value(s0 IGNORE NULLS) OVER (PARTITION BY sym ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
)

register_sql(
    "x336_vpin",
    spark_sql=_X336_FMT.format(last_nonzero=_LAST_NONZERO_SPARK),
    duckdb_sql=_X336_FMT.format(last_nonzero=_LAST_NONZERO_DUCK),
    tags=("finance", "window"),
)

# -- x337: WoE / IV binning ----------------------------------------------------

_X337 = """
    WITH labeled AS (
      SELECT CAST(FLOOR((CAST(ROUND(l_quantity, 0) AS BIGINT) - 1) / 5)
               AS BIGINT) AS bin,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS bad
      FROM lineitem
    ),
    bins AS (
      SELECT bin,
             CAST(SUM(bad) AS BIGINT) AS n_bad,
             CAST(SUM(1 - bad) AS BIGINT) AS n_good
      FROM labeled GROUP BY bin
    ),
    tot AS (
      SELECT CAST(SUM(n_bad) AS BIGINT) AS t_bad,
             CAST(SUM(n_good) AS BIGINT) AS t_good
      FROM bins
    )
    SELECT b.bin, b.n_bad, b.n_good,
           ROUND(LN((CAST(b.n_bad AS DOUBLE) / t.t_bad)
                    / (CAST(b.n_good AS DOUBLE) / t.t_good)), 6) AS woe,
           ROUND((CAST(b.n_bad AS DOUBLE) / t.t_bad
                  - CAST(b.n_good AS DOUBLE) / t.t_good)
                 * LN((CAST(b.n_bad AS DOUBLE) / t.t_bad)
                      / (CAST(b.n_good AS DOUBLE) / t.t_good)), 8) AS iv_term
    FROM bins b CROSS JOIN tot t ORDER BY b.bin
"""

register_sql(
    "x337_woe_iv",
    spark_sql=_X337,
    duckdb_sql=_X337,
    tags=("training", "audit"),
)

# -- x338: triple-barrier labels -----------------------------------------------
# Anchors: rn % 50 = 0. Horizon (rn, rn+100]. Tick at rn joins anchors
# in blocks floor((rn-1)/50)-1 .. floor((rn-1)/50) whose anchor rn
# satisfies the range — ≤ 3 candidates each, exact filter after the
# equi-join. Barrier = ±2.0 price units.

_X338_FMT = """
    WITH ticks AS (
      SELECT user_id % 10 AS sym, ts, event_id,
             CAST(100 + (value - FLOOR(value)) * 10 AS DECIMAL(18,6)) AS px
      FROM events WHERE value IS NOT NULL
    ),
    seq AS (
      SELECT sym, px,
             ROW_NUMBER() OVER (PARTITION BY sym ORDER BY ts, event_id) AS rn
      FROM ticks
    ),
    anchors AS (
      SELECT sym, rn AS a_rn, px AS a_px, CAST(rn / 50 AS BIGINT) AS a_blk
      FROM seq WHERE rn % 50 = 0
    ),
    cand AS (
      SELECT s.sym, s.rn, s.px, CAST(b.blk AS BIGINT) AS blk
      FROM seq s
      {lateral_blocks}
      WHERE b.blk >= 0
    ),
    hits AS (
      SELECT a.sym, a.a_rn,
             MIN(CASE WHEN c.px >= a.a_px + 2.0 THEN c.rn END) AS first_up,
             MIN(CASE WHEN c.px <= a.a_px - 2.0 THEN c.rn END) AS first_dn,
             MAX(c.rn) AS horizon_end
      FROM anchors a
      JOIN cand c ON c.sym = a.sym AND c.blk = a.a_blk
                 AND c.rn > a.a_rn AND c.rn <= a.a_rn + 100
      GROUP BY a.sym, a.a_rn
    ),
    labels AS (
      SELECT sym,
             CASE
               WHEN first_up IS NOT NULL
                    AND (first_dn IS NULL OR first_up < first_dn) THEN 1
               WHEN first_dn IS NOT NULL
                    AND (first_up IS NULL OR first_dn <= first_up) THEN -1
               ELSE 0
             END AS label,
             COALESCE(LEAST(first_up, first_dn), first_up, first_dn,
                      horizon_end) - a_rn AS hold
      FROM hits
    )
    SELECT CAST(sym AS BIGINT) AS sym, CAST(label AS BIGINT) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(hold) AS BIGINT) AS total_hold_ticks
    FROM labels GROUP BY sym, label ORDER BY sym, label
"""

_LATERAL_SPARK = (
    "LATERAL VIEW explode(array(CAST(FLOOR((s.rn - 1) / 50) AS BIGINT),"
    " CAST(FLOOR((s.rn - 1) / 50) AS BIGINT) - 1,"
    " CAST(FLOOR((s.rn - 1) / 50) AS BIGINT) - 2)) b AS blk"
)
_LATERAL_DUCK = (
    ", LATERAL (SELECT unnest([CAST(FLOOR((s.rn - 1) / 50) AS BIGINT),"
    " CAST(FLOOR((s.rn - 1) / 50) AS BIGINT) - 1,"
    " CAST(FLOOR((s.rn - 1) / 50) AS BIGINT) - 2]) AS blk) b"
)

register_sql(
    "x338_triple_barrier",
    spark_sql=_X338_FMT.format(lateral_blocks=_LATERAL_SPARK),
    duckdb_sql=_X338_FMT.format(lateral_blocks=_LATERAL_DUCK),
    tags=("finance", "training"),
)
