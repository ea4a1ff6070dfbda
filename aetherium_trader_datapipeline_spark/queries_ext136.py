"""Wave 136 (x480): Markov removal-effect attribution — an absorbing
chain solved by fixed-point iteration INSIDE a recursive CTE.

The first-order Markov attribution model (Anderl et al. 2014): user
paths (events before the first purchase) define transition counts over
states {start, click, error, signup, view} into {channels, conv, null};
P(conversion | start) solves p = T·p with p_conv = 1, p_null = 0.  The
removal effect of channel X re-routes every transition INTO X to null
and re-solves; attribution is the normalized drop in P(conv).

Plan shape: Spark's recursive CTE forbids aggregates over the recursive
reference, so the chain state is ONE WIDE ROW per variant — the 5×6
transition counts, the 5 row totals, and the 5-entry p-vector all ride
as columns, and each iteration is pure scalar arithmetic (integer
1e12-quantized probabilities, DIV division → both engines iterate
bit-identically; 40 rounds ≍ fixed point at this quantization).  The
data-sized work (path extraction, transition counting) happens ONCE in
non-recursive CTEs; the recursion touches 5 rows × 40 iterations.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

_CH = ["click", "error", "signup", "view"]
_FROM = ["start"] + _CH
_TO = _CH + ["conv", "nul"]


def _x480_sql(intdiv: str, fold: bool = False) -> str:
    # pivot cells: t_<from>_<to>
    cells = ",\n             ".join(
        f"CAST(SUM(CASE WHEN from_state = '{f}' AND to_state = '{t}' "
        f"THEN cnt ELSE 0 END) AS BIGINT) AS t_{f}_{t}"
        for f in _FROM
        for t in _TO
    )
    # variant-adjusted cells: transitions into the removed channel -> null
    vcells = []
    for f in _FROM:
        for t in _TO:
            if t == "nul":
                extra = " + ".join(
                    f"CASE WHEN v.removed = '{ch}' THEN m.t_{f}_{ch} "
                    f"ELSE 0 END"
                    for ch in _CH
                )
                vcells.append(f"m.t_{f}_nul + {extra} AS t_{f}_nul")
            elif t in _CH:
                vcells.append(
                    f"CASE WHEN v.removed = '{t}' THEN 0 "
                    f"ELSE m.t_{f}_{t} END AS t_{f}_{t}"
                )
            else:
                vcells.append(f"m.t_{f}_{t} AS t_{f}_{t}")
    vcells_sql = ",\n             ".join(vcells)
    totals = ",\n             ".join(
        "(" + " + ".join(f"t_{f}_{t}" for t in _TO) + f") AS n_{f}"
        for f in _FROM
    )
    # recursive p updates: p'_f = (Σ_ch t_f_ch·p_ch + t_f_conv·1e12) DIV n_f
    updates = ",\n             ".join(
        (
            "CASE WHEN n_" + f + " > 0 THEN ("
            + " + ".join(f"t_{f}_{ch} * p_{ch}" for ch in _CH)
            + f" + t_{f}_conv * 1000000000000) {intdiv} n_{f} ELSE 0 END"
            + f" AS p_{f}"
        )
        for f in _FROM
    )
    carry = ", ".join(
        [f"t_{f}_{t}" for f in _FROM for t in _TO]
        + [f"n_{f}" for f in _FROM]
    )
    zeros = ", ".join(f"CAST(0 AS BIGINT) AS p_{f}" for f in _FROM)

    if fold:
        # r13 Spark-side shape (the DuckDB oracle keeps the recursive
        # CTE): Spark executes each recursive iteration as its own tiny
        # job, so 40 rounds over 5 rows cost ~40 job launches (~1.4-2.9 s
        # measured, all scheduling). The same fixed-point solve is a
        # sequence(1, 40) aggregate() fold over the wide variant row: the
        # step lambda applies the IDENTICAL integer updates (all reads
        # from acc = simultaneous update, exactly like the rCTE's single
        # SELECT), 40 times from the same all-zero start, so every
        # intermediate bigint is bit-identical — one projection instead
        # of 40 jobs.
        zeros_ns = ", ".join(f"'p_{f}', CAST(0 AS BIGINT)" for f in _FROM)
        updates_ns = ",\n                 ".join(
            (
                f"'p_{f}', CASE WHEN n_{f} > 0 THEN ("
                + " + ".join(f"t_{f}_{ch} * acc.p_{ch}" for ch in _CH)
                + f" + t_{f}_conv * 1000000000000) {intdiv} n_{f} ELSE 0 END"
            )
            for f in _FROM
        )
        solve = f"""
    solved0 AS (
      SELECT removed,
             aggregate(
               sequence(1, 40),
               named_struct({zeros_ns}),
               (acc, i) -> named_struct(
                 {updates_ns})
             ) AS pv
      FROM sized
    ),
    solved AS (
      -- window, not a join, for the same no-stats reason as below
      SELECT removed, pv.p_start AS p_start,
             MAX(CASE WHEN removed = 'full' THEN pv.p_start END) OVER ()
               AS p_full
      FROM solved0
    ),"""
    else:
        solve = f"""
    it AS (
      SELECT 0 AS i, removed, {carry}, {zeros}
      FROM sized
      UNION ALL
      SELECT i + 1, removed, {carry},
             {updates}
      FROM it WHERE i < 40
    ),
    solved AS (
      -- the full-variant baseline is attached by a window over the
      -- 5-row solved frame, not a join: post-recursion frames have no
      -- stats and Catalyst folds any constant-key join back into a
      -- CartesianProduct (audit-banned)
      SELECT removed, p_start,
             MAX(CASE WHEN removed = 'full' THEN p_start END) OVER ()
               AS p_full
      FROM it WHERE i = 40
    ),"""

    if fold:
        # r13 one-pass front half (Spark side only): the original
        # fp/path_events/hops CTE chain referenced path_events three ways
        # and fp twice, and CTE inlining re-ran the events scan + fp
        # aggregate per reference (plan: ~7 parquet scans, 5 sorts).  All
        # three hop kinds now come off ONE user_id-partitioned window
        # pass: pts is a per-user window MIN, path rows keep their LAG
        # predecessor, the last path row (LEAD IS NULL) also emits the
        # terminal conv/nul hop via a per-row 2-element explode, and
        # purchase-only users (pts set, zero path rows) keep one
        # representative row (rn = 1) that emits start→conv — exactly the
        # three UNION branches' multiset.  1 scan, 1 exchange.
        front = """
    WITH w1 AS (
      SELECT user_id, ts, event_id, event_type,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               OVER (PARTITION BY user_id) AS pts
      FROM events
    ),
    w2 AS (
      SELECT *,
             (event_type != 'purchase' AND (pts IS NULL OR ts < pts))
               AS is_path,
             SUM(CASE WHEN event_type != 'purchase'
                       AND (pts IS NULL OR ts < pts) THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id) AS n_path,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM w1
    ),
    kept AS (
      SELECT * FROM w2
      WHERE is_path OR (pts IS NOT NULL AND n_path = 0 AND rn = 1)
    ),
    seq AS (
      SELECT user_id, event_type, pts, is_path,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev,
             LEAD(event_id) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
      FROM kept
    ),
    hops AS (
      SELECT user_id, h.f AS from_state, h.t AS to_state
      FROM seq
      LATERAL VIEW explode(
        CASE WHEN NOT is_path THEN
               array(named_struct('f', 'start', 't', 'conv'))
             WHEN nxt IS NULL THEN array(
               named_struct('f', COALESCE(prev, 'start'), 't', event_type),
               named_struct('f', event_type,
                            't', CASE WHEN pts IS NOT NULL
                                      THEN 'conv' ELSE 'nul' END))
             ELSE array(named_struct('f', COALESCE(prev, 'start'),
                                     't', event_type))
        END) x AS h
    ),"""
    else:
        front = """
    WITH RECURSIVE fp AS (
      SELECT user_id, MIN(ts) AS pts
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    path_events AS (
      SELECT e.user_id, e.ts, e.event_id, e.event_type, fp.pts
      FROM events e LEFT JOIN fp ON e.user_id = fp.user_id
      WHERE e.event_type != 'purchase'
        AND (fp.pts IS NULL OR e.ts < fp.pts)
    ),
    hops AS (
      SELECT user_id,
             COALESCE(LAG(event_type) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id),
                      'start') AS from_state,
             event_type AS to_state
      FROM path_events
      UNION ALL
      SELECT user_id, event_type AS from_state,
             CASE WHEN pts IS NOT NULL THEN 'conv' ELSE 'nul' END AS to_state
      FROM (
        SELECT user_id, event_type, pts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM path_events
      ) last_e WHERE rn = 1
      UNION ALL
      -- purchases with NO prior path events: start -> conv directly
      SELECT fp.user_id, 'start', 'conv'
      FROM fp LEFT JOIN (SELECT DISTINCT user_id FROM path_events) pe
        ON fp.user_id = pe.user_id
      WHERE pe.user_id IS NULL
    ),"""

    return f"""{front}
    counts AS (
      SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM hops GROUP BY from_state, to_state
    ),
    matrix AS (
      -- constant join key: a CROSS JOIN after the recursive/aggregate
      -- frames loses stats and plans a CartesianProduct (audit-banned);
      -- the k=1 equi join hashes instead
      SELECT 1 AS k, {cells}
      FROM counts
    ),
    variants AS (
      SELECT 1 AS k, 'full' AS removed UNION ALL SELECT 1, 'click'
      UNION ALL SELECT 1, 'error' UNION ALL SELECT 1, 'signup'
      UNION ALL SELECT 1, 'view'
    ),
    vmatrix AS (
      SELECT v.removed,
             {vcells_sql}
      FROM matrix m JOIN variants v ON m.k = v.k
    ),
    sized AS (
      SELECT *,
             {totals}
      FROM vmatrix
    ),
{solve}
    effects AS (
      SELECT removed AS channel,
             CAST(p_full AS BIGINT) AS p_conv_full_fp,
             CAST(p_start AS BIGINT) AS p_conv_removed_fp,
             GREATEST(0, p_full - p_start) AS drop_fp
      FROM solved WHERE removed != 'full'
    )
    SELECT channel,
           ROUND(p_conv_full_fp / 1e12, 6) AS p_conv_full,
           ROUND(p_conv_removed_fp / 1e12, 6) AS p_conv_without,
           ROUND(drop_fp / 1e12, 6) AS removal_effect,
           CASE WHEN SUM(drop_fp) OVER () > 0 THEN
             ROUND(CAST(drop_fp AS DOUBLE) / SUM(drop_fp) OVER (), 6)
           END AS attribution_share
    FROM effects ORDER BY channel
"""


register_sql(
    "x480_markov_attribution",
    headline=True,
    spark_sql=_x480_sql("DIV", fold=True),
    duckdb_sql=_x480_sql("//"),
    tags=("attribution", "recursive"),
)
