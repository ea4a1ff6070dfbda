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


def _x480_sql(intdiv: str) -> str:
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

    return f"""
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
    ),
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
    ),
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
    spark_sql=_x480_sql("DIV"),
    duckdb_sql=_x480_sql("//"),
    tags=("attribution", "recursive"),
)
