"""Wave 151 (x522–x524): offline policy evaluation.

x522 — ε-greedy bandit REPLAY (Li et al. 2011): per symbol, the logged
event stream is replayed in time order; the policy picks an arm (the
event type) by ε-greedy over integer reward sums (exploration from a
deterministic step hash), and only steps whose logged arm matches the
policy's choice update estimates and score reward (reward = 1 when the
event's value lands in the upper half of its fractional range).  State
is 5 integer counts + 5 integer reward sums — the whole replay is
integer arithmetic, so the Arrow fold and the DuckDB recursive CTE
(which drags the 10 state columns plus the chosen arm through the
recursion) agree exactly.  The standard way to evaluate a bandit
policy on logged data without deploying it.

x523 — inverse-propensity-scored policy value: the logging policy's
propensities are the measured per-(sym, hour) arm frequencies; the
target policy plays the hour's majority arm.  V̂_IPS = mean over logged
steps of reward·1[target=logged]/p̂(logged) — one exact pass (the
per-step 1/p̂ weights are integer cross-products), no sequential state.

x524 — off-policy support audit: IPS is only valid where the logging
policy explores — per (hour, arm) cell counts, the share of cells with
≥30 samples, and the minimum propensity observed, the table that says
whether x523's estimate can be trusted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from aetherium_trader_datapipeline_spark.queries import register, register_sql
from aetherium_trader_datapipeline_spark.tables import load_tables

_ARMS = ["click", "error", "purchase", "signup", "view"]

# -- x522: bandit replay ------------------------------------------------------------------

_ARM_IDX_SQL = (
    "CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1 "
    "WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END"
)


# Fixed evaluation horizon (Li et al. replay runs on a fixed step budget):
# the replay folds only the first _X522_HORIZON steps per symbol.  This is
# what keeps BOTH engines scale-safe — the recursive-CTE oracle's depth is
# the max per-sym step count, and each recursion level rejoins `logged`,
# i.e. cost O(depth x |events|): unbounded depth measured 163 s at sf0.01
# and timed out the 600 s sf0.1 sweep budget (r8).  A constant horizon
# makes oracle cost O(H x |events|) and the Spark fold's per-group loop
# O(H) regardless of SF.  (sf0.001 has ~100 steps/sym — far below H, so
# the cap is inactive there and results are unchanged.)
_X522_HORIZON = 500

_X522_ORACLE_TEMPLATE = """
    WITH RECURSIVE logged AS MATERIALIZED (
      SELECT * FROM (
        SELECT user_id % 10 AS sym,
               {arm_idx} AS arm,
               CASE WHEN (value - FLOOR(value)) >= 0.5 THEN 1 ELSE 0 END
                 AS reward,
               ROW_NUMBER() OVER (PARTITION BY user_id % 10
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE value IS NOT NULL
      ) t WHERE rn <= {horizon}
    ),
    rec AS (
      SELECT sym, CAST(0 AS BIGINT) AS rn,
             CAST(0 AS BIGINT) AS c0, CAST(0 AS BIGINT) AS c1,
             CAST(0 AS BIGINT) AS c2, CAST(0 AS BIGINT) AS c3,
             CAST(0 AS BIGINT) AS c4,
             CAST(0 AS BIGINT) AS s0, CAST(0 AS BIGINT) AS s1,
             CAST(0 AS BIGINT) AS s2, CAST(0 AS BIGINT) AS s3,
             CAST(0 AS BIGINT) AS s4,
             CAST(0 AS BIGINT) AS matched, CAST(0 AS BIGINT) AS total_r
      FROM (SELECT DISTINCT sym FROM logged) syms
      UNION ALL
      -- the ε-greedy choice is computed ONCE per level as a subquery
      -- column (z.ch) and referenced 12 times by name — the r8 hoist
      -- (same device as x481): textually expanding the GREATEST/argmax
      -- expression into every state update made each recursion level's
      -- projection tree enormous
      SELECT z.sym, z.rn,
             z.c0 + CASE WHEN z.ch = 0 AND z.arm = 0 THEN 1 ELSE 0 END,
             z.c1 + CASE WHEN z.ch = 1 AND z.arm = 1 THEN 1 ELSE 0 END,
             z.c2 + CASE WHEN z.ch = 2 AND z.arm = 2 THEN 1 ELSE 0 END,
             z.c3 + CASE WHEN z.ch = 3 AND z.arm = 3 THEN 1 ELSE 0 END,
             z.c4 + CASE WHEN z.ch = 4 AND z.arm = 4 THEN 1 ELSE 0 END,
             z.s0 + CASE WHEN z.ch = 0 AND z.arm = 0
                         THEN z.reward ELSE 0 END,
             z.s1 + CASE WHEN z.ch = 1 AND z.arm = 1
                         THEN z.reward ELSE 0 END,
             z.s2 + CASE WHEN z.ch = 2 AND z.arm = 2
                         THEN z.reward ELSE 0 END,
             z.s3 + CASE WHEN z.ch = 3 AND z.arm = 3
                         THEN z.reward ELSE 0 END,
             z.s4 + CASE WHEN z.ch = 4 AND z.arm = 4
                         THEN z.reward ELSE 0 END,
             z.matched + CASE WHEN z.ch = z.arm THEN 1 ELSE 0 END,
             z.total_r + CASE WHEN z.ch = z.arm
                              THEN z.reward ELSE 0 END
      FROM (
        SELECT o.sym, o.rn, o.arm, o.reward,
               r.c0, r.c1, r.c2, r.c3, r.c4,
               r.s0, r.s1, r.s2, r.s3, r.s4,
               r.matched, r.total_r,
               {chosen} AS ch
        FROM rec r JOIN logged o ON o.sym = r.sym AND o.rn = r.rn + 1
      ) z
    ),
    finals AS (
      SELECT sym, matched, total_r,
             ROW_NUMBER() OVER (PARTITION BY sym ORDER BY rn DESC) AS rk
      FROM rec
    )
    SELECT CAST(sym AS BIGINT) AS sym, matched AS matched_steps,
           total_r AS replay_reward,
           CASE WHEN matched > 0 THEN
             ROUND(CAST(total_r AS DOUBLE) / matched, 6)
           END AS policy_value
    FROM finals WHERE rk = 1 ORDER BY sym
"""


def _x522_chosen(intdiv: str) -> str:
    vals = [
        f"(r.s{j} * 1000000 {intdiv} (CASE WHEN r.c{j} > 0 THEN r.c{j} "
        f"ELSE 1 END))"
        for j in range(5)
    ]
    greatest = "GREATEST(" + ", ".join(vals) + ")"
    argmax = (
        "CASE "
        + " ".join(f"WHEN {vals[j]} = {greatest} THEN {j}" for j in range(5))
        + " END"
    )
    return (
        f"(CASE WHEN ((o.rn * 2654435761) {intdiv} 1024) % 10 < 2 "
        f"THEN ((o.rn * 2654435761) {intdiv} 1024) % 5 "
        f"ELSE {argmax} END)"
    )


@register(
    "x522_bandit_replay",
    oracle=_X522_ORACLE_TEMPLATE.format(
        arm_idx=_ARM_IDX_SQL, chosen=_x522_chosen("//"), horizon=_X522_HORIZON
    ),
    tags=("eval", "pandas"),
)
def x522_bandit_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-greedy replay per symbol OVER THE FIRST 500 STEPS PER SYMBOL
    (_X522_HORIZON; fixed evaluation budget à la Li et al. replay):
    Arrow fold with 10 integer state slots, exactly mirroring the
    recursive-CTE oracle (exploration from a deterministic step hash;
    argmax by scaled integer division with lowest-index tie-break).

    The horizon is part of the query DEFINITION as of r8 (not an
    optimization): above ~sf0.001 the per-sym end state differs from the
    unbounded-replay variant shipped before r8, so pre-r8 recorded
    results/hashes for this key are incomparable and must not be reused
    (advisor r8; no driver hash exists for this key, so no driver
    baseline is affected)."""
    import pandas as pd

    events = load_tables(spark, sf_dir)["events"]
    arm_idx = (
        "CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1 "
        "WHEN 'purchase' THEN 2 WHEN 'signup' THEN 3 ELSE 4 END"
    )
    logged = (
        events.where("value IS NOT NULL")
        .selectExpr(
            "user_id % 10 AS sym",
            f"{arm_idx} AS arm",
            "CASE WHEN (value - FLOOR(value)) >= 0.5 THEN 1 ELSE 0 END"
            " AS reward",
            "ts", "event_id",
        )
        # horizon cut JVM-side (WindowGroupLimit rank pushdown): only
        # H rows per symbol ever reach the Python fold, so the Arrow
        # transfer is O(syms x H) at any SF
        .withColumn(
            "__rn",
            F.row_number().over(
                W.partitionBy("sym").orderBy("ts", "event_id")
            ),
        )
        .where(F.col("__rn") <= _X522_HORIZON)
        .drop("__rn")
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"]).head(_X522_HORIZON)
        c = [0] * 5
        s = [0] * 5
        matched = 0
        total_r = 0
        rn = 0
        for arm, reward in zip(pdf["arm"].tolist(), pdf["reward"].tolist()):
            rn += 1
            h = (rn * 2654435761) // 1024
            if h % 10 < 2:
                chosen = h % 5
            else:
                vals = [
                    s[j] * 1000000 // (c[j] if c[j] > 0 else 1)
                    for j in range(5)
                ]
                best = max(vals)
                chosen = vals.index(best)
            if chosen == arm:
                matched += 1
                total_r += reward
                c[arm] += 1
                s[arm] += reward
        sym = int(pdf["sym"].iloc[0])
        return pd.DataFrame(
            {
                "sym": [sym],
                "matched_steps": [matched],
                "replay_reward": [total_r],
                "policy_value": [
                    round(total_r / matched, 6) if matched > 0 else None
                ],
            }
        )

    return (
        logged.groupBy("sym")
        .applyInPandas(
            fold,
            "sym bigint, matched_steps bigint, replay_reward bigint, "
            "policy_value double",
        )
        .orderBy("sym")
    )


# -- x523: IPS policy value ----------------------------------------------------------------

_X523 = """
    WITH logged AS (
      SELECT user_id % 10 AS sym, {hour} AS h,
             {arm_idx} AS arm,
             CASE WHEN (value - FLOOR(value)) >= 0.5 THEN 1 ELSE 0 END
               AS reward
      FROM events WHERE value IS NOT NULL
    ),
    props AS (
      SELECT sym, h, arm, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(COUNT(*)) OVER (PARTITION BY sym, h) AS BIGINT) AS n
      FROM logged GROUP BY sym, h, arm
    ),
    target AS (
      -- target policy: play the (sym, hour) majority arm
      SELECT sym, h, arm AS t_arm FROM (
        SELECT sym, h, arm,
               ROW_NUMBER() OVER (PARTITION BY sym, h
                                  ORDER BY c DESC, arm) AS rk
        FROM props
      ) p WHERE rk = 1
    ),
    weighted AS (
      -- reward * 1[target = logged] * n/c  (the 1/propensity weight,
      -- exact as an integer cross product against the final division)
      SELECT l.sym,
             CAST(SUM(CASE WHEN l.arm = t.t_arm
                           THEN l.reward * p.n ELSE 0 END
                      * 1000000 {intdiv} p.c) AS BIGINT) AS v_fp,
             CAST(COUNT(*) AS BIGINT) AS n_steps
      FROM logged l
      JOIN target t ON l.sym = t.sym AND l.h = t.h
      JOIN props p ON l.sym = p.sym AND l.h = p.h AND l.arm = p.arm
      GROUP BY l.sym
    )
    SELECT CAST(sym AS BIGINT) AS sym, n_steps,
           ROUND(CAST(v_fp AS DOUBLE) / n_steps / 1e6, 6)
             AS ips_policy_value
    FROM weighted ORDER BY sym
"""

register_sql(
    "x523_ips_policy_value",
    spark_sql=_X523.format(
        intdiv="DIV", hour="hour(ts)", arm_idx=_ARM_IDX_SQL
    ),
    duckdb_sql=_X523.format(
        intdiv="//", hour="CAST(EXTRACT(hour FROM ts) AS BIGINT)",
        arm_idx=_ARM_IDX_SQL,
    ),
    tags=("eval", "experiment"),
)

# -- x524: off-policy support audit -----------------------------------------------------------

_X524 = """
    WITH logged AS (
      SELECT {hour} AS h, {arm_idx} AS arm
      FROM events WHERE value IS NOT NULL
    ),
    cells AS (
      SELECT h, arm, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(COUNT(*)) OVER (PARTITION BY h) AS BIGINT) AS n_h
      FROM logged GROUP BY h, arm
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS observed_cells,
           CAST(24 * 5 AS BIGINT) AS possible_cells,
           CAST(SUM(CASE WHEN c >= 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS well_supported_cells,
           ROUND(CAST(MIN(CAST(c AS DOUBLE) / n_h) AS DOUBLE), 6)
             AS min_propensity,
           CASE WHEN MIN(CAST(c AS DOUBLE) / n_h) >= 0.01
                 AND COUNT(*) = 24 * 5 THEN 1 ELSE 0 END
             AS ips_trustworthy
    FROM cells
"""

register_sql(
    "x524_offpolicy_support",
    spark_sql=_X524.format(hour="hour(ts)", arm_idx=_ARM_IDX_SQL),
    duckdb_sql=_X524.format(
        hour="CAST(EXTRACT(hour FROM ts) AS BIGINT)", arm_idx=_ARM_IDX_SQL
    ),
    tags=("eval", "experiment"),
)
