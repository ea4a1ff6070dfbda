"""Thirty-first extension wave — warehouse-maintenance operators: SCD2
history build, CDC snapshot materialization, and an explicit Bloom-filter
join-prune whose bit math is engine-deterministic.

These are the table-maintenance queries a lakehouse pipeline runs around
the ingest path (operators/merge.py upsert + compaction are the write
side; these are the derive side).

x193 scd2_history   slowly-changing-dimension type 2: collapse each key's
                    attribute stream into validity ranges via the
                    gaps-and-islands change-counter (LAG ≠ → running SUM),
                    LEAD for valid_to, open-ended row flagged current.
                    One window partition per key — single shuffle.
x194 cdc_snapshot   Debezium-style materialization: latest op per key by
                    (ts, event_id) total order, tombstones ('D') drop the
                    key from the snapshot; change counts retained.
x195 bloom_prune    252-bit (4 x 63 usable bits per BIGINT word) / 3-hash Bloom filter built from the dim-side
                    key set as 4 (word, mask) rows — md5-derived bits, so
                    both engines build the identical filter — probed by
                    the fact side; emits candidate vs exact counts and
                    the realized false-positive rate. This is the runtime
                    row-group-pruning pattern (ship 32 bytes, skip the
                    shuffle for provably-absent keys).
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

_X193_BODY = """
    WITH ch AS (
      SELECT user_id, ts, event_id, event_type AS attr,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    marked AS (
      SELECT user_id, ts, event_id, attr,
             CASE WHEN prev IS NULL OR prev <> attr THEN 1 ELSE 0 END AS chg
      FROM ch
    ),
    grp AS (
      SELECT user_id, ts, attr,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS g
      FROM marked
    ),
    per AS (
      SELECT user_id, g, MIN(attr) AS attr, MIN(ts) AS valid_from,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM grp GROUP BY user_id, g
    )
    SELECT user_id, attr,
           CAST(valid_from AS TIMESTAMP) AS valid_from,
           CAST(LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY g)
                AS TIMESTAMP) AS valid_to,
           CAST(CASE WHEN LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY g)
                     IS NULL THEN 1 ELSE 0 END AS INT) AS is_current,
           n_events
    FROM per ORDER BY user_id, valid_from LIMIT 500
"""

register_sql(
    "x193_scd2_history",
    spark_sql=_X193_BODY,
    duckdb_sql=_X193_BODY,
    tags=("warehouse", "window"),
)

_X194_BODY = """
    WITH ops AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN value < 5 THEN 'D' ELSE 'U' END AS op
      FROM events
    ),
    latest AS (
      SELECT user_id, op, value, ts, n_changes FROM (
        SELECT user_id, op, value, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rk,
               CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT) AS n_changes
        FROM ops
      ) r WHERE rk = 1
    )
    SELECT user_id, ROUND(value, 4) AS last_value,
           CAST(ts AS TIMESTAMP) AS last_ts, n_changes
    FROM latest WHERE op <> 'D'
    ORDER BY user_id LIMIT 500
"""

register_sql(
    "x194_cdc_snapshot",
    spark_sql=_X194_BODY,
    duckdb_sql=_X194_BODY,
    tags=("warehouse", "cdc"),
)

# -- x195: deterministic Bloom-filter join pruning --------------------------
# dim keys: high-balance customers; fact side: orders. 3 hash functions
# from md5('<seed>|<key>'), 256 bits packed into 4 BIGINT words.

_SPARK_B = {
    "hex8": "CAST(CONV(SUBSTRING(MD5({x}), 1, 8), 16, 10) AS BIGINT)",
    "shl": "SHIFTLEFT(CAST(1 AS BIGINT), CAST({n} AS INT))",
    "idiv": "{a} DIV {b}",
}
_DUCK_B = {
    "hex8": "('0x' || SUBSTRING(MD5({x}), 1, 8))::BIGINT",
    "shl": "(CAST(1 AS BIGINT) << CAST({n} AS INT))",
    "idiv": "{a} // {b}",
}


def _x195(d: dict) -> str:
    def bits(i_ref: str, key_ref: str) -> tuple[str, str]:
        h = d["hex8"].format(x=f"CONCAT(CAST({i_ref} AS STRING), '|', CAST({key_ref} AS STRING))")
        bit = f"({h} % 252)"
        word = d["idiv"].format(a=bit, b="63")
        mask = d["shl"].format(n=f"{bit} % 63")
        return word, mask

    kw, km = bits("i", "c_custkey")
    pw, pm = bits("s.i", "p.k")
    return f"""
    WITH dim AS (
      SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    ),
    seeds AS (SELECT CAST(i AS INT) AS i FROM (VALUES (0), (1), (2)) s(i)),
    bloom AS (
      SELECT {kw} AS word, BIT_OR({km}) AS mask
      FROM dim CROSS JOIN seeds
      GROUP BY {kw}
    ),
    probes AS (SELECT DISTINCT o_custkey AS k FROM orders),
    probe_bits AS (
      SELECT p.k, s.i, {pw} AS word, {pm} AS bitmask
      FROM probes p CROSS JOIN seeds s
    ),
    hits AS (
      SELECT pb.k, CAST(COUNT(*) AS BIGINT) AS n_set
      FROM probe_bits pb JOIN bloom b
        ON pb.word = b.word AND (b.mask & pb.bitmask) <> 0
      GROUP BY pb.k
    ),
    cand AS (SELECT k FROM hits WHERE n_set = 3),
    exact AS (SELECT DISTINCT o_custkey AS k FROM orders
              WHERE o_custkey IN (SELECT c_custkey FROM dim)),
    m AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM dim) AS n_dim_keys,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM probes) AS n_probes,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM exact) AS n_true
    )
    SELECT n_dim_keys, n_probes, n_candidates, n_true,
           CAST(n_candidates - n_true AS BIGINT) AS n_false_pos,
           ROUND(CAST(n_candidates - n_true AS DOUBLE)
                 / NULLIF(n_probes - n_true, 0), 6) AS fp_rate
    FROM m
"""


register_sql(
    "x195_bloom_prune",
    spark_sql=_x195(_SPARK_B),
    duckdb_sql=_x195(_DUCK_B),
    tags=("warehouse", "join", "sketch"),
)
