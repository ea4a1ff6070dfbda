"""Wave 80 (x324–x326): feature engineering for model-ready training data.

x324 is the hashing trick (Weinberger et al. 2009) — the standard way to
get fixed-width feature vectors from unbounded vocabularies without a
driver-side dictionary: bucket = hash(token) mod 64 with a SECOND
independent hash choosing the sign, so colliding tokens cancel in
expectation instead of biasing the bucket upward.  Both hashes ride the
portable md5-prefix idiom (x129's), so Spark and DuckDB agree bit-for-bit
and the oracle is exact.  The output is the global collision profile per
bucket — occupancy, distinct tokens sharing the bucket, signed mass —
i.e. the diagnostic a user consults before picking the dimension.
At scale this is one token explode + one 64-group agg: map-side partial
combine does almost all the work, the shuffle carries ≤64 rows/task.

x325 is leave-one-out target encoding — the leakage-SAFE form of mean
encoding (plain group means leak each row's own target into its feature;
x302/x318 are this repo's other leakage guards): enc(row) =
(Σ_group target − own target)/(n−1).  Account balances are recovered as
exact integer cents (ROUND-then-CAST, the x323 note), the group sum is
one window aggregate over the nation partition, and each row's encoding
is quantized to milli-cents BEFORE the per-nation summary so every
cross-row sum is integer-exact.  One shuffle on the encode key, total.

x326 is mutual information between two metadata columns (lang ×
source) — the quick dependence screen run before stratifying or
rebalancing a corpus.  Counts and margins are exact integers (margins
via window sums over the cell table — no second scan); each cell row
carries its own PMI and MI contribution as per-row rounded doubles, so
no cross-row float accumulation exists; the scalar MI is the (exact)
sum of the reported terms, left to the reader by design.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

_HEX8_SPARK = "CAST(CONV(SUBSTRING(MD5({x}), 1, 8), 16, 10) AS BIGINT)"
_HEX8_DUCK = "('0x' || SUBSTRING(MD5({x}), 1, 8))::BIGINT"

# -- x324: feature hashing -----------------------------------------------------

_X324 = """
    WITH toks AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id, {unnest_tok} AS tok FROM documents
      ) t WHERE tok <> ''
    ),
    hashed AS (
      SELECT doc_id, tok,
             {h} % 64 AS bucket,
             CASE WHEN {h2} % 2 = 0 THEN 1 ELSE -1 END AS sign
      FROM toks
    ),
    grid AS (
      -- collapse the token stream to the (bucket, doc, tok) grid FIRST:
      -- the multi-COUNT(DISTINCT) over raw tokens planned as a 3x row
      -- EXPAND of the whole token stream; after this map-side-partial
      -- collapse the expand touches only distinct per-doc tokens, and
      -- n_tok / signed_mass re-aggregate exactly from the carried counts
      -- (sign is a pure function of tok, so sign * c is exact) (r12)
      SELECT bucket, doc_id, tok, sign, COUNT(*) AS c
      FROM hashed GROUP BY bucket, doc_id, tok, sign
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(SUM(c) AS BIGINT) AS n_tok,
           CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct_tok,
           CAST(SUM(sign * c) AS BIGINT) AS signed_mass,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM grid GROUP BY bucket ORDER BY bucket
"""

register_sql(
    "x324_feature_hashing",
    spark_sql=_X324.format(
        unnest_tok="explode(split(lower(text), ' '))",
        h=_HEX8_SPARK.format(x="tok"),
        h2=_HEX8_SPARK.format(x="CONCAT('s:', tok)"),
    ),
    duckdb_sql=_X324.format(
        unnest_tok="unnest(string_split(lower(text), ' '))",
        h=_HEX8_DUCK.format(x="tok"),
        h2=_HEX8_DUCK.format(x="CONCAT('s:', tok)"),
    ),
    tags=("training", "textops"),
)

# -- x325: leave-one-out target encoding ---------------------------------------
# cents ≤ ~1e6 and group sums ≤ ~1e9, so the milli-cent quantization's
# double intermediate is far inside 2^53 — FLOOR is exact.

_X325 = """
    WITH cents AS (
      SELECT c_custkey, c_nationkey,
             CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_c
      FROM customer
    ),
    grouped AS (
      SELECT c_custkey, c_nationkey, bal_c,
             SUM(bal_c) OVER (PARTITION BY c_nationkey) AS grp_sum,
             COUNT(*) OVER (PARTITION BY c_nationkey) AS grp_n
      FROM cents
    ),
    enc AS (
      SELECT c_nationkey,
             CAST(FLOOR((grp_sum - bal_c) * 1000.0 / (grp_n - 1)) AS BIGINT)
               AS loo_mc
      FROM grouped WHERE grp_n > 1
    )
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_cust,
           CAST(MIN(loo_mc) AS BIGINT) AS min_loo_mc,
           CAST(MAX(loo_mc) AS BIGINT) AS max_loo_mc,
           ROUND(CAST(CAST(SUM(CAST(loo_mc AS DECIMAL(18,0))) AS DECIMAL(38,0))
                      AS DOUBLE) / COUNT(*) / 100000, 4) AS avg_loo_dollars
    FROM enc GROUP BY c_nationkey ORDER BY nationkey
"""

register_sql(
    "x325_target_encoding_loo",
    spark_sql=_X325,
    duckdb_sql=_X325,
    tags=("training", "window"),
)

# -- x326: mutual information lang × source ------------------------------------

_X326 = """
    WITH cells AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_xy
      FROM documents GROUP BY lang, source
    ),
    margins AS (
      SELECT lang, source, n_xy,
             SUM(n_xy) OVER (PARTITION BY lang) AS n_x,
             SUM(n_xy) OVER (PARTITION BY source) AS n_y,
             SUM(n_xy) OVER () AS n
      FROM cells
    )
    SELECT lang, source, n_xy,
           ROUND(CAST(n_xy AS DOUBLE) / n, 6) AS p_xy,
           ROUND(LN(CAST(n_xy AS DOUBLE) * n / (CAST(n_x AS DOUBLE) * n_y)), 6)
             AS pmi,
           ROUND(CAST(n_xy AS DOUBLE) / n
                 * LN(CAST(n_xy AS DOUBLE) * n / (CAST(n_x AS DOUBLE) * n_y)), 8)
             AS mi_term
    FROM margins ORDER BY lang, source
"""

register_sql(
    "x326_mutual_information",
    spark_sql=_X326,
    duckdb_sql=_X326,
    tags=("training", "audit"),
)
