"""Twenty-eighth extension wave — portable probabilistic sketches, both
DuckDB hash-verified despite being "approximate" algorithms.

The trick (same as x129/x130's portable MinHash/SimHash): derive every
hash from md5, which all SQL engines evaluate bit-identically, so the
sketch itself — not just its accuracy bound — is deterministic and the
driver can hash-verify the full pipeline. The production analogues on
xxhash64 (operators/sketches.py, x53) stay as the fast path; these are
the cross-engine verification forms.

x187 HyperLogLog   64 registers, exact Σ2^-M (powers of two sum exactly
                   in ≤33 bits of mantissa, so the float total is
                   order-free), small-range correction included.
x188 count-min     d=4 × w=512 integer sketch; estimates for the exact
                   top-20 tokens, overestimate bias visible in-result.

Scale shape: both collapse the corpus into a fixed-size mergeable state
(64 registers / 2048 cells) with one groupBy each — the 100 TB rollup
pattern where per-partition sketches combine associatively. The register
MAX and cell SUM are Spark partial aggregates, so the shuffle carries at
most m rows per partition, not the token stream.
"""

from __future__ import annotations

from aetherium_trader_datapipeline_spark.queries import register_sql

# dialect shims: hex→int, integer division, left shift
_SPARK = {
    "hex8": "CAST(CONV(SUBSTRING(MD5({x}), 1, 8), 16, 10) AS BIGINT)",
    "idiv": "{a} DIV {b}",
    "shl1": "SHIFTLEFT(CAST(1 AS BIGINT), {n})",
    "tok": "SELECT lang, explode(split(lower(text), ' ')) AS w FROM documents",
}
_DUCK = {
    "hex8": "('0x' || SUBSTRING(MD5({x}), 1, 8))::BIGINT",
    "idiv": "{a} // {b}",
    "shl1": "(CAST(1 AS BIGINT) << {n})",
    "tok": "SELECT lang, unnest(string_split(lower(text), ' ')) AS w FROM documents",
}

# -- x187: portable HyperLogLog (m = 64 registers, b = 6 index bits) -------
# h is 32 md5 bits: low 6 → register index, high 26 → pattern field.
# rho = 26 - floor(log2(pattern)) (27 when the field is zero). Registers
# never touched contribute 2^0 = 1 to Z. Since every 2^-M term is an exact
# power of two ≥ 2^-27 and there are ≤64 of them, Z is exact in a double
# no matter the accumulation order — the whole estimate is deterministic.


def _x187(d: dict, fused: bool = False) -> str:
    hv = d["hex8"].format(x="w")
    pat = d["idiv"].format(a="hv", b="64")
    shl = d["shl1"].format(n="m")
    if fused:
        # r13 Spark-side shape (oracle keeps the textbook two-pass form):
        # `words` was referenced twice — once through h→reg→z and once by
        # `exact` — and CTE inlining re-ran the explode+DISTINCT subtree
        # per reference (plan: 2 parquet scans, 7 exchanges; guide §2.4).
        # Every distinct word lands in exactly ONE register (hv % 64), so
        # exact_distinct ≡ SUM of per-register word counts — the exact
        # count rides the same aggregation chain and the join disappears.
        # Integer sums are order-free, z terms are untouched, so the
        # result is bit-identical. After: 1 scan, 4 exchanges.
        return f"""
    WITH words AS (
      SELECT lang, w FROM ({d['tok']}) t
      WHERE w IS NOT NULL AND w <> '' GROUP BY lang, w
    ),
    h AS (SELECT lang, {hv} AS hv FROM words),
    reg AS (
      SELECT lang, hv % 64 AS idx,
             MAX(CASE WHEN {pat} = 0 THEN 27
                      ELSE 26 - CAST(FLOOR(LOG2(CAST({pat} AS DOUBLE))) AS INT)
                 END) AS m,
             CAST(COUNT(*) AS BIGINT) AS nw
      FROM h GROUP BY lang, hv % 64
    ),
    est AS (
      SELECT lang,
             CAST(SUM(nw) AS BIGINT) AS exact_distinct,
             SUM(1.0 / {shl}) + (64 - COUNT(*)) AS zsum,
             64 - CAST(COUNT(*) AS BIGINT) AS zeros
      FROM reg GROUP BY lang
    )
    SELECT lang, exact_distinct,
           ROUND(CASE WHEN (0.709 * 64 * 64 / zsum) <= 160 AND zeros > 0
                      THEN 64 * LN(64.0 / zeros)
                      ELSE 0.709 * 64 * 64 / zsum END, 2) AS hll_estimate,
           ROUND(ABS((CASE WHEN (0.709 * 64 * 64 / zsum) <= 160 AND zeros > 0
                           THEN 64 * LN(64.0 / zeros)
                           ELSE 0.709 * 64 * 64 / zsum END) - exact_distinct)
                 / exact_distinct, 4) AS rel_err
    FROM est ORDER BY lang
"""
    return f"""
    WITH words AS (
      SELECT DISTINCT lang, w FROM ({d['tok']}) t WHERE w IS NOT NULL AND w <> ''
    ),
    h AS (SELECT lang, {hv} AS hv FROM words),
    reg AS (
      SELECT lang, hv % 64 AS idx,
             MAX(CASE WHEN {pat} = 0 THEN 27
                      ELSE 26 - CAST(FLOOR(LOG2(CAST({pat} AS DOUBLE))) AS INT)
                 END) AS m
      FROM h GROUP BY lang, hv % 64
    ),
    z AS (
      SELECT lang,
             SUM(1.0 / {shl}) AS z_present,
             CAST(COUNT(*) AS BIGINT) AS n_present
      FROM reg GROUP BY lang
    ),
    exact AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS exact_distinct FROM words GROUP BY lang),
    est AS (
      SELECT z.lang, exact_distinct,
             z_present + (64 - n_present) AS zsum,
             64 - n_present AS zeros
      FROM z JOIN exact ON z.lang = exact.lang
    )
    SELECT lang, exact_distinct,
           ROUND(CASE WHEN (0.709 * 64 * 64 / zsum) <= 160 AND zeros > 0
                      THEN 64 * LN(64.0 / zeros)
                      ELSE 0.709 * 64 * 64 / zsum END, 2) AS hll_estimate,
           ROUND(ABS((CASE WHEN (0.709 * 64 * 64 / zsum) <= 160 AND zeros > 0
                           THEN 64 * LN(64.0 / zeros)
                           ELSE 0.709 * 64 * 64 / zsum END) - exact_distinct)
                 / exact_distinct, 4) AS rel_err
    FROM est ORDER BY lang
"""


register_sql(
    "x187_hll_portable",
    spark_sql=_x187(_SPARK, fused=True),
    duckdb_sql=_x187(_DUCK),
    headline=True,
    tags=("sketch", "llm"),
)

# -- x188: portable count-min sketch (d = 4 rows, w = 512 buckets) ---------
# Pure integer arithmetic end to end: cell totals are exact SUMs, the
# estimate is the MIN over the 4 row-wise cells a token maps to, and the
# overestimate (cms - exact >= 0 always) is emitted per token. The cells
# relation is d*w = 2048 rows whatever the corpus size — the mergeable
# fixed-memory frequency summary.


def _x188(d: dict) -> str:
    def cell_hash(i_ref: str, tok_ref: str) -> str:
        x = f"CONCAT(CAST({i_ref} AS STRING), '|', {tok_ref})"
        return d["hex8"].format(x=x) + " % 512"

    return f"""
    WITH toks AS (
      SELECT w AS tok FROM ({d['tok']}) t WHERE w IS NOT NULL AND w <> ''
    ),
    cnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY tok),
    seeds AS (SELECT CAST(i AS INT) AS i FROM (VALUES (0), (1), (2), (3)) s(i)),
    cells AS (
      SELECT i, {cell_hash('i', 'tok')} AS b, SUM(c) AS total
      FROM cnt CROSS JOIN seeds GROUP BY i, {cell_hash('i', 'tok')}
    ),
    top AS (SELECT tok, c FROM cnt ORDER BY c DESC, tok LIMIT 20),
    probes AS (
      SELECT t.tok, t.c, s.i, {cell_hash('s.i', 't.tok')} AS b
      FROM top t CROSS JOIN seeds s
    )
    SELECT p.tok, MIN(p.c) AS exact_count,
           CAST(MIN(cl.total) AS BIGINT) AS cms_estimate,
           CAST(MIN(cl.total) - MIN(p.c) AS BIGINT) AS overestimate
    FROM probes p JOIN cells cl ON p.i = cl.i AND p.b = cl.b
    GROUP BY p.tok
    ORDER BY exact_count DESC, tok
"""


register_sql(
    "x188_cms_topk",
    spark_sql=_x188(_SPARK),
    duckdb_sql=_x188(_DUCK),
    tags=("sketch", "llm"),
)
