"""Property tests for SQL-kernel waves: the registered DuckDB oracle runs
on randomized tiny tables and must match a brute-force Python reference.

Rationale: every registry key is already proven Spark==DuckDB hash-equal
on the fixtures (test_queries_oracle), so validating the SHARED SQL's
semantics against brute force on adversarial random inputs transfers to
the Spark side without paying a JVM round-trip per hypothesis example —
examples here are cheap (ms), so they can be many.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

BASE = dt.datetime(2024, 3, 1, 12, 0, 0)


def _oracle(key: str) -> str:
    from aetherium_trader_datapipeline_spark.queries import REGISTRY, _load_extensions

    _load_extensions()
    return REGISTRY[key].oracle


def _run(sql: str, **frames: pd.DataFrame):
    con = duckdb.connect()
    for name, df in frames.items():
        con.register(name, df)
    return con.execute(sql).fetchall()


# -- x351 largest remainder ----------------------------------------------------


@given(
    counts=st.lists(st.integers(min_value=1, max_value=500), min_size=1, max_size=12)
)
@settings(**SETTINGS)
def test_largest_remainder_quota_property(counts):
    customer = pd.DataFrame(
        {
            "c_custkey": range(sum(counts)),
            "c_nationkey": [n for n, c in enumerate(counts) for _ in range(c)],
        }
    )
    rows = _run(_oracle("x351_largest_remainder"), customer=customer)
    total = sum(counts)
    allocs = {r[0]: r[2] for r in rows}
    # exact-sum invariant, echoed by the query's own total_check column
    assert sum(allocs.values()) == 10000
    assert all(r[3] == 10000 for r in rows)
    # Hamilton satisfies quota: floor(exact) <= alloc <= ceil(exact)
    for n, c in enumerate(counts):
        exact = c * 10000 / total
        assert int(exact) <= allocs[n] <= int(exact) + 1


# -- x352 interval union -------------------------------------------------------


@given(
    iv=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # key
            st.integers(min_value=0, max_value=500),  # start offset s
            st.integers(min_value=0, max_value=60),  # duration s (value)
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**SETTINGS)
def test_interval_union_matches_bruteforce(iv):
    events = pd.DataFrame(
        {
            "event_id": range(len(iv)),
            "user_id": [k for k, _, _ in iv],
            "ts": [BASE + dt.timedelta(seconds=s) for _, s, _ in iv],
            "value": [float(d) for _, _, d in iv],
        }
    )
    rows = _run(_oracle("x352_interval_union"), events=events)
    got = {r[0]: (r[1], r[4]) for r in rows}  # k -> (n_islands, covered_us)

    # brute force per key: merge sorted [s, s+d) with the sweep
    for k in {x[0] for x in iv}:
        spans = sorted(
            (s * 1_000_000, (s + d) * 1_000_000) for kk, s, d in iv if kk == k
        )
        islands, cov, cur_s, cur_e = 0, 0, None, None
        for s, e in spans:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    cov += cur_e - cur_s
                islands, cur_s, cur_e = islands + 1, s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            cov += cur_e - cur_s
        # epoch offset cancels in duration; island count is offset-free
        assert got[k] == (islands, cov)


# -- x353 skyline --------------------------------------------------------------


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1),  # segment
            st.integers(min_value=0, max_value=50),  # custkey (unique-ified)
            st.integers(min_value=-1000, max_value=1000),  # balance dollars
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[1],
    )
)
@settings(**SETTINGS)
def test_skyline_matches_bruteforce(pts):
    customer = pd.DataFrame(
        {
            "c_custkey": [ck for _, ck, _ in pts],
            "c_mktsegment": [f"S{s}" for s, _, _ in pts],
            "c_acctbal": [float(b) for _, _, b in pts],
        }
    )
    rows = _run(_oracle("x353_skyline_2d"), customer=customer)
    got = {r[0]: (r[1], r[4]) for r in rows}  # seg -> (size, ck_checksum)

    for seg in {f"S{s}" for s, _, _ in pts}:
        mine = [(ck, b * 100) for s, ck, b in pts if f"S{s}" == seg]
        # dominance: maximize balance, minimize custkey; a point is on the
        # skyline iff no other point is >= in balance and <= in key with
        # one strict. Brute force O(n^2).
        sky = [
            (ck, b)
            for ck, b in mine
            if not any(
                (b2 >= b and ck2 <= ck and (b2 > b or ck2 < ck))
                for ck2, b2 in mine
            )
        ]
        assert got[seg] == (len(sky), sum(ck for ck, _ in sky))


# -- x338 triple barrier -------------------------------------------------------


@given(
    steps=st.lists(st.integers(min_value=-3, max_value=3), min_size=1, max_size=250),
)
@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
def test_triple_barrier_matches_bruteforce(steps):
    # one symbol (user_id = 0 => sym 0); px follows the query's own
    # derivation from `value`: px = 100 + frac(value)*10. Drive frac so
    # prices step deterministically in 0.1 units within [100, 110).
    fracs = []
    level = 30  # tenths, 0..99
    for s in steps:
        level = min(99, max(0, level + s))
        fracs.append(level / 100.0)  # value = k/100 -> frac*10 = k/10
    events = pd.DataFrame(
        {
            "event_id": range(1, len(steps) + 1),
            "user_id": [0] * len(steps),
            "ts": [BASE + dt.timedelta(seconds=i) for i in range(len(steps))],
            "value": [5.0 + f for f in fracs],  # ABS(value) irrelevant here
        }
    )
    rows = _run(_oracle("x338_triple_barrier"), events=events)
    got = {(r[0], r[1]): (r[2], r[3]) for r in rows}

    # brute force: px in micro units; anchors every 50th tick (rn%50==0)
    px = [100_000_000 + int(round(f * 10 * 1_000_000)) for f in fracs]
    want: dict[tuple[int, int], list[int]] = {}
    for a in range(49, len(px), 50):  # rn is 1-based; rn%50==0 -> idx 49
        a_px = px[a]
        first_up = first_dn = None
        horizon = px[a + 1 : a + 101]
        for j, p in enumerate(horizon):
            if first_up is None and p >= a_px + 2_000_000:
                first_up = j + 1
            if first_dn is None and p <= a_px - 2_000_000:
                first_dn = j + 1
            if first_up is not None and first_dn is not None:
                break
        if not horizon:
            continue  # anchor with empty horizon joins nothing
        if first_up is not None and (first_dn is None or first_up < first_dn):
            label, hold = 1, first_up
        elif first_dn is not None and (first_up is None or first_dn <= first_up):
            label, hold = -1, first_dn
        else:
            label, hold = 0, len(horizon)
        want.setdefault((0, label), []).append(hold)

    assert got == {k: (len(v), sum(v)) for k, v in want.items()}
