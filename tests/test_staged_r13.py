"""Driver-fidelity verification of the STAGED r13 wave
(queries_staged_r13.py — NOT registered; the registry stays frozen at
575).  Uses the exact canonicalize-and-diff gate the sweep and the
driver replica use, so promotion at the unfreeze is a code move, not a
re-verification."""

from __future__ import annotations

import pytest

from aetherium_trader_datapipeline_spark.queries_staged_r13 import STAGED
from tests.conftest import SF_DIR
from tests.oracle import compare


def test_staged_wave_is_not_registered():
    """The freeze contract: staging must not touch the live registry."""
    from aetherium_trader_datapipeline_spark.queries import REGISTRY

    assert not set(STAGED) & set(REGISTRY)
    assert len(STAGED) == 7


@pytest.mark.parametrize("key", sorted(STAGED))
def test_staged_query_matches_oracle(spark, key):
    run, oracle = STAGED[key]
    problems = compare(run(spark, SF_DIR), oracle, SF_DIR, key=key)
    assert not problems, problems
