"""Replicates the driver's t2 check locally (sf0.001 for speed): every registered
query with an oracle must match DuckDB on row count, column names, and
order-insensitive values. Queries without an oracle must at least run and return a
stable schema."""

from __future__ import annotations

import pytest

from kda_flink_demo_spark import registry
from tests.conftest import SF_DIR
from tests.oracle import compare_to_oracle, duck_connect

ORACLES = registry.oracle_sql()
ALL = registry.queries()


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    df = ALL[name](spark, SF_DIR)
    compare_to_oracle(df, duck, ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(ALL) - set(ORACLES)))
def test_oracle_free_query_runs(spark, name):
    df = ALL[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_driver_window_pins_core_and_rotates_tail(monkeypatch):
    """The first-50 correctness window must always contain the pinned core,
    and the tail slice must rotate deterministically with the round seed so
    every query is periodically externally verified."""
    from kda_flink_demo_spark import registry

    names_by_seed = {}
    for seed in (0, 1, 2, 3, 7):
        monkeypatch.setattr(registry, "_round_seed", lambda s=seed: s)
        ordered = registry._ordered()
        assert sorted(ordered) == sorted(registry._REGISTRY)  # nothing lost
        window = ordered[:50]
        for core in registry._DRIVER_PRIORITY:
            assert core in window
        names_by_seed[seed] = tuple(window)
    # rotation actually changes the exposed tail across rounds
    assert len(set(names_by_seed.values())) > 1
    # same seed → same order (stable within a round)
    monkeypatch.setattr(registry, "_round_seed", lambda: 3)
    assert tuple(registry._ordered()) == tuple(registry._ordered())
    # over enough rounds, every registered query appears in some window
    exposed = set()
    slots = 50 - len([n for n in registry._DRIVER_PRIORITY if n in registry._REGISTRY])
    rest = len(registry._REGISTRY) - (50 - slots)
    for seed in range((rest // max(slots, 1)) + 2):
        monkeypatch.setattr(registry, "_round_seed", lambda s=seed: s)
        exposed.update(registry._ordered()[:50])
    assert exposed == set(registry._REGISTRY)
