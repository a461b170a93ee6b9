"""Registry invariants: unique names, and entry hygiene the driver relies on."""

import pytest

from go_pq_cdc_kafka_spark.queries import REGISTRY, register


def test_duplicate_registration_raises():
    existing = next(iter(REGISTRY))
    original = REGISTRY[existing].fn

    def _dupe(spark, sf_dir):  # pragma: no cover - never invoked
        raise AssertionError

    with pytest.raises(ValueError, match="registered twice"):
        register(existing, oracle=None, category="test")(_dupe)

    # the guard must not have clobbered the original entry
    assert REGISTRY[existing].fn is original


def test_registry_is_hermetic_registration_order():
    """Importing the library must NOT reorder REGISTRY from harness output
    files (CORRECTNESS_r*.json) — iteration order is registration order,
    whatever the working tree contains. (The rotation lives in
    __spark_entry__.queries(), the driver invocation path.)"""
    names = list(REGISTRY)
    # agg_pricing_summary is the first @register call in queries.py; if
    # import-time rotation ever comes back, a checked query like this one
    # would no longer lead the dict once CORRECTNESS files exist.
    assert names[0] == "agg_pricing_summary", names[:3]


def test_driver_window_rotation_invariants():
    """driver_window_order(): every never-driver-checked oracle query sorts
    before every checked one (so the 50-entry driver window grows
    independent coverage each round), and every rows-only query sorts after
    ALL oracle-checkable ones (so no window slot reports no_oracle).
    Registration order is preserved within each tier."""
    from go_pq_cdc_kafka_spark.queries import (
        _driver_checked_so_far,
        driver_window_order,
    )

    order = driver_window_order()
    assert sorted(order) == sorted(REGISTRY)

    checked = _driver_checked_so_far()
    tiers = [
        0 if REGISTRY[n].oracle is not None and n not in checked
        else 1 if REGISTRY[n].oracle is not None
        else 2
        for n in order
    ]
    assert tiers == sorted(tiers), "tier ordering violated"

    reg_pos = {n: i for i, n in enumerate(REGISTRY)}
    for t in (0, 1, 2):
        within = [reg_pos[n] for n, tt in zip(order, tiers) if tt == t]
        assert within == sorted(within), f"tier {t} not in registration order"


def test_spark_entry_window_fronts_fresh_queries():
    """The actual driver contract (__spark_entry__.queries()) must apply
    the rotation: its first entries are exactly driver_window_order()."""
    import importlib.util
    import os

    from go_pq_cdc_kafka_spark.queries import driver_window_order

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "_spark_entry_under_test", os.path.join(root, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert list(mod.queries()) == driver_window_order()
    oracles = mod.oracle_sql()
    assert all(REGISTRY[n].oracle == sql for n, sql in oracles.items())


def test_registry_size_and_shape():
    assert len(REGISTRY) >= 100
    for name, q in REGISTRY.items():
        assert q.name == name
        assert callable(q.fn)
        assert q.oracle is None or "SELECT" in q.oracle.upper()
