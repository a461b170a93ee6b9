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


def test_registry_size_and_shape():
    assert len(REGISTRY) >= 100
    for name, q in REGISTRY.items():
        assert q.name == name
        assert callable(q.fn)
        assert q.oracle is None or "SELECT" in q.oracle.upper()
