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


def test_driver_window_rotates_past_checked_rounds():
    """The first 50 registry entries (the driver's correctness window) must
    avoid every query a prior round's driver gate already verified, so
    independent driver coverage grows each round."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        checked.update(json.load(open(path)).keys())
    window = list(REGISTRY)[:50]
    overlap = [n for n in window if n in checked]
    # allow overlap only once every query has been driver-checked already
    assert not overlap or len(checked) >= len(REGISTRY), overlap


def test_registry_size_and_shape():
    assert len(REGISTRY) >= 100
    for name, q in REGISTRY.items():
        assert q.name == name
        assert callable(q.fn)
        assert q.oracle is None or "SELECT" in q.oracle.upper()
