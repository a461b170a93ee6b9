"""Value-level invariant tier for iterative/fixpoint operators.

Round-10 postmortem (VERDICT r10): the round-6 connected components
returned wrong labels for 551/2432 sf10 nodes for four rounds because the
sf0.01 oracle converges early and the scale sweep proves execution, not
values. These tests run tools/invariant_check.py's first-principles
re-derivations in CI at the small fixture, and the sweep harness runs the
same module at sf10+ (SWEEP artifacts carry the results) — so every
data-shape-dependent operator has a value check at BOTH scales.

The adversarial fixtures here are chosen to go red under the round-6
failure mode specifically: a path graph deeper than any fixed iteration
guard that a propagation-style algorithm could silently truncate.
"""

import os
import sys

import pyspark.sql.functions as F
import pytest

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from invariant_check import (  # noqa: E402
    check_bfs,
    check_cc,
    check_lloyd,
    check_pagerank,
)

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_cc_labels_match_driver_union_find(spark):
    res = check_cc(spark, SF)
    assert res["status"] == "ok", res
    assert res["n_mismatched_labels"] == 0


def test_bfs_hops_match_driver_bfs(spark):
    res = check_bfs(spark, SF)
    assert res["status"] == "ok", res


def test_pagerank_mass_conservation(spark):
    res = check_pagerank(spark, SF)
    assert res["status"] == "ok", res
    # the integer formulation only ever DROPS mass (floor division), so the
    # total must sit strictly within the analytic envelope
    assert res["total_mass"] <= res["mass_ceiling"]
    assert res["min_score"] >= res["base"]


def test_lloyd_assignment_is_argmax(spark):
    res = check_lloyd(spark, SF)
    assert res["status"] == "ok", res
    assert res["argmax_violations"] == 0


def test_cc_deep_path_exact_vs_union_find(spark):
    """The 551-node regression, distilled: a 120-node path graph needs 119
    propagation rounds for min-label (the round-6 algorithm's guard was
    25 — it would return partially-propagated labels here), while star
    contraction needs O(log^2 n). Labels must equal the driver-side
    union-find result EXACTLY, not merely converge."""
    from go_pq_cdc_kafka_spark.operators import cluster as CL

    edges = [(i, i + 1) for i in range(1, 120)] + [(500, 501), (501, 503)]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        (r.doc_id, r.cluster_id)
        for r in CL.connected_components(pairs).collect()
    }
    want = {(i, 1) for i in range(1, 121)} | {(500, 500), (501, 500), (503, 500)}
    assert got == want
