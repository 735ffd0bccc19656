"""Meta-blocking (operators/metablocking.py): weights + pruning semantics
on hand-computed graphs; scale invariants on the join strategy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osm_wikidata_spark.operators.metablocking import (
    block_edge_weights,
    prune_edges_cnp,
    prune_edges_wep,
)


def _weights(spark, rows, **kw):
    m = spark.createDataFrame(rows, "id bigint, block_key string")
    return block_edge_weights(m, **kw)


def test_cbs_and_jaccard_hand_computed(spark):
    # A:{b1,b2,b3} B:{b1,b2} C:{b3,b4}
    rows = [(1, "b1"), (1, "b2"), (1, "b3"), (2, "b1"), (2, "b2"), (3, "b3"), (3, "b4")]
    got = {(r.left_id, r.right_id): r for r in _weights(spark, rows).collect()}
    assert got[(1, 2)]["cbs"] == 2
    assert got[(1, 2)]["js"] == pytest.approx(2 / 3)  # 2/(3+2-2)
    assert got[(1, 3)]["cbs"] == 1
    assert got[(1, 3)]["js"] == pytest.approx(0.25)  # 1/(3+2-1)
    assert (2, 3) not in got  # no shared block


def test_duplicate_memberships_are_set_deduped(spark):
    rows = [(1, "b1"), (1, "b1"), (2, "b1")]
    got = _weights(spark, rows).collect()
    assert len(got) == 1
    assert got[0]["cbs"] == 1 and got[0]["js"] == 1.0


def test_max_block_cap_drops_megablock_observably(spark):
    # b_hot holds 4 ids; with max_block=3 it must emit no pairs but the
    # drop must surface via the sink; b_ok still pairs
    rows = [(i, "b_hot") for i in range(1, 5)] + [(1, "b_ok"), (2, "b_ok")]
    seen = {}
    got = _weights(
        spark,
        rows,
        max_block=3,
        dropped_sink=lambda df: seen.setdefault("rows", df.collect()),
    ).collect()
    assert {(r.left_id, r.right_id) for r in got} == {(1, 2)}
    assert [(r["block_key"], r["n"]) for r in seen["rows"]] == [("b_hot", 4)]
    # |B_i| stays PRE-cap: both endpoints have 2 blocks → js = 1/(2+2-1)
    assert got[0]["cbs"] == 1 and got[0]["js"] == pytest.approx(1 / 3)


def test_wep_keeps_at_or_above_mean(spark):
    rows = [
        (1, "x"), (2, "x"),          # (1,2): cbs 1
        (3, "y"), (3, "z"), (4, "y"), (4, "z"),  # (3,4): cbs 2, js 1.0
    ]
    w = _weights(spark, rows)
    kept = {(r.left_id, r.right_id) for r in prune_edges_wep(w).collect()}
    # uniform weights (both edges js=1.0): mean == every weight — WEP
    # discards only weights BELOW the average, so a uniform edge set
    # survives intact (a strict > would prune the common single-channel
    # blocking case to empty, a silent 100% recall loss)
    assert kept == {(1, 2), (3, 4)}
    # asymmetric weights: the below-mean edges drop, at-or-above survive
    rows2 = rows + [(5, "y"), (6, "q"), (6, "y")]
    w2 = _weights(spark, rows2)
    kept2 = {(r.left_id, r.right_id) for r in prune_edges_wep(w2).collect()}
    mean = w2.agg(F.avg("js")).first()[0]
    expect = {
        (r.left_id, r.right_id) for r in w2.collect() if r.js >= mean
    }
    assert kept2 == expect
    assert 0 < len(kept2) < w2.count()


def test_cnp_union_topk(spark):
    # star around node 1 with distinct weights; k=1 keeps each node's best
    # edge — union semantics keep an edge ranked top-1 by EITTHER endpoint
    rows = [
        (1, "a"), (2, "a"),                     # (1,2) js: 1/(3+1-1)=1/3
        (1, "b"), (3, "b"), (3, "b2"),          # (1,3): 1/(3+2-1)=0.25
        (1, "c"), (4, "c"), (4, "c2"), (4, "c3")  # (1,4): 1/(3+3-1)=0.2
    ]
    w = _weights(spark, rows)
    kept = {(r.left_id, r.right_id) for r in prune_edges_cnp(w, k=1).collect()}
    # node 1's top-1 is (1,2); nodes 2,3,4 each have only one edge, so the
    # union keeps all three edges
    assert kept == {(1, 2), (1, 3), (1, 4)}
    # k large keeps everything
    assert prune_edges_cnp(w, k=10).count() == w.count()


def test_cnp_deterministic_tiebreak(spark):
    # equal weights: ascending other-id wins the rank
    rows = [(1, "a"), (2, "a"), (1, "b"), (3, "b")]
    w = _weights(spark, rows)  # (1,2) and (1,3) both js = 1/2
    kept = {(r.left_id, r.right_id) for r in prune_edges_cnp(w, k=1).collect()}
    # node1 keeps (1,2); node2 keeps (1,2); node3 keeps (1,3) → union both
    assert kept == {(1, 2), (1, 3)}


def test_no_forced_broadcast_on_block_join(spark):
    """The block self-join and the count-dim joins must stay unhinted
    (data-dependent sizes — AQE decides); only WEP's 1-row mean may carry
    a broadcast hint."""
    m = spark.createDataFrame([(1, "b1"), (2, "b1")], "id bigint, block_key string")
    w = block_edge_weights(m)
    assert "ResolvedHint" not in w._jdf.queryExecution().analyzed().toString()


def test_wep_boundary_is_partitioning_invariant(spark):
    """Edges sitting exactly ON the mean must not flip in/out across
    partitionings: the mean and the comparison run in exact DECIMAL, so
    the kept set is a pure function of the data (a double avg is
    summation-order-dependent in its last ulp — with 0.1-step weights the
    float sum differs by partition order, which a >= boundary would
    amplify into a membership flip)."""
    rows = [
        (float(i % 10 + 1) / 10.0, i, i + 100_000) for i in range(2000)
    ]  # weights 0.1..1.0 uniformly -> mean exactly 0.55, on no edge;
    # add boundary edges AT a representable mean: shift to 0.1/0.3 mix
    rows += [(0.2, 90_000 + i, 190_000 + i) for i in range(100)]
    w = spark.createDataFrame(rows, "js double, left_id long, right_id long")
    kept_sets = []
    for parts in (1, 7, 32):
        kept = {
            (r.left_id, r.right_id)
            for r in prune_edges_wep(w.repartition(parts)).collect()
        }
        kept_sets.append(kept)
    assert kept_sets[0] == kept_sets[1] == kept_sets[2]
    assert 0 < len(kept_sets[0]) < w.count()
