"""large-star/small-star CC vs the networkx oracle (SURVEY.md §5.2,
FIXTURES.md F3 cc_edges cases): path, star, two components,
self-loops, 64-bit boundary ids, random graphs."""

import numpy as np
import pytest

from oracle.cc import cc_labels as oracle_cc

CASES = {
    "path": [(1, 2), (2, 3), (3, 4), (4, 5)],
    "star": [(10, 1), (10, 2), (10, 3)],
    "two_components": [(1, 2), (2, 3), (7, 8), (8, 9)],
    "self_loop": [(5, 5), (5, 6)],
    "boundary_ids": [(-(2**63), 2**63 - 1), (2**63 - 1, 0), (-1, -2)],
    "chain_long": [(i, i + 1) for i in range(40)],
    "duplicate_edges": [(1, 2), (2, 1), (1, 2), (2, 3)],
    "singleton_nodes": [(1, 2)],  # nodes arg adds isolated 99
}


def spark_cc(spark, edges, nodes):
    from miekki.stages.cc import cc_labels

    e = spark.createDataFrame(edges or [(0, 0)], "src long, dst long")
    if not edges:
        e = e.limit(0)
    n = spark.createDataFrame([(x,) for x in nodes], "doc_id long")
    rows = cc_labels(e, n).collect()
    return {r.doc_id: r.cluster_id for r in rows}


@pytest.mark.parametrize("name", sorted(CASES))
def test_cc_cases(spark, name):
    edges = CASES[name]
    nodes = sorted({x for e in edges for x in e} | {99})
    assert spark_cc(spark, edges, nodes) == oracle_cc(edges, nodes)


def test_cc_empty_edges(spark):
    assert spark_cc(spark, [], [1, 2, 3]) == {1: 1, 2: 2, 3: 3}


def test_cc_random_graphs(spark):
    rng = np.random.Generator(np.random.PCG64(5))
    for n_nodes, n_edges in [(50, 40), (200, 150), (100, 300)]:
        ids = np.unique(rng.integers(-(2**62), 2**62, size=n_nodes))
        src = rng.choice(ids, size=n_edges)
        dst = rng.choice(ids, size=n_edges)
        edges = [(int(a), int(b)) for a, b in zip(src, dst)]
        assert spark_cc(spark, edges, ids.tolist()) == oracle_cc(edges, ids.tolist())


def test_fused_round_is_three_exchanges(spark):
    """The r4 claim behind fused_star_round — one Exchange per star
    window plus the round-end distinct, with the shared small-star
    subtree served by exchange reuse — pinned at the plan level so a
    regression back to the ~8-stage groupBy+join shape is caught."""
    import io
    import re
    from contextlib import redirect_stdout

    from miekki.stages.cc import fused_star_round

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (6, 7), (1, 7)], "src long, dst long")
    buf = io.StringIO()
    with redirect_stdout(buf):
        fused_star_round(e).explain("formatted")
    plan = buf.getvalue()
    # formatted explain lists every operator once in the tree and once
    # as a "(n) Exchange" detail header — count the headers
    real = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert real <= 3, plan


def test_fused_round_matches_two_star_composition(spark):
    """fused_star_round (the r4 3-exchange window round used by
    cc_fixpoint) must emit exactly the edge SET of
    small_star(large_star(e)) — on named cases AND random graphs,
    including negative/boundary ids where binary-comparison bugs in
    the window min would show up."""
    from miekki.stages.cc import fused_star_round, large_star, small_star

    rng = np.random.Generator(np.random.PCG64(11))
    graphs = list(CASES.values())
    for n_nodes, n_edges in [(60, 80), (150, 120)]:
        ids = np.unique(rng.integers(-(2**62), 2**62, size=n_nodes))
        graphs.append([(int(a), int(b)) for a, b in zip(
            rng.choice(ids, size=n_edges), rng.choice(ids, size=n_edges))])
    for edges in graphs:
        e = (spark.createDataFrame(edges, "src long, dst long")
             .where("src != dst").distinct())
        want = {(r.src, r.dst)
                for r in small_star(large_star(e)).collect()}
        got = {(r.src, r.dst) for r in fused_star_round(e).collect()}
        assert got == want, (sorted(got - want)[:5], sorted(want - got)[:5])
