"""The connected-components oracle device vs an independent union-find.

``dedup_cluster_assignment``'s DuckDB oracle stands on
``driver_queries._cc_propagation_ctes`` — an UNROLLED min-label
propagation + pointer-jumping chain that replaced the O(component²)
recursive walk (which could never finish on the giant component a fixed
cosine threshold produces at sf1).  These tests inject adversarial graph
shapes the embedding geometry can't be made to produce on demand — a
path longer than the unroll count, a giant dense component, many small
components — and pin the chain's labels to a pure-Python union-find.
"""

import random

import duckdb
import pytest

from lapis_silo_spark.driver_queries import _cc_propagation_ctes


def _oracle_labels(pairs, nodes, rounds=16):
    con = duckdb.connect()
    con.execute("CREATE TABLE g(u BIGINT, v BIGINT)")
    if pairs:
        con.executemany("INSERT INTO g VALUES (?, ?)", pairs)
    con.execute("CREATE TABLE ns(vid BIGINT)")
    con.executemany("INSERT INTO ns VALUES (?)", [(n,) for n in nodes])
    ctes, final = _cc_propagation_ctes(
        rounds=rounds,
        pairs_sql="SELECT u, v FROM g",
        nodes_sql="SELECT vid FROM ns",
    )
    rows = con.execute(f"WITH {ctes} SELECT node, lbl FROM {final}").fetchall()
    con.close()
    return dict(rows)


def _union_find_labels(pairs, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # min-label: component id is the smallest node id in the component
    comp_min = {}
    for n in nodes:
        r = find(n)
        comp_min[r] = min(comp_min.get(r, n), n)
    return {n: comp_min[find(n)] for n in nodes}


def test_path_longer_than_unroll_count():
    # Naive propagation needs ~200 rounds here; pointer jumping covers it
    # in the 16 unrolled rounds (reach grows geometrically).
    nodes = list(range(200))
    pairs = [(i, i + 1) for i in range(199)]
    assert _oracle_labels(pairs, nodes) == {n: 0 for n in nodes}


def test_reversed_path_worst_label_placement():
    # Min id at the FAR end of the walk order.
    nodes = list(range(150))
    pairs = [(i + 1, i) for i in range(149)]
    random.Random(7).shuffle(pairs)
    assert _oracle_labels(pairs, nodes) == {n: 0 for n in nodes}


def test_giant_random_component_matches_union_find():
    rng = random.Random(42)
    nodes = list(range(2000))
    pairs = [(rng.randrange(2000), rng.randrange(2000)) for _ in range(6000)]
    pairs = [(u, v) for u, v in pairs if u != v]
    assert _oracle_labels(pairs, nodes) == _union_find_labels(pairs, nodes)


def test_many_small_components_and_isolates():
    rng = random.Random(3)
    nodes = list(range(500))
    pairs = []
    for base in range(0, 300, 10):  # 30 clusters of 10, 200 isolates
        members = list(range(base, base + 10))
        rng.shuffle(members)
        pairs += list(zip(members, members[1:]))
    assert _oracle_labels(pairs, nodes) == _union_find_labels(pairs, nodes)


def test_under_unrolling_fails_loudly_not_silently():
    # With rounds too small for the diameter, labels are NOT converged —
    # they must DIFFER from the truth (hash-mismatch in the gate), never
    # agree by accident.
    nodes = list(range(200))
    pairs = [(i, i + 1) for i in range(199)]
    got = _oracle_labels(pairs, nodes, rounds=2)
    assert got != {n: 0 for n in nodes}
