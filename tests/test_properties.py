"""Property-based operator tests (hypothesis) — algebraic laws that
must hold for ANY input, checked against numpy on random small sparse
matrices. Goes beyond the reference's golden-file CTest suite (SURVEY
§5: "no property-based or randomized differential testing").

Deliberately few, fast examples per property: each example spins Spark
jobs, so the value is breadth of law coverage, not example count.
"""

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from combblas_spark.operators.semiring import PLUS_TIMES, MIN_PLUS
from combblas_spark.operators.spgemm import spgemm
from combblas_spark.operators.spmv import spmv
from combblas_spark.operators.indexing import transpose, invert
from combblas_spark.operators.reduce import reduce_dim
from tests.conftest import df_edges, df_vec

N = 12  # vertex-space size for generated matrices

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def sparse_matrix(draw):
    """Random sparse matrix as (triples, dense numpy) over [0,N)^2."""
    n_entries = draw(st.integers(min_value=1, max_value=25))
    coords = draw(
        st.lists(
            st.tuples(st.integers(0, N - 1), st.integers(0, N - 1)),
            min_size=n_entries, max_size=n_entries, unique=True,
        )
    )
    vals = draw(
        st.lists(
            st.integers(min_value=1, max_value=9),
            min_size=len(coords), max_size=len(coords),
        )
    )
    M = np.zeros((N, N))
    for (r, c), v in zip(coords, vals):
        M[r, c] = float(v)
    return [(r, c, float(v)) for (r, c), v in zip(coords, vals)], M


@st.composite
def dense_vector(draw):
    vals = draw(st.lists(st.integers(0, 9), min_size=N, max_size=N))
    return [(i, float(v)) for i, v in enumerate(vals)], np.array(vals, dtype=float)


def _mat(df):
    M = np.zeros((N, N))
    for r in df.collect():
        M[r["src"], r["dst"]] = r["val"]
    return M


def _vec(df, default=0.0):
    out = np.full(N, default)
    for r in df.collect():
        out[r["id"]] = r["val"]
    return out


@settings(**SETTINGS)
@given(sparse_matrix(), dense_vector())
def test_spmv_matches_numpy(spark, am, xv):
    triples, A = am
    pairs, x = xv
    y = _vec(spmv(df_edges(spark, triples), df_vec(spark, pairs), PLUS_TIMES))
    assert np.allclose(y, A.T @ x)


@settings(**SETTINGS)
@given(sparse_matrix(), sparse_matrix())
def test_spgemm_matches_numpy_and_transpose_law(spark, am, bm):
    ta, A = am
    tb, B = bm
    dfA, dfB = df_edges(spark, ta), df_edges(spark, tb)
    C = _mat(spgemm(dfA, dfB))
    assert np.allclose(C, A @ B)
    # (AB)^T = B^T A^T
    Ct = _mat(spgemm(transpose(dfB), transpose(dfA)))
    assert np.allclose(Ct, (A @ B).T)


@settings(**SETTINGS)
@given(sparse_matrix())
def test_transpose_involution_and_reduce_duality(spark, am):
    triples, A = am
    df = df_edges(spark, triples)
    assert np.allclose(_mat(transpose(transpose(df))), A)
    # row-reduce of A == col-reduce of A^T
    r1 = _vec(reduce_dim(df, "row", F.sum))
    r2 = _vec(reduce_dim(transpose(df), "col", F.sum))
    assert np.allclose(r1, r2)


@settings(**SETTINGS)
@given(sparse_matrix(), dense_vector())
def test_min_plus_spmv_matches_numpy(spark, am, xv):
    triples, A = am
    pairs, x = xv
    y = spmv(df_edges(spark, triples), df_vec(spark, pairs), MIN_PLUS)
    got = {r["id"]: r["val"] for r in y.collect()}
    INF = float("inf")
    Adist = np.where(A > 0, A, INF)
    expected = {}
    for j in range(N):
        m = np.min(Adist[:, j] + x) if np.any(Adist[:, j] < INF) else INF
        if m < INF:
            expected[j] = m
    assert got == pytest.approx(expected)


@settings(**SETTINGS)
@given(dense_vector())
def test_invert_roundtrip_on_injective_vectors(spark, xv):
    pairs, x = xv
    # make values unique (injective) so inversion is exactly reversible
    pairs = [(i, float(v * N + i)) for i, v in enumerate(x)]
    v = df_vec(spark, pairs)
    back = invert(invert(v))
    got = {r["id"]: r["val"] for r in back.collect()}
    assert got == {i: float(val) for i, val in pairs}


@st.composite
def bipartite_weighted(draw):
    """Small random weighted bipartite edge set: rows [0,4), cols [10,14),
    integer weights (ties likely — exercises the tie-breaks)."""
    n = draw(st.integers(min_value=1, max_value=12))
    coords = draw(st.lists(
        st.tuples(st.integers(0, 3), st.integers(10, 13)),
        min_size=n, max_size=n, unique=True))
    vals = draw(st.lists(st.integers(1, 5), min_size=len(coords),
                         max_size=len(coords)))
    return [(r, c, float(v)) for (r, c), v in zip(coords, vals)]


def _brute_best_assignment(triples):
    """Exhaustive max-weight matching PERFECT ON THE BIDDER SIDE (the
    assignment problem the auction solves — it matches every bidder
    when feasible even at a weight sacrifice, unlike unrestricted
    max-weight matching). None if no perfect-on-bidders matching."""
    import itertools
    W = {(r, c): v for r, c, v in triples}
    rows = sorted({r for r, _, _ in triples})
    cols = sorted({c for _, c, _ in triples})
    best = None
    for cs in itertools.permutations(cols, len(rows)):
        if all((r, c) in W for r, c in zip(rows, cs)):
            w = sum(W[(r, c)] for r, c in zip(rows, cs))
            best = w if best is None else max(best, w)
    return best


@settings(**SETTINGS)
@given(bipartite_weighted())
def test_auction_valid_and_near_optimal(spark, triples):
    """Auction output is always a valid matching; when it matches every
    bidder, its weight is within n*eps of the brute-force ASSIGNMENT
    optimum (best perfect-on-bidders matching — the problem the
    auction solves; eps-complementary slackness bound)."""
    from combblas_spark.algorithms.matching import auction_matching

    eps = 1e-3
    edges = df_edges(spark, triples)
    got = [(r["src"], r["dst"])
           for r in auction_matching(edges, eps=eps, max_rounds=48).collect()]
    W = {(r, c): v for r, c, v in triples}
    assert all(p in W for p in got)                       # matched pairs exist
    assert len({s for s, _ in got}) == len(got)           # valid matching
    assert len({d for _, d in got}) == len(got)
    rows = {r for r, _, _ in triples}
    if len(got) == len(rows):                             # perfect on bidders
        best = _brute_best_assignment(triples)
        assert best is not None
        wt = sum(W[p] for p in got)
        assert wt >= best - len(got) * eps - 1e-9


@st.composite
def small_graph(draw):
    n = draw(st.integers(min_value=1, max_value=14))
    coords = draw(st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)),
        min_size=n, max_size=n, unique=True))
    return [(a, b) for a, b in coords if a != b]


@settings(**SETTINGS)
@given(small_graph())
def test_min_degree_is_total_permutation(spark, pairs):
    """min_degree_ordering always emits a bijection pos<->vertex over
    the non-isolated vertex set, for any small graph."""
    from combblas_spark.algorithms.ordering import min_degree_ordering

    if not pairs:
        return
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = min_degree_ordering(edges, rounds=4).collect()
    verts = {a for a, _ in pairs} | {b for _, b in pairs}
    assert sorted(r["id"] for r in got) == sorted(verts)
    assert sorted(r["pos"] for r in got) == list(range(len(verts)))


@settings(**SETTINGS)
@given(small_graph())
def test_bfs_variants_all_pass_graph500_validation(spark, pairs):
    """Every BFS variant's (level, parent) tree passes the five
    Graph500 spec kernel-2 rules (validate_bfs_tree) on arbitrary small
    graphs — including disconnected ones, where rule 5 pins the tree to
    exactly the root's component."""
    from combblas_spark.algorithms.bfs import bfs_tree, validate_bfs_tree

    if not pairs:
        return
    g = df_edges(spark, pairs)
    root = pairs[0][0]
    for kwargs in ({}, {"directed": True}):
        tree = bfs_tree(g, root=root, **kwargs)
        res = validate_bfs_tree(g, tree, root=root, **kwargs)
        assert res["ok"], (pairs, kwargs, res)
