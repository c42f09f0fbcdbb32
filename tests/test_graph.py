"""Graph statistics: degree centrality and oriented-wedge triangle count."""

from __future__ import annotations

from pmcanalysis_spark.operators.graph import degree_centrality, triangle_count


def _edges(spark):
    # triangle 1-2-3, pendant 3-4, plus noise: duplicate edge, reversed
    # duplicate, and a self-loop — all must not change the counts
    rows = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 1), (1, 2), (4, 4)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_degree_centrality(spark):
    deg = {r.id: r.degree for r in degree_centrality(_edges(spark)).collect()}
    assert deg == {1: 2, 2: 2, 3: 3, 4: 1}


def test_triangle_count(spark):
    assert triangle_count(_edges(spark)).collect()[0].n_triangles == 1


def test_triangle_count_k4(spark):
    # K4 has exactly 4 triangles; feed edges in mixed orientations
    rows = [(1, 2), (3, 1), (1, 4), (2, 3), (4, 2), (3, 4)]
    e = spark.createDataFrame(rows, "src long, dst long")
    assert triangle_count(e).collect()[0].n_triangles == 4
    deg = {r.id: r.degree for r in degree_centrality(e).collect()}
    assert deg == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_free(spark):
    # a path graph and a star: zero triangles
    rows = [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13)]
    e = spark.createDataFrame(rows, "src long, dst long")
    assert triangle_count(e).collect()[0].n_triangles == 0
