"""Entity canonicalization: similarity edges + connected components.

Reference (/root/reference/Author2PMID.groovy): per author_key, all pmid
pairs are scored with four Jaccard features (coauthors minus the shared
author, mesh, title tokens, affiliation tokens; :4-49), then greedily
attached to the first cluster with any score over threshold (:126-159 —
coauthor>0 ∨ mesh>0.1 ∨ title>0.1 ∨ affiliation>0.3).

Spark-native redesign (SURVEY.md A10/J6, documented divergence): the greedy
attach is order-dependent and irreproducible; we take the *transitive
closure* of the "similar" relation — connected components via iterative
min-label propagation joins (GraphFrames-style). Permutation-invariant and
a superset of any greedy clustering of the same edge set.

Scale notes: the pairwise scorer self-joins within author_key — groups are
small (papers per author name), so the join explodes only within groups and
the shuffle key is author_key (salt if a "j smith" mega-key ever shows up —
the group cross-product is capped defensively via max_group_size). Label
propagation converges in O(log d) iterations for diameter d; each iteration
is one shuffle; we localCheckpoint every few iterations to truncate lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _jaccard(a, b):
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    # reference jaccard returns 0 on empty input sets (Author2PMID.groovy:4-10)
    return F.when(union == 0, F.lit(0.0)).otherwise(inter.cast("double") / union)


def similarity_edges(
    records: DataFrame,
    coauthor_thresh: float = 0.0,
    mesh_thresh: float = 0.1,
    title_thresh: float = 0.1,
    affil_thresh: float = 0.3,
    max_group_size: int = 10000,
) -> DataFrame:
    """author_records -> edges(src, dst) where any feature clears threshold.

    Input schema: (doc_id, author_key, coauthors, mesh, title_tokens,
    affiliation_tokens). Self-join within author_key with src < dst.
    """
    wcount = F.count("*").over(Window.partitionBy("author_key"))
    bounded = records.withColumn("_gs", wcount).filter(F.col("_gs") <= max_group_size).drop("_gs")
    a = bounded.select(
        F.col("author_key"),
        F.col("doc_id").alias("src"),
        F.col("coauthors").alias("co_a"),
        F.col("mesh").alias("mesh_a"),
        F.col("title_tokens").alias("ti_a"),
        F.col("affiliation_tokens").alias("af_a"),
    )
    b = bounded.select(
        F.col("author_key"),
        F.col("doc_id").alias("dst"),
        F.col("coauthors").alias("co_b"),
        F.col("mesh").alias("mesh_b"),
        F.col("title_tokens").alias("ti_b"),
        F.col("affiliation_tokens").alias("af_b"),
    )
    pairs = a.join(b, "author_key").filter(F.col("src") < F.col("dst"))
    co = _jaccard(F.col("co_a"), F.col("co_b"))
    me = _jaccard(F.col("mesh_a"), F.col("mesh_b"))
    ti = _jaccard(F.col("ti_a"), F.col("ti_b"))
    af = _jaccard(F.col("af_a"), F.col("af_b"))
    similar = (
        (co > coauthor_thresh)
        | (me > mesh_thresh)
        | (ti > title_thresh)
        | (af > affil_thresh)
    )
    return pairs.filter(similar).select("author_key", "src", "dst")


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 50,
    checkpoint_every: int = 5,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """edges(src, dst) -> (id, component) by iterative min-label propagation.

    Each iteration: every vertex adopts the min label among itself and its
    neighbors (one join + groupBy agg = two shuffles); converges when no
    label changes. Driver loop, executor data — nothing is collected except
    the 1-row convergence count.

    Small-graph fast path: when the EDGE count is under ``driver_threshold``
    (vertices may still be huge), collect only the edges, run union-find on
    the driver, and broadcast the resulting label map back — isolated
    vertices label themselves via coalesce without ever being collected.
    Saves ~2 jobs per iteration x O(diameter) iterations; at real scale the
    iterative path runs. Results identical (both are min-id components).
    """
    sym = edges.select("src", "dst").unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    if vertices is None:
        vertices = sym.select(F.col("src").alias("id")).distinct()

    n_edges = edges.count()
    if n_edges <= driver_threshold:
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in edges.select("src", "dst").distinct().collect():
            a, b = r["src"], r["dst"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        labels = [(k, find(k)) for k in parent]
        spark = edges.sparkSession
        if labels:
            lmap = spark.createDataFrame(labels, ["id", "component"])
        else:
            lmap = spark.createDataFrame([], vertices.select(
                F.col("id"), F.col("id").alias("component")).schema)
        return vertices.join(F.broadcast(lmap), "id", "left").select(
            "id", F.coalesce("component", F.col("id")).alias("component")
        )
    labels = vertices.select("id", F.col("id").alias("component"))
    sym = sym.persist()
    labels = labels.persist()
    for i in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
                ).alias("component"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            new_labels = new_labels.localCheckpoint(eager=True)
        else:
            new_labels = new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels


def canonicalize_terms(
    lexicon: DataFrame, min_shared_names: int = 1, xref_kind: str = "xref"
) -> DataFrame:
    """Ontology-term entity canonicalization: terms that share an xref (or
    >= min_shared_names exact names) are the same real-world entity; merge
    via connected components and elect the min term_id as canonical.

    Input: lexicon(name, term_id, kind). Output: (term_id, canonical_id) for
    EVERY term (singletons map to themselves). The triples table is then
    rewritten by two broadcast joins (subj, obj) — the "canonicalize before
    materializing" stage of the north_star. Edge construction is a self-join
    on the shared key (name/xref), the same salted-groupBy shape as J4.
    """
    keys = lexicon.filter(
        (F.col("kind") == xref_kind) | (F.col("kind") == "name")
    ).select("name", "term_id").distinct()
    a = keys.select(F.col("name"), F.col("term_id").alias("src"))
    b = keys.select(F.col("name"), F.col("term_id").alias("dst"))
    shared = (
        a.join(b, "name")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared_names)
        .select("src", "dst")
    )
    verts = lexicon.select(F.col("term_id").alias("id")).distinct()
    comp = connected_components(shared, vertices=verts)
    return comp.select(F.col("id").alias("term_id"), F.col("component").alias("canonical_id"))


def rewrite_triples_canonical(triples: DataFrame, canon: DataFrame) -> DataFrame:
    """Rewrite (subj, obj) through the canonical map (broadcast, 1:1) and
    re-aggregate counts for merged pairs. Scores must be recomputed after a
    merge (na/nb change); here we keep max-score semantics for the merged
    row — callers needing exact re-scoring re-run scored_pairs on the
    canonical doc_terms."""
    cs = F.broadcast(canon.select(F.col("term_id").alias("subj"), F.col("canonical_id").alias("c_subj")))
    co = F.broadcast(canon.select(F.col("term_id").alias("obj"), F.col("canonical_id").alias("c_obj")))
    return (
        triples.join(cs, "subj", "left")
        .join(co, "obj", "left")
        .select(
            F.coalesce("c_subj", "subj").alias("subj"),
            "pred",
            F.coalesce("c_obj", "obj").alias("obj"),
            "nab", "na", "nb", "npmi",
        )
        .groupBy("subj", "pred", "obj")
        .agg(
            F.sum("nab").alias("nab"),
            F.max("na").alias("na"),
            F.max("nb").alias("nb"),
            F.max("npmi").alias("npmi"),
        )
    )


def canonicalize_authors(records: DataFrame, **thresholds) -> DataFrame:
    """author_records -> (doc_id, author_key, entity_id).

    entity_id = author_key + '#' + min doc_id of the component (the minted
    IRI analog of Author2PMID.groovy:163-167). Singleton docs (no similar
    neighbor) each get their own entity.
    """
    edges = similarity_edges(records, **thresholds)
    verts = records.select(F.col("doc_id").alias("id")).distinct()
    comp = connected_components(edges.select("src", "dst"), vertices=verts)
    return (
        records.join(comp, records.doc_id == comp.id, "left")
        .select(
            "doc_id",
            "author_key",
            F.concat(
                F.col("author_key"),
                F.lit("#"),
                F.coalesce(F.col("component"), F.col("doc_id")),
            ).alias("entity_id"),
        )
    )
