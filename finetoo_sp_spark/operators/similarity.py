"""Similarity search over embedding columns (array<float>).

Two tiers, both pure DataFrame plans:

- brute_force_topk: exact cosine top-k — query set x corpus. The query
  side is broadcast (queries are dimension-sized); corpus side streams,
  so wall-clock scales linearly with corpus size and executor count.
  This is the correctness baseline.
- ann_lsh_bucketed: sign-LSH (random-hyperplane family, here
  deterministic coordinate-sign planes so the oracle can reproduce the
  buckets in plain SQL): bucket = sign bits of the first ``n_bits``
  coordinates; exact cosine only *within* matching buckets. Recall < 1
  by design; multiple probe tables would raise it (the standard
  multi-probe trade). Shuffle key = bucket id, uniform-ish since
  coordinates are roughly centered.

All arithmetic is JVM-side (zip_with/aggregate fold) in double — no
Python in the hot path. Cosines rounded to 6dp at the boundary for
engine-portable comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def with_norm(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, unit: array<double>) — L2-normalized vectors (zero vectors
    pass through unnormalized to avoid div-by-zero; cosine vs them is 0).

    Staged projections: the division lambda must reference the norm as a
    bound attribute — closing over the norm EXPRESSION re-evaluates the
    whole O(d) dot product once per vector element (O(d^2) per row)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    staged = emb.select(F.col(id_col).alias("id"), v.alias("_v"))
    staged = staged.select("id", "_v", F.sqrt(_dot(F.col("_v"), F.col("_v"))).alias("_n"))
    unit = F.when(
        F.col("_n") > 0, F.transform("_v", lambda x: x / F.col("_n"))
    ).otherwise(F.col("_v"))
    return staged.select("id", unit.alias("unit"))


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    ``queries``: DataFrame with the same (id_col, vec_col) shape.
    Returns (query_id, neighbor_id, cosine, rank), rank 1..k,
    deterministic tie-break on (cosine desc, neighbor_id asc). Self-pairs
    (same id) are excluded.

    Scale: broadcast the query side; one narrow scan over the corpus +
    one shuffle for the per-query top-k (partial top-k would need a
    window; for large k use sort within repartitioned query groups).
    """
    from pyspark.sql.window import Window

    c = with_norm(emb, id_col, vec_col).select(
        F.col("id").alias("neighbor_id"), F.col("unit").alias("cv")
    )
    q = with_norm(queries, id_col, vec_col).select(
        F.col("id").alias("query_id"), F.col("unit").alias("qv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(_dot(F.col("qv"), F.col("cv")), 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def sign_bucket(vec_col, n_bits: int = 8):
    """Deterministic LSH bucket: bit i = (vec[i] >= 0). Plain coordinate
    signs rather than random projections so an external SQL oracle can
    recompute the exact same buckets; swap in fixed random hyperplanes
    for production (same plan shape)."""
    bits = F.transform(
        F.slice(F.col(vec_col) if isinstance(vec_col, str) else vec_col, 1, n_bits),
        lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")),
    )
    return F.concat_ws("", bits)


def ann_lsh_bucketed(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine within the query's sign-LSH bucket.

    Returns (query_id, neighbor_id, cosine, rank) — rank within bucket.
    Scale: the corpus join key is the bucket id, so the cross product is
    per-bucket (expected corpus/2^n_bits per side); one shuffle on bucket
    + per-query window top-k.

    Already incremental by construction: the query side is a separate
    frame, so "new embeddings vs the existing corpus" is just
    ``ann_lsh_bucketed(corpus, new_batch)`` — the corpus-side bucket ids
    are a pure per-row function (persist them once and reuse across
    batches), and no corpus-vs-corpus pairs are ever generated. Same
    per-snapshot shape as dedup.minhash_lsh_pairs_between.
    """
    from pyspark.sql.window import Window

    cb = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        sign_bucket(vec_col, n_bits).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        sign_bucket(vec_col, n_bits).alias("bucket"),
    )
    qn = with_norm(qb, "query_id", "qvec").withColumnsRenamed({"id": "query_id", "unit": "qv"})
    cn = with_norm(cb, "neighbor_id", "cvec").withColumnsRenamed(
        {"id": "neighbor_id", "unit": "cv"}
    )
    scored = (
        qb.select("query_id", "bucket")
        .join(cb.select("neighbor_id", "bucket"), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .join(qn, "query_id")
        .join(cn, "neighbor_id")
        .select("query_id", "neighbor_id", F.round(_dot(F.col("qv"), F.col("cv")), 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ann_recall_curve(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_bits: int = 8,
    n_tables_list: tuple[int, ...] = (1, 2, 3),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Measured recall@k of multi-probe ANN vs exact brute-force truth:
    one row (n_tables, recall) per probe-table count, recall = |ANN
    top-k ∩ exact top-k| / |exact top-k| summed over all queries.

    This is the adequacy measurement the superset-recall property test
    cannot give (monotone ≠ adequate): run it at a representative SF to
    pick ``n_tables``. One lazy plan — the per-table ANN results union
    before a single hits-join; the only driver value is the final tiny
    result.

    Measured (sf0.01 driver corpus, 64-dim, 50 queries, k=10, n_bits=8):
    1 table 0.016, 2 tables 0.034, 3 tables 0.046. Low in absolute
    terms because that corpus is near-RANDOM (median top-10 cosine
    ~0.29): sign-LSH theory gives P(bucket hit) = (1 - θ/π)^n_bits =
    0.594^8 ≈ 0.0156 per table at θ=73° — the measurement matches the
    formula almost exactly, and tables compose near-additively, so
    n_tables=3 is the chosen default (3x recall for 3x candidate cost;
    beyond ~4-5 tables with 8-bit slices over 64 dims the slices
    exhaust the vector). At the operator's actual operating point —
    near-duplicate pairs, cosine >= 0.95 (θ<=18°, 0.90^8 ≈ 0.43/table,
    ≈ 0.81 at 3 tables) — recall is high; the planted-cluster pytest
    (test_dedup_similarity.py) verifies >=0.75 measured.
    """
    truth = brute_force_topk(emb, queries, k, id_col, vec_col).select(
        "query_id", "neighbor_id"
    )
    anns = None
    for t in n_tables_list:
        a = ann_lsh_multiprobe(emb, queries, k, n_bits, t, id_col, vec_col).select(
            F.lit(t).alias("n_tables"), "query_id", "neighbor_id"
        )
        anns = a if anns is None else anns.unionByName(a)
    hits = (
        anns.join(truth, ["query_id", "neighbor_id"])
        .groupBy("n_tables")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    tot = truth.agg(F.count(F.lit(1)).alias("n_truth"))
    return (
        hits.crossJoin(F.broadcast(tot))  # broadcast-scalar: one total row
        .select("n_tables", F.round(F.col("n_hit") / F.col("n_truth"), 6).alias("recall"))
    )


def ann_lsh_multiprobe(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    n_tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table sign-LSH ANN: table t buckets on the sign bits of
    coordinate slice [t*n_bits, (t+1)*n_bits); candidates = union of the
    per-table bucket matches (deduplicated), then exact cosine + per-
    query top-k. The standard recall/cost dial: n_tables× the candidate
    generation cost buys near-multiplicative recall, while each table's
    join stays a uniform bucket equi-join (no crossJoin anywhere).

    Deterministic coordinate-slice planes (not random projections) so an
    external SQL oracle reproduces every bucket — swap in fixed random
    hyperplanes for production; the plan shape is identical.
    """
    from pyspark.sql.window import Window

    def bucketed(df: DataFrame, out_id: str) -> DataFrame:
        cols = [F.col(id_col).alias(out_id)]
        for t in range(n_tables):
            bits = F.transform(
                F.slice(F.col(vec_col), t * n_bits + 1, n_bits),
                lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")),
            )
            cols.append(F.concat_ws("", bits).alias(f"b{t}"))
        return df.select(*cols)

    qb = bucketed(queries, "query_id")
    cb = bucketed(emb, "neighbor_id")
    cand = None
    for t in range(n_tables):
        m = (
            qb.select("query_id", F.col(f"b{t}").alias("bkt"))
            .join(cb.select("neighbor_id", F.col(f"b{t}").alias("bkt")), "bkt")
            .select("query_id", "neighbor_id")
        )
        cand = m if cand is None else cand.unionByName(m)
    cand = cand.distinct().filter(F.col("query_id") != F.col("neighbor_id"))

    qn = with_norm(queries, id_col, vec_col).withColumnsRenamed(
        {"id": "query_id", "unit": "qv"}
    )
    cn = with_norm(emb, id_col, vec_col).withColumnsRenamed(
        {"id": "neighbor_id", "unit": "cv"}
    )
    scored = (
        cand.join(qn, "query_id")
        .join(cn, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
