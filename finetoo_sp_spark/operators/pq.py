"""Product quantization (PQ) codes and IVF-PQ approximate search.

At 10^12 vectors, sign-LSH + per-vector SQ8 (operators/quantize.py) is
a recall/memory floor; the standard next tier is IVF-PQ (Jegou et al.,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011): split
each d-dim vector into M subspaces, k-means each subspace into ksub
centroids ("codebooks"), store per vector only the M codebook indices
(M bytes vs 4d), and search by (1) probing the nprobe nearest cells of
an IVF coarse quantizer and (2) ranking candidates by asymmetric
distance (ADC): sum over subspaces of dist(query_sub, codebook[code]),
a table lookup per subspace instead of a d-dim scan.

Determinism discipline (same as clustering.kmeans_assign, which the
coarse quantizer reuses verbatim via kmeans_fit): all arithmetic is
integer fixed point (floats -> round(x * 2^20) longs first), k-means
init = the sub-vectors of the ksub smallest ids, ties to the lowest
centroid id, centroid update = per-dimension ``sum div count`` — so
codes, ADC distances and top-k ranks are bit-identical under any
partitioning AND reproducible by the DuckDB oracle.

Scale shape: codebooks are driver-side literals (M * ksub * d/M ints —
KBs at any corpus size), so code assignment and ADC scoring are NARROW
column expressions over one corpus scan (no join, no shuffle); the
only shuffles are the k-means centroid updates (k*d groups,
size-invariant) and the final per-query top-k window. The corpus
never crosses a crossJoin: queries broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finetoo_sp_spark.operators.clustering import (
    _sqdist_to,
    _tdiv,
    _to_fixed,
    kmeans_fit,
)

SCALE = 1 << 20


def pq_train(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    ksub: int = 4,
    iters: int = 2,
    scale: int = SCALE,
) -> list[list[list[int]]]:
    """Train M per-subspace codebooks; returns codebooks[mi][j] = the
    j-th centroid of subspace mi as a fixed-point int list (d/M dims).
    One pass per k-means round covers ALL subspaces (the per-dimension
    update groups by (subspace, cluster, dim) in a single aggregate)."""
    e = emb.select(
        F.col(id_col).alias("id"), _to_fixed(F.col(vec_col), scale).alias("v")
    )
    init_rows = e.orderBy("id").limit(ksub).collect()
    dims = len(init_rows[0]["v"])
    if dims % m:
        raise ValueError(f"dims {dims} not divisible by m={m}")
    sub = dims // m
    codebooks = [
        [list(r["v"])[mi * sub : (mi + 1) * sub] for r in init_rows]
        for mi in range(m)
    ]

    def code_cols(frame_v="v"):
        cols = []
        for mi in range(m):
            sl = F.slice(frame_v, mi * sub + 1, sub)
            keys = [
                (_sqdist_to(sl, c) * ksub + F.lit(j)).cast("long")
                for j, c in enumerate(codebooks[mi])
            ]
            key = F.least(*keys) if len(keys) > 1 else keys[0]
            cols.append((key % ksub).cast("int").alias(f"c{mi}"))
        return cols

    for _ in range(iters - 1):
        a = e.select("v", *code_cols())
        ex = (
            a.select(
                F.posexplode("v").alias("dim", "val"),
                *[f"c{mi}" for mi in range(m)],
            )
            .withColumn("mi", (F.col("dim") / sub).cast("int"))
            .withColumn(
                "cl",
                F.element_at(
                    F.array(*[F.col(f"c{mi}") for mi in range(m)]),
                    F.col("mi") + 1,
                ),
            )
        )
        sums = (
            ex.groupBy("mi", "cl", "dim")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # m * ksub * dims rows: codebook-sized, not data-sized
        )
        new_c = [[list(c) for c in cb] for cb in codebooks]
        for r in sums:
            mi, cl, dim = int(r["mi"]), int(r["cl"]), int(r["dim"])
            new_c[mi][cl][dim - mi * sub] = _tdiv(int(r["s"]), int(r["n"]))
        codebooks = new_c
    return codebooks


def pq_assign(
    emb: DataFrame,
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = SCALE,
) -> DataFrame:
    """(id, c0..c{M-1}) codebook indices per vector — one narrow select
    against the broadcast-literal codebooks, no shuffle."""
    m = len(codebooks)
    ksub = len(codebooks[0])
    sub = len(codebooks[0][0])
    e = emb.select(
        F.col(id_col).alias("id"), _to_fixed(F.col(vec_col), scale).alias("v")
    )
    cols = []
    for mi in range(m):
        sl = F.slice("v", mi * sub + 1, sub)
        keys = [
            (_sqdist_to(sl, c) * ksub + F.lit(j)).cast("long")
            for j, c in enumerate(codebooks[mi])
        ]
        key = F.least(*keys) if len(keys) > 1 else keys[0]
        cols.append((key % ksub).cast("int").alias(f"c{mi}"))
    return e.select("id", *cols)


def pq_codes(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    ksub: int = 4,
    iters: int = 2,
    scale: int = SCALE,
) -> DataFrame:
    """Train + assign: (id, code_str, n_subspaces) with the M indices
    comma-joined (codes are the payload; a string survives any engine's
    value hashing, the SQ8 convention in this repo)."""
    cb = pq_train(emb, id_col, vec_col, m=m, ksub=ksub, iters=iters, scale=scale)
    a = pq_assign(emb, cb, id_col, vec_col, scale=scale)
    return a.select(
        "id",
        F.concat_ws(",", *[F.col(f"c{mi}") for mi in range(m)]).alias("code_str"),
        F.lit(m).cast("long").alias("n_subspaces"),
    )


def _sqdist_lists(a: list[int], b: list[int]) -> int:
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def ann_ivf_pq_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    nlist: int = 4,
    nprobe: int = 2,
    m: int = 4,
    ksub: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = SCALE,
) -> DataFrame:
    """IVF-PQ search: (query_id, neighbor_id, adc_dist, rank) — the k
    nearest candidates per query by asymmetric PQ distance among the
    nprobe probed IVF cells, self-pairs excluded, ties to the lower id.

    The coarse quantizer is clustering.kmeans_fit (nlist cells) and the
    probe order is the exact integer distance from the query to each
    final centroid. Per query the M ADC lookup tables (ksub entries
    each) are computed driver-side from the codebooks and spliced in as
    array literals, so candidate scoring is ``element_at(table, code)``
    sums — a pure narrow expression; no vector math touches the corpus
    at query time (the PQ promise)."""
    centroids, assigned = kmeans_fit(
        emb, id_col, vec_col, k=nlist, iters=2, scale=scale
    )
    codebooks = pq_train(emb, id_col, vec_col, m=m, ksub=ksub, scale=scale)
    sub = len(codebooks[0][0])
    codes = pq_assign(emb, codebooks, id_col, vec_col, scale=scale)
    base = codes.join(assigned, "id")

    qrows = (
        emb.filter(F.col(id_col).isin([int(q) for q in query_ids]))
        .select(F.col(id_col).alias("id"), _to_fixed(F.col(vec_col), scale).alias("v"))
        .collect()
    )
    per_query = []
    for r in sorted(qrows, key=lambda r: r["id"]):
        qid, qv = int(r["id"]), list(r["v"])
        order = sorted(
            (_sqdist_lists(qv, c) * nlist + j) for j, c in enumerate(centroids)
        )
        cells = [int(x % nlist) for x in order[:nprobe]]
        adc_tables = [
            [
                _sqdist_lists(qv[mi * sub : (mi + 1) * sub], codebooks[mi][j])
                for j in range(ksub)
            ]
            for mi in range(m)
        ]
        adc = None
        for mi in range(m):
            t = F.array(*[F.lit(int(x)) for x in adc_tables[mi]])
            term = F.element_at(t, F.col(f"c{mi}") + 1)
            adc = term if adc is None else adc + term
        per_query.append(
            base.filter(F.col("cluster").isin(cells) & (F.col("id") != qid))
            .select(
                F.lit(qid).cast("long").alias("query_id"),
                F.col("id").alias("neighbor_id"),
                adc.cast("long").alias("adc_dist"),
            )
        )
    scored = per_query[0]
    for p in per_query[1:]:
        scored = scored.unionByName(p)
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def ivf_pq_recall(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    nlist: int = 4,
    nprobe: int = 2,
    m: int = 4,
    ksub: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = SCALE,
) -> DataFrame:
    """Measured recall@k of IVF-PQ against the EXACT integer-L2 top-k:
    (query_id, n_hits, k) where n_hits = |approx top-k ∩ exact top-k|.
    Both sides are integer-deterministic, so the oracle reproduces the
    recall number itself, not just the shape."""
    approx = ann_ivf_pq_topk(
        emb, query_ids, k=k, nlist=nlist, nprobe=nprobe, m=m, ksub=ksub,
        id_col=id_col, vec_col=vec_col, scale=scale,
    ).select("query_id", "neighbor_id")

    e = emb.select(
        F.col(id_col).alias("id"), _to_fixed(F.col(vec_col), scale).alias("v")
    )
    q = (
        e.filter(F.col("id").isin([int(x) for x in query_ids]))
        .select(F.col("id").alias("query_id"), F.col("v").alias("qv"))
    )
    d = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("id").alias("neighbor_id"),
            F.aggregate(
                F.zip_with("v", "qv", lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    exact = (
        d.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id")
    )
    hits = approx.join(exact, ["query_id", "neighbor_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        q.select("query_id")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.lit(k).cast("long").alias("k"),
        )
    )
