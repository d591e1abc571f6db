"""Similarity search over embedding columns — SURVEY.md §2.10.

Charter extension scope. Two tiers:
- ``cosine_topk``: exact brute-force top-k — the correctness baseline.
  Dot products via zip_with/aggregate lambda expressions (JVM-side,
  no Python). Queries are broadcast; candidates stream — so the cost
  is one scan of the corpus per batch of queries, embarrassingly
  parallel across partitions.
- ``lsh_topk``: random-hyperplane LSH bucketing (deterministic seeded
  planes derived from xxhash64 — no stored model needed). Only
  vectors sharing >=1 of ``n_tables`` bucket keys are scored; at
  100 TB this replaces the full scan with equi-joins on bucket keys.
  Recall is tunable via (n_planes, n_tables).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from .parallelism import fan_out


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.nullif(norm(a) * norm(b), F.lit(0.0))


# PQ/IVF-PQ collect the QUERY side to the driver to build ADC lookup
# tables — correct for serving-batch query sets, a silent driver
# bottleneck for corpus-sized ones. This cap pins the contract at
# runtime (mirrors textops.decontaminate::max_benchmark_shingles): one
# cheap count over the SMALL side, loud raise past the threshold.
# 100k queries x 256 float64 dims = ~200 MB driver resident — the
# comfortable ceiling; above that, batch the query set or use the
# distributed scorers (cosine_topk / lsh_topk / ivf_topk).
MAX_QUERY_COLLECT_ROWS = 100_000


def _collect_query_vectors(
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    caller: str,
    max_query_rows: int | None,
):
    """Driver-bounded collect of (query_id, unit-normalized vector).

    Raises when the query side exceeds ``max_query_rows`` (None
    disables for callers who sized the collect themselves)."""
    import numpy as np

    sel = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    )
    if max_query_rows is not None:
        # limit-guarded collect: ONE driver job enforces the guard and
        # fetches the rows (the old count()-then-collect() pair cost two
        # full executions of the query-side plan); the limit bounds the
        # driver transfer even when the guard trips.
        rows = sel.limit(max_query_rows + 1).collect()
        if len(rows) > max_query_rows:
            raise ValueError(
                f"{caller}: query side has > max_query_rows="
                f"{max_query_rows} rows; the ADC lookup tables are built "
                "on the driver, so a corpus-sized query set would "
                "serialize through it. Use pq_topk_distributed (LUTs "
                "built as a DataFrame of packed query blocks — no driver "
                "collect, exact result parity), raise max_query_rows "
                "deliberately, or use another distributed scorer "
                "(cosine_topk/lsh_topk/ivf_topk) for corpus-vs-corpus "
                "work."
            )
    else:
        rows = sel.collect()
    q_ids = np.array([r["query_id"] for r in rows], dtype=np.int64)
    qx = np.array([r["qv"] for r in rows], dtype=np.float64)
    qx = qx / np.maximum(np.linalg.norm(qx, axis=1, keepdims=True), 1e-12)
    return q_ids, qx


def _check_sample_collect(n_collected: int, sample_n: int, caller: str) -> None:
    """Post-collect tripwire for the trainers' hash-sample: xxhash64 is
    uniform, so the ~sample_n expected sample concentrates tightly; a
    collect far above it means the sampler is broken (or ids are
    pathologically non-unique) and the next run would OOM the driver
    silently. Costs nothing — no extra scan."""
    if sample_n and n_collected > 4 * sample_n + 1024:
        raise ValueError(
            f"{caller}: hash-sample collected {n_collected} rows for "
            f"sample_n={sample_n} — sampler contract broken (duplicate "
            f"ids? corrupt count?); refusing the driver-side collect."
        )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_to: int = 9,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cosine, rank). Ties broken by
    neighbor id for cross-engine determinism; self-matches excluded.
    """
    # norms hoisted out of the pair loop (once per row, not per pair);
    # the product of the same two doubles is bit-identical to the
    # inline cosine(), so the DuckDB-oracle hash contract is unchanged
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("__qn", norm(F.col("qv")))
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("__cn", norm(F.col("cv")))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv"))
                / F.nullif(F.col("__qn") * F.col("__cn"), F.lit(0.0)),
                round_to,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _plane_component(plane: int, dim_idx: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    xxhash64(plane, dim) scaled — reproducible on any cluster, no
    stored model."""
    h = F.xxhash64(F.lit(plane), dim_idx)
    return (h % 1000003).cast("double") / F.lit(1000003.0)


def lsh_bucket_keys(vec: Column, n_planes: int = 8, n_tables: int = 4) -> Column:
    """Array of ``n_tables`` bucket keys; each key packs ``n_planes``
    sign bits of projections onto deterministic hyperplanes."""
    keys = []
    for t in range(n_tables):
        bits = None
        for p in range(n_planes):
            plane_id = t * n_planes + p
            proj = F.aggregate(
                F.zip_with(
                    vec,
                    F.transform(
                        F.sequence(F.lit(0), F.size(vec) - 1),
                        lambda i, pid=plane_id: _plane_component(pid, i),
                    ),
                    lambda x, w: x * w,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bit = F.when(proj >= 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            term = F.shiftleft(bit, p)
            bits = term if bits is None else bits.bitwiseXOR(term)
        keys.append(F.struct(F.lit(t).alias("table"), bits.alias("bucket")))
    return F.array(*keys)


def cosine_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    round_to: int = 9,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id1 < id2, cosine >= thr).

    Brute-force all-pairs — the exactness baseline the LSH path is
    measured against. At corpus scale use ``lsh_topk``/bucketing to
    generate candidates and this only to verify them.
    """
    a = df.select(
        F.col(id_col).alias("id1"), _as_double(F.col(vec_col)).alias("v1")
    )
    b = df.select(
        F.col(id_col).alias("id2"), _as_double(F.col(vec_col)).alias("v2")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            F.round(cosine(F.col("v1"), F.col("v2")), round_to).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def cosine_dup_pairs_blocked(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    n_blocks: int | None = None,
    round_to: int = 9,
    block_size: int = 2048,
) -> DataFrame:
    """Exact all-pairs cosine near-dup via BLOCK matrix products.

    Same output as ``cosine_dup_pairs`` but scalable: vectors are
    hash-assigned to blocks; the n_blocks*(n_blocks+1)/2 block pairs
    cross-join as SINGLE ROWS carrying packed arrays, and one
    Arrow-batched numpy GEMM scores each block pair, emitting only
    pairs over threshold. Compute is dense BLAS instead of per-pair
    lambda interpretation (measured ~40x at 2k vectors); at cluster
    scale block pairs are the parallelism unit and Arrow moves
    O(block_size * dim) per task, not O(pairs).

    ``n_blocks`` defaults to ceil(count / block_size), floored at 8, so
    (a) a packed block row stays ~``block_size`` vectors no matter how
    large the corpus is — a FIXED row size well under Spark's 2 GB
    row/buffer ceilings (2048 x 1024-dim doubles = 16 MB), instead of
    rows growing O(n); and (b) a small corpus still fans out to
    8*9/2 = 36 block-pair tasks instead of collapsing to one serial
    GEMM (measured 3x at 2k vectors when n_blocks derived to 1).
    The count() is one cheap planning pass over the id column; callers
    that already know the corpus size can pass ``n_blocks`` directly.
    Exactness does not depend on the blocking, only row size does.
    """
    import math

    if n_blocks is None:
        n_blocks = max(8, math.ceil(df.count() / block_size))

    packed = (
        df.select(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("b"),
            F.struct(
                F.col(id_col).cast("long").alias("id"),
                _as_double(F.col(vec_col)).alias("v"),
            ).alias("iv"),
        )
        .groupBy("b")
        .agg(F.collect_list("iv").alias("items"))
    )
    lhs = packed.select(
        F.col("b").alias("b1"), F.col("items").alias("items1")
    )
    rhs = packed.select(
        F.col("b").alias("b2"), F.col("items").alias("items2")
    )
    block_pairs = lhs.crossJoin(rhs).filter(F.col("b1") <= F.col("b2"))
    return block_pairs.mapInPandas(
        _gemm_pair_scorer(threshold, round_to),
        schema="id1 long, id2 long, cosine double",
    )


def _gemm_pair_scorer(threshold: float, round_to: int, contract: bool = False):
    """Arrow-batch scorer over packed block-pair rows (columns
    ``items1``/``items2``/``b1``/``b2``): one dense GEMM per block
    pair, emitting only (id1 < id2, cosine >= threshold). Shared by the
    global blocked all-pairs and the within-cell semantic-dedup pass.

    ``contract=True`` (round 10): instead of every qualifying pair, run
    a LOCAL union-find over the block-pair's pairs and emit one
    (component-min-id, member) edge per non-root member — at most
    |nodes| edges instead of O(|nodes|²). Edge contraction preserves
    connectivity exactly, so a downstream transitive closure computes
    IDENTICAL components; only closure consumers (semantic_dedup) may
    use it — pair-OUTPUT consumers need the full list. Why it exists:
    a low threshold inside IVF cells (which group similar vectors by
    construction) makes qualifying pairs approach quadratic in cell
    size — the round-10 1000x probe OOMed the executors on exactly
    that; contracted edges cap the closure input at one row per
    vector. The emitted cosine is the member's edge-to-root similarity
    where such a pair was scored, else the component-forming value —
    closure consumers ignore it."""
    import numpy as np
    import pandas as pd

    def score(batches):
        for pdf in batches:
            o1, o2, oc = [], [], []
            for items1, items2, same in zip(
                pdf["items1"], pdf["items2"], pdf["b1"] == pdf["b2"]
            ):
                ids1 = np.array([r["id"] for r in items1], dtype=np.int64)
                ids2 = np.array([r["id"] for r in items2], dtype=np.int64)
                m1 = np.array([r["v"] for r in items1], dtype=np.float64)
                m2 = np.array([r["v"] for r in items2], dtype=np.float64)
                n1 = np.linalg.norm(m1, axis=1)
                n2 = np.linalg.norm(m2, axis=1)
                denom = np.outer(n1, n2)
                with np.errstate(divide="ignore", invalid="ignore"):
                    sims = np.where(denom > 0, (m1 @ m2.T) / denom, np.nan)
                sims = np.round(sims, round_to)
                ii, jj = np.where(sims >= threshold)
                a, b = ids1[ii], ids2[jj]
                if same:
                    keep = a < b
                else:  # cross-block: orient each pair, drop self-compare
                    keep = a != b
                a2 = np.minimum(a[keep], b[keep])
                b2 = np.maximum(a[keep], b[keep])
                sv = sims[ii[keep], jj[keep]]
                if not contract:
                    o1.extend(a2.tolist())
                    o2.extend(b2.tolist())
                    oc.extend(sv.tolist())
                    continue
                # local union-find by min id; emit (root, member) edges
                parent: dict = {}

                def find(x):
                    r = x
                    while parent.get(r, r) != r:
                        r = parent[r]
                    while parent.get(x, x) != x:
                        parent[x], x = r, parent[x]
                    return r

                for x, y in zip(a2.tolist(), b2.tolist()):
                    rx, ry = find(x), find(y)
                    if rx != ry:
                        lo, hi = (rx, ry) if rx < ry else (ry, rx)
                        parent[hi] = lo
                for x in list(parent):
                    r = find(x)
                    if r != x:
                        o1.append(r)
                        o2.append(x)
                        oc.append(float(threshold))
            yield pd.DataFrame({"id1": o1, "id2": o2, "cosine": oc})

    return score


def train_ivf_centroids(
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_iter: int = 10,
    seed: int = 7,
    sample_n: int = 4096,
) -> DataFrame:
    """Train the IVF coarse quantizer with MLlib KMeans (kmeans|| init —
    the distributed-scale standard; Lloyd iterations are one distributed
    assignment + re-average pass each, exactly what hand-rolled
    DataFrame k-means would do, minus MLlib's years of hardening).

    Training runs on a BOUNDED deterministic hash-sample (~``sample_n``
    rows, ``xxhash64(id) % n < threshold``) — centroid quality converges
    long before the full corpus is seen, and sampling keeps the training
    cost CONSTANT as the corpus grows (only the one-pass full-corpus
    assignment in ``ivf_topk`` stays linear; probed 2.6x at 10x data vs
    4.9x training on everything). The one ``count()`` that sizes the
    sample is a metadata-cheap columnar scan.

    Returns a small (id, vector) centroid DataFrame shaped for
    ``ivf_topk(centroids=...)``.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    spark = corpus.sparkSession
    train = corpus
    if sample_n:
        n = corpus.count()
        if n > sample_n:
            mod = 1_000_003  # prime > any sane sample_n, keeps ratios exact
            thresh = int(mod * (sample_n / n))
            train = corpus.filter(
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod)) < F.lit(thresh)
            )
    feats = train.select(
        array_to_vector(_as_double(F.col(vec_col))).alias("features")
    )
    model = KMeans(k=k, maxIter=max_iter, seed=seed).fit(feats)
    centers = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        schema=f"{id_col} bigint, raw array<double>",
    )
    # vector round-trip keeps the schema identical to corpus embeddings
    return centers.select(
        id_col, vector_to_array(array_to_vector("raw")).alias(vec_col)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 3,
    assign_method: str = "auto",
) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus to its nearest centroid
    cell, probe each query's ``n_probe`` nearest cells, score exactly
    only within probed cells.

    ``centroids`` is any small (id, vector) DataFrame — typically KMeans
    centers or a deterministic sample; it is broadcast to both sides, so
    assignment is a map-side argmin (no shuffle). The corpus→cell
    assignment is write-time partitioning in a real deployment: lookups
    touch n_probe cells instead of the full corpus.

    ``assign_method``: "auto" (GEMM mapInPandas at >= 32 cells, the
    crossJoin-window form below), "gemm", or "exact" — parity between
    the two is pinned in tests; "exact" exists for small-k plans and
    the parity check itself.
    """
    # centroid norms precomputed once (broadcast side); row norms once
    # per row instead of once per (row, centroid) pair
    cent = centroids.select(
        F.col(id_col).alias("cid"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("__kn", norm(F.col("cv")))

    # Auto-dispatch (round 10): past ~32 cells the crossJoin-window
    # assignment's n x k row expansion — every row carrying its full
    # vector through a per-id sort — dominates memory AND cpu (the
    # 1000x probe OOMed the executor heap on 500k x 708 expanded rows);
    # the GEMM form is the assign_cells(method="gemm") lesson extended
    # to top-n: one Arrow mapInPandas pass, zero exchanges, argpartition
    # for the n_probe cells. Same (sim desc, cid asc) tie-break, sims
    # rounded to 9 on both paths.
    cent_rows = cent.select("cid", "cv").collect()
    use_gemm = (
        assign_method == "gemm"
        or (assign_method == "auto" and len(cent_rows) >= 32)
    )
    if use_gemm:

        def assign(df: DataFrame, idc: str, vec: str, keep_n: int) -> DataFrame:
            return _ivf_assign_gemm(df, idc, vec, cent_rows, keep_n)

        cells = assign(corpus, id_col, vec_col, 1).select(
            F.col("_id").alias("neighbor_id"),
            F.col("_v").alias("cv2"),
            "cid",
        )
        probes = assign(queries, id_col, vec_col, n_probe).select(
            F.col("_id").alias("query_id"), F.col("_v").alias("qv"), "cid"
        )
        return _ivf_score_gemm(cells, probes, k)

    def assign(df: DataFrame, idc: str, vec: str, keep_n: int) -> DataFrame:
        scored = (
            df.select(F.col(idc).alias("_id"), _as_double(F.col(vec)).alias("_v"))
            .withColumn("__vn", norm(F.col("_v")))
            .crossJoin(F.broadcast(cent))
            .select(
                "_id",
                "_v",
                "cid",
                F.round(
                    dot(F.col("_v"), F.col("cv"))
                    / F.nullif(F.col("__vn") * F.col("__kn"), F.lit(0.0)),
                    9,
                ).alias("sim"),
            )
        )
        # Audited alternative: a max_by hash-agg argmax for keep_n=1.
        # Measured IDENTICAL output and no speedup — Spark 4's
        # WindowGroupLimit already runs a PARTIAL top-k before the
        # exchange (the shuffle carries <= keep_n rows per vector, not
        # one per centroid), while max_by over an array-carrying struct
        # degrades to SortAggregate and adds join exchanges. The window
        # form is the right plan on both counts.
        w = Window.partitionBy("_id").orderBy(F.col("sim").desc(), F.col("cid"))
        return (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= keep_n)
            .drop("_r", "sim")
        )

    cells = assign(corpus, id_col, vec_col, 1).select(
        F.col("_id").alias("neighbor_id"),
        F.col("_v").alias("cv2"),
        "cid",
    ).withColumn("__nn", norm(F.col("cv2")))
    probes = assign(queries, id_col, vec_col, n_probe).select(
        F.col("_id").alias("query_id"), F.col("_v").alias("qv"), "cid"
    ).withColumn("__qn", norm(F.col("qv")))
    return _ivf_score(cells, probes, k)


def _ivf_score_gemm(cells: DataFrame, probes: DataFrame, k: int) -> DataFrame:
    """Cell-cogrouped BLAS scoring: one applyInPandas per cell computes
    (probing queries x cell members) cosines as a dense GEMM and emits
    each query's per-cell top-k; a final window takes the global top-k
    (the union of per-cell top-ks contains it — the standard
    distributed-top-k argument; a corpus vector lives in exactly ONE
    cell, so (query, neighbor) pairs cannot repeat across cells).

    This replaces the equi-join + per-row Catalyst lambda cosine for
    the auto/GEMM path: at the round-10 1000x probe scale (5k queries x
    27 probes x ~700-member cells ~ 95M candidates), the interpreted
    per-element lambda fold measured 771 s (545x ratio); the same
    flops as per-cell GEMMs run at BLAS rate, and the shuffle carries
    each side once keyed by cell instead of streaming 95M joined rows.
    Semantics mirror the exact path: cosines rounded to 9, self-match
    dropped, ties (cosine desc, neighbor_id asc)."""
    import numpy as np
    import pandas as pd

    def score(key, cdf: pd.DataFrame, qdf: pd.DataFrame):
        if len(cdf) == 0 or len(qdf) == 0:
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "cosine": []}
            ).astype({"query_id": "int64", "neighbor_id": "int64",
                      "cosine": "float64"})
        cm = np.array(list(cdf["cv2"]), dtype=np.float64)
        qm = np.array(list(qdf["qv"]), dtype=np.float64)
        cn = np.linalg.norm(cm, axis=1)
        qn = np.linalg.norm(qm, axis=1)
        cn[cn == 0.0] = 1.0
        qn[qn == 0.0] = 1.0
        sims = np.round((qm / qn[:, None]) @ (cm / cn[:, None]).T, 9)
        nids = cdf["neighbor_id"].to_numpy()
        qids = qdf["query_id"].to_numpy()
        # self-matches score -inf so they never enter the shortlist
        sims[qids[:, None] == nids[None, :]] = -np.inf
        kn = min(k, sims.shape[1])
        part = np.argpartition(-sims, kn - 1, axis=1)[:, :kn]
        psims = np.take_along_axis(sims, part, axis=1)
        order = np.lexsort((nids[part], -psims), axis=1)
        best = np.take_along_axis(part, order, axis=1)
        bsims = np.take_along_axis(sims, best, axis=1)
        keep = np.isfinite(bsims).reshape(-1)
        return pd.DataFrame(
            {
                "query_id": np.repeat(qids, kn)[keep],
                "neighbor_id": nids[best].reshape(-1)[keep],
                "cosine": bsims.reshape(-1)[keep],
            }
        )

    scored = (
        cells.groupBy("cid")
        .cogroup(probes.groupBy("cid"))
        .applyInPandas(
            score, schema="query_id long, neighbor_id long, cosine double"
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _ivf_score(cells: DataFrame, probes: DataFrame, k: int) -> DataFrame:
    """Shared IVF scoring tail: cell equi-join, exact cosine over
    probed members, per-query top-k (both assignment paths land here)."""
    scored = (
        cells.join(probes, "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("qv"), F.col("cv2"))
                / F.nullif(F.col("__qn") * F.col("__nn"), F.lit(0.0)),
                9,
            ).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _ivf_assign_gemm(
    df: DataFrame, idc: str, vec: str, cent_rows: list, keep_n: int
) -> DataFrame:
    """Top-``keep_n`` nearest-centroid cells per row via one Arrow
    mapInPandas GEMM pass — zero exchanges, no n x k row expansion.
    Mirrors the crossJoin path's semantics exactly: sims rounded to 9,
    ties broken (sim desc, cid asc), zero-norm vectors score NaN-free 0
    against every cell (the exact path's NULL sims likewise lose every
    ordering)."""
    import numpy as np
    import pandas as pd

    crows = sorted(cent_rows, key=lambda r: r["cid"])
    cids = np.array([r["cid"] for r in crows], dtype=np.int64)
    cm = np.array([list(r["cv"]) for r in crows], dtype=np.float64)
    cn = np.linalg.norm(cm, axis=1)
    cn[cn == 0.0] = 1.0
    cmn = cm / cn[:, None]
    kn = min(keep_n, len(cids))

    def run(batches):
        for pdf in batches:
            for s in range(0, len(pdf), 4096):
                chunk = pdf.iloc[s : s + 4096]
                vm = np.array(list(chunk["_v"]), dtype=np.float64)
                if vm.size == 0:
                    continue
                vn = np.linalg.norm(vm, axis=1)
                vn[vn == 0.0] = 1.0
                sims = np.round((vm / vn[:, None]) @ cmn.T, 9)
                if kn == 1:
                    # argmax returns the FIRST max — cids sorted asc, so
                    # ties break to the smaller cell id like the window
                    best = np.argmax(sims, axis=1)[:, None]
                else:
                    part = np.argpartition(-sims, kn - 1, axis=1)[:, :kn]
                    psims = np.take_along_axis(sims, part, axis=1)
                    # order the shortlist by (sim desc, cid asc);
                    # lexsort's last key is primary
                    order = np.lexsort(
                        (cids[part], -psims), axis=1
                    )
                    best = np.take_along_axis(part, order, axis=1)
                n = len(chunk)
                yield pd.DataFrame(
                    {
                        "_id": np.repeat(chunk["_id"].to_numpy(), kn),
                        "_v": [v for v in chunk["_v"] for _ in range(kn)],
                        "cid": cids[best].reshape(-1),
                    }
                )

    src = fan_out(df).select(
        F.col(idc).cast("long").alias("_id"), _as_double(F.col(vec)).alias("_v")
    )
    return src.mapInPandas(run, schema="_id long, _v array<double>, cid long")


def _lsh_buckets_pandas(
    df: DataFrame,
    id_name: str,
    vec_name: str,
    n_planes: int,
    n_tables: int,
    seed: int = 12345,
) -> DataFrame:
    """(id, vec, table, bucket) rows via ONE numpy GEMM per Arrow batch.

    Hyperplanes come from a seeded numpy PCG64 generator — bit-stable
    across runs and machines, so corpus bucketing can happen at write
    time and queries years later still land in the same buckets. The
    per-element lambda formulation (``lsh_bucket_keys``) computes the
    same structure JVM-side but interprets every multiply — fine for a
    handful of vectors, ~40x slower per million (kept for reference).
    """
    import numpy as np
    import pandas as pd

    out_schema = f"{id_name} long, {vec_name} array<double>, table int, bucket long"
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    def run(batches):
        planes = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array(list(pdf[vec_name]), dtype=np.float64)
            if planes is None:
                rng = np.random.default_rng(seed)
                planes = rng.standard_normal((n_tables * n_planes, m.shape[1]))
            bits = (m @ planes.T) >= 0  # (rows, T*P)
            bits = bits.reshape(len(pdf), n_tables, n_planes)
            buckets = (bits * weights).sum(axis=2)  # (rows, T)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_name: np.repeat(pdf[id_name].to_numpy(), n_tables),
                    vec_name: [v for v in pdf[vec_name] for _ in range(n_tables)],
                    "table": np.tile(np.arange(n_tables, dtype=np.int32), n),
                    "bucket": buckets.reshape(-1),
                }
            )

    return fan_out(df).mapInPandas(run, schema=out_schema)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int | None = 8,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: score only bucket-colliding candidates.

    Same output schema as ``cosine_topk``; recall < 1 by design. The
    corpus side is bucketed once (write-time in a real deployment);
    lookups become equi-joins on (table, bucket).

    ``n_planes=None`` derives the hash width from the corpus row count
    (``auto_n_planes``: constant expected bucket occupancy) — the
    production form; a fixed width turns quadratic as the corpus grows
    (see auto_n_planes' docstring for the measured failure). The count
    is one metadata-cheap job, the analog of auto_n_cells' fingerprint
    scan; at write-time deployment the width is chosen once at index
    build.
    """
    if n_planes is None:
        n_planes = auto_n_planes(corpus.count())
    c = _lsh_buckets_pandas(
        corpus.select(
            F.col(id_col).cast("long").alias("neighbor_id"),
            _as_double(F.col(vec_col)).alias("cv"),
        ),
        "neighbor_id",
        "cv",
        n_planes,
        n_tables,
    ).select("neighbor_id", "cv", F.struct("table", "bucket").alias("bk"))
    q = _lsh_buckets_pandas(
        queries.select(
            F.col(id_col).cast("long").alias("query_id"),
            _as_double(F.col(vec_col)).alias("qv"),
        ),
        "query_id",
        "qv",
        n_planes,
        n_tables,
    ).select("query_id", "qv", F.struct("table", "bucket").alias("bk"))
    cand = (
        c.join(F.broadcast(q), ["bk"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "qv", "neighbor_id", "cv")
        .distinct()
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 9).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", prefix: str = "q"
) -> DataFrame:
    """Per-vector int8 min-max quantization: `{prefix}vec` tinyint array
    plus `{prefix}scale`/`{prefix}min` for dequantization — a 4x (vs
    float32) / 8x (vs float64) storage cut for the candidate tier of a
    100 TB ANN index; re-rank the shortlist against full-precision
    vectors. Pure expressions, map-side only, no shuffle.

    Scale/offset are MATERIALIZED columns before the transform lambda —
    captured expressions would recompute array_min/array_max per
    element (lambda-inlining hazard, see operators/dedup.py).
    """
    v = F.col(vec_col)
    base = df.withColumn("__vmin", F.array_min(v)).withColumn(
        "__scale",
        F.when(
            F.array_max(v) > F.array_min(v),
            (F.array_max(v) - F.array_min(v)) / F.lit(254.0),
        ).otherwise(F.lit(1.0)),
    )
    q = F.transform(
        v,
        lambda x: (
            F.round((x - F.col("__vmin")) / F.col("__scale")) - F.lit(127)
        ).cast("tinyint"),
    )
    return (
        base.withColumn(f"{prefix}vec", q)
        .withColumnRenamed("__vmin", f"{prefix}min")
        .withColumnRenamed("__scale", f"{prefix}scale")
    )


def dequantize_embeddings(
    df: DataFrame, prefix: str = "q", out_col: str = "embedding_dq"
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings` (max error scale/2)."""
    dq = F.transform(
        F.col(f"{prefix}vec"),
        lambda x: (x.cast("double") + F.lit(127.0)) * F.col(f"{prefix}scale")
        + F.col(f"{prefix}min"),
    )
    return df.withColumn(out_col, dq)


# ---------------------------------------------------------------------------
# Product quantization (PQ): the ANN STORAGE tier. Jégou et al. 2011
# ("Product quantization for nearest neighbor search"): split the vector
# into m subspaces, k-means each subspace to k centroids, store each
# vector as m uint8 codes — 64 float32 dims become 8 bytes (32x), and
# approximate distances are m table lookups (ADC) instead of d
# multiplies. Vectors are L2-NORMALIZED first so squared-L2 and cosine
# are interchangeable (cos = 1 - d²/2) and the output schema matches the
# other ANN operators.
#
# Scale shape: training is DRIVER-BOUNDED (seeded numpy Lloyd on the
# same ~4096-row deterministic hash-sample train_ivf_centroids uses;
# codebooks are m*k*sub_dim floats — KBs). Encoding is one vectorized
# Arrow pass over the corpus (argmin via one GEMM per subspace), done
# at WRITE time in a real deployment. Queries scan codes, not vectors:
# the scan moves 8 bytes/vector instead of 256.
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_subspaces: int = 8,
    k: int = 16,
    iters: int = 12,
    seed: int = 7,
    sample_n: int = 4096,
):
    """Seeded per-subspace Lloyd on a bounded deterministic hash-sample.
    Returns a numpy array of shape (n_subspaces, k, dim/n_subspaces).
    Deterministic: same corpus + seed -> bit-identical codebooks, so
    codes written years apart remain comparable."""
    import numpy as np

    n = corpus.count()
    train = corpus
    if sample_n and n > sample_n:
        mod = 1_000_003
        thresh = int(mod * (sample_n / n))
        train = corpus.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod)) < F.lit(thresh)
        )
    rows = train.select(_as_double(F.col(vec_col)).alias("v")).collect()
    _check_sample_collect(len(rows), sample_n, "train_pq_codebooks")
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    if x.ndim != 2 or x.shape[0] < k:
        raise ValueError(
            f"PQ training needs >= k={k} sampled vectors, got {x.shape}"
        )
    d = x.shape[1]
    if d % n_subspaces:
        raise ValueError(f"dim {d} not divisible by n_subspaces {n_subspaces}")
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    sub = d // n_subspaces
    rng = np.random.default_rng(seed)
    books = np.empty((n_subspaces, k, sub))
    for s in range(n_subspaces):
        books[s] = _lloyd(x[:, s * sub : (s + 1) * sub], k, iters, rng)
    return books


def _lloyd(xs, k: int, iters: int, rng):
    """Seeded numpy Lloyd (shared by PQ subspace codebooks and the
    IVF-PQ coarse quantizer). Empty clusters re-seed to the
    worst-served point."""
    c = xs[rng.choice(len(xs), size=k, replace=False)].copy()
    for _ in range(iters):
        d2 = ((xs[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)
        for j in range(k):
            members = xs[assign == j]
            if len(members):
                c[j] = members.mean(0)
            else:
                c[j] = xs[d2.min(1).argmax()]
    return c


def pq_encode(
    corpus: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — one argmin GEMM per subspace per Arrow
    batch; the codebooks ride the task closure (KBs)."""
    import numpy as np
    import pandas as pd

    books = np.asarray(codebooks)
    m, _, sub = books.shape

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for s in range(m):
                xs = x[:, s * sub : (s + 1) * sub]
                # ||x-c||² argmin == (−2x·c + ||c||²) argmin
                d2 = -2.0 * (xs @ books[s].T) + (books[s] ** 2).sum(1)
                codes[:, s] = d2.argmin(1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    src = fan_out(corpus).select(
        F.col(id_col).cast("long").alias(id_col),
        _as_double(F.col(vec_col)).alias(vec_col),
    )
    return src.mapInPandas(run, schema=f"{id_col} long, codes array<int>")


def _finalize_topk(
    scored: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    rerank: int,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Shared ADC tail: global rank (cosine desc, neighbor id tie-break)
    + optional exact re-rank of the ``rerank*k`` shortlist. The query
    side is broadcast into the re-rank join only when the caller
    KNOWS it is small (the driver-LUT paths); the distributed
    corpus-vs-corpus path passes False and lets AQE pick."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    if not rerank:
        return (
            scored.select(
                "query_id", "neighbor_id", F.round("cosine", 9).alias("cosine")
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )
    short = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= rerank * k)
        .select("query_id", "neighbor_id")
    )
    qdf = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    )
    if broadcast_queries:
        qdf = F.broadcast(qdf)
    cdf = corpus.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    )
    exact = (
        short.join(cdf, "neighbor_id")
        .join(qdf, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 9).alias("cosine"),
        )
    )
    return exact.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _exact_shortlist(d2k, idk, shortlist: int):
    """Indices of the first ``shortlist`` elements in (d2 asc, id asc)
    order — EXACTLY ``np.lexsort((idk, d2k))[:shortlist]`` but with an
    O(n) partition instead of a full O(n log n) sort (round-12 ADC
    scorer cut): every element strictly below the ``shortlist``-th
    distance must make the cut, ties AT that distance compete by id
    inside the tiny candidate set, and (d2, id) is a total order (ids
    unique), so the returned prefix is identical to the full sort's."""
    import numpy as np

    n = len(d2k)
    if n <= shortlist:
        return np.lexsort((idk, d2k))
    kth = np.partition(d2k, shortlist - 1)[shortlist - 1]
    cand = np.flatnonzero(d2k <= kth)
    sub = np.lexsort((idk[cand], d2k[cand]))
    return cand[sub[:shortlist]]


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_subspaces: int = 8,
    n_centroids: int = 256,
    seed: int = 7,
    rerank: int = 4,
    codebooks=None,
    max_query_rows: int | None = MAX_QUERY_COLLECT_ROWS,
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC) with
    exact re-ranking: the corpus is scanned as PQ CODES (8
    bytes/vector); each query precomputes an (m x k) lookup table of
    sub-distances to every centroid, and a candidate's distance is m
    table lookups summed — one fancy-index + sum per Arrow batch, no
    per-row Python. The ADC top ``rerank*k`` shortlist then fetches its
    TRUE vectors (an equi-join where the shortlist side is tiny — AQE
    broadcasts it) and re-ranks by exact cosine — the standard ADC+R
    recipe: the full-vector read cost is paid for shortlist rows only,
    never the corpus scan. ``rerank=0`` ranks by raw ADC distance.

    Output schema matches ``cosine_topk`` (query_id, neighbor_id,
    cosine, rank); with re-ranking, ``cosine`` is exact for the
    returned rows (recall is bounded by shortlist quality,
    test-measured vs the exact scan)."""
    import numpy as np

    # Codebook training is an OFFLINE index-build step in a real
    # deployment (train once at write time, serve many queries) —
    # callers pass ``codebooks`` to reuse a trained set.
    books = (
        np.asarray(codebooks)
        if codebooks is not None
        else train_pq_codebooks(
            corpus, id_col, vec_col, n_subspaces, n_centroids, seed=seed
        )
    )
    m, _, sub = books.shape
    q_ids, qx = _collect_query_vectors(
        queries, id_col, vec_col, "pq_topk", max_query_rows
    )
    # (n_queries, m, k): squared sub-distances query -> every centroid
    luts = np.stack(
        [
            ((qx[:, s * sub : (s + 1) * sub][:, None, :] - books[s][None]) ** 2)
            .sum(-1)
            for s in range(m)
        ],
        axis=1,
    )

    codes = pq_encode(corpus, books, id_col, vec_col).withColumnRenamed(
        id_col, "neighbor_id"
    )

    import pandas as pd

    shortlist = max(1, rerank) * k

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c = np.array(list(pdf["codes"]), dtype=np.int64)  # (rows, m)
            ids = pdf["neighbor_id"].to_numpy()
            # numpy accumulation + ONE frame per batch (guide §4.2 —
            # same cut as _adc_block_scorer; values bit-identical)
            q_out, n_out, d_out = [], [], []
            arange_m = np.arange(m)
            for qi in range(len(q_ids)):
                d2 = luts[qi, arange_m, c].sum(1)  # (rows,)
                keep = ids != q_ids[qi]
                d2k, idk = d2[keep], ids[keep]
                # neighbor-id tie-break: quantized codes collide, so equal
                # ADC distances are common — the exact-shortlist cut keeps
                # the selection deterministic across batch compositions
                # (and exactly matches pq_topk_distributed's blocks).
                top = _exact_shortlist(d2k, idk, shortlist)
                q_out.append(np.full(len(top), q_ids[qi], dtype=np.int64))
                n_out.append(idk[top])
                d_out.append(d2k[top])
            if q_out:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(q_out),
                        "neighbor_id": np.concatenate(n_out),
                        "cosine": 1.0 - np.concatenate(d_out) / 2.0,
                    }
                )

    scored = codes.mapInPandas(
        score, schema="query_id long, neighbor_id long, cosine double"
    )
    return _finalize_topk(
        scored, corpus, queries, id_col, vec_col, k, rerank
    )


def pq_topk_distributed(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_subspaces: int = 8,
    n_centroids: int = 256,
    seed: int = 7,
    rerank: int = 4,
    codebooks=None,
    queries_per_block: int = 512,
    codes_per_block: int = 65536,
    n_corpus: int | None = None,
    n_queries: int | None = None,
) -> DataFrame:
    """Corpus-vs-corpus ADC: the distributed fallback past ``pq_topk``'s
    driver-collect guard (VERDICT r5 #4). No driver-side query collect
    anywhere — the per-query lookup tables are built as a DATAFRAME of
    packed query-blocks and scoring is a block x block join:

      1. queries -> ``n_qblocks`` rows, each one packed float64 LUT for
         ~``queries_per_block`` queries (built per-block in Arrow, the
         same ``(q_sub - centroid)^2`` expression as the driver path, so
         distances are bit-identical);
      2. corpus PQ codes -> ``n_cblocks`` packed rows of ~``codes_per_block``
         codes each (at 100 TB this table is written once at index-build
         time, 8 bytes/vector);
      3. every (code-block, query-block) pair is scored in one
         vectorized fancy-index pass; only each query's local
         ``rerank*k`` shortlist leaves the task — the shuffle carries
         O(n_qblocks * n_cblocks * queries_per_block * rerank * k)
         candidate rows, never the n x nq score matrix.

    Why not the literal per-(subspace, code) equi-join: that key space
    has only m*k (~2k) distinct values — a maximally skewed shuffle —
    and the per-(query, neighbor) partial sums land in m different
    partitions, so no map-side combine is possible and n*nq*m rows
    would cross the exchange. Block-packing keeps the same "LUTs as a
    DataFrame, score via join" shape with a sane plan: the join is a
    declared cartesian of n_cblocks x n_qblocks PACK rows (the
    parallelism grid, exactly `cosine_dup_pairs_blocked`'s shape), and
    the total work is the same Theta(nq * n) any corpus-vs-corpus ADC
    pays.

    Output and semantics match ``pq_topk`` exactly (parity-tested on
    both rerank paths at the guard boundary)."""
    import numpy as np
    import pandas as pd

    books = (
        np.asarray(codebooks)
        if codebooks is not None
        else train_pq_codebooks(
            corpus, id_col, vec_col, n_subspaces, n_centroids, seed=seed
        )
    )
    m, kc, sub = books.shape
    nq = n_queries if n_queries is not None else queries.count()
    n = n_corpus if n_corpus is not None else corpus.count()
    n_qblocks = max(1, -(-nq // queries_per_block))
    n_cblocks = max(1, -(-n // codes_per_block))
    shortlist = max(1, rerank) * k

    q = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    ).withColumn(
        "qblock",
        F.pmod(F.xxhash64(F.col("query_id")), F.lit(n_qblocks)).cast("int"),
    )

    def pack_queries(pdf: pd.DataFrame) -> pd.DataFrame:
        qx = np.array(list(pdf["qv"]), dtype=np.float64)
        # same normalization expression as the old in-block LUT build;
        # the LUT itself is built task-side in _adc_block_scorer from
        # the SAME (q_sub - centroid)^2 expression, so distances stay
        # bit-identical while the shuffled payload shrinks from
        # (nq, m, kc) LUT doubles to (nq, d) vector doubles (~43x)
        qx = qx / np.maximum(np.linalg.norm(qx, axis=1, keepdims=True), 1e-12)
        return pd.DataFrame(
            {
                "qblock": [int(pdf["qblock"].iloc[0])],
                "q_ids": [pdf["query_id"].to_numpy(np.int64).tobytes()],
                "qvs": [qx.tobytes()],
            }
        )

    qpacks = q.groupBy("qblock").applyInPandas(
        pack_queries, schema="qblock int, q_ids binary, qvs binary"
    )

    codes = pq_encode(corpus, books, id_col, vec_col).withColumn(
        "cblock",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_cblocks)).cast("int"),
    )

    def pack_codes(pdf: pd.DataFrame) -> pd.DataFrame:
        c = np.array(list(pdf["codes"]), dtype=np.int32)
        return pd.DataFrame(
            {
                "cblock": [int(pdf["cblock"].iloc[0])],
                "nbr_ids": [pdf[id_col].to_numpy(np.int64).tobytes()],
                "packed": [c.tobytes()],
            }
        )

    codes_packed = codes.groupBy("cblock").applyInPandas(
        pack_codes, schema="cblock int, nbr_ids binary, packed binary"
    )

    pairs = codes_packed.crossJoin(qpacks)

    scored = pairs.mapInPandas(
        _adc_block_scorer(m, kc, shortlist, books),
        schema="query_id long, neighbor_id long, cosine double",
    )
    return _finalize_topk(
        scored, corpus, queries, id_col, vec_col, k, rerank,
        broadcast_queries=False,
    )


def _adc_block_scorer(m: int, kc: int, shortlist: int, books):
    """(code-block x query-block) ADC scoring kernel for the pure-PQ
    distributed scorer (the IVFADC sibling fused into a cogroup in
    round 13 — see _adc_cell_scorer).

    LUTs are built HERE, task-side, from the packed unit-normalized
    query vectors — the same ``(q_sub - centroid)^2`` / residual
    expressions as the driver-LUT paths, so distances stay
    bit-identical. Shipping vectors instead of LUT rows cuts the
    Python->JVM->shuffle->Python payload by m*kc/d (~170x at the
    default m=8, kc=256, d=48): the round-12 stage decomposition
    measured the packed-LUT DataFrame as the dominant stage (~4 s of a
    ~7 s pre-finalize pipeline at sf0.1 — 262 MB of LUT rows crossing
    three serialization boundaries), exactly the guide §8 rule: move
    the lightweight proxy, not the heavy payload. The rebuild cost is
    one (nq_block, m, kc) numpy pass per (code-block, query-block)
    pair — ~20 ms — repeated per code block of the same cell, which is
    noise next to the ADC scan it precedes.

    The per-query LUT gather stays a ROW loop — lut[qi] is a
    cache-resident (m, kc) table and the batched (nq, rows) gather
    measured 10-30x SLOWER on this box (round-12 work log, "tried and
    reverted") — and output assembly is numpy accumulation + ONE
    DataFrame per input batch: the previous per-query ``pd.DataFrame``
    + giant ``pd.concat`` built tens of thousands of 20-row frames per
    task (guide §4.2)."""
    import numpy as np
    import pandas as pd

    books = np.asarray(books)
    sub = books.shape[2]
    arange_m = np.arange(m)

    def score(batches):
        for pdf in batches:
            q_out: list = []
            n_out: list = []
            d_out: list = []
            for i in range(len(pdf)):
                ids = np.frombuffer(pdf["nbr_ids"].iloc[i], dtype=np.int64)
                c = (
                    np.frombuffer(pdf["packed"].iloc[i], dtype=np.int32)
                    .reshape(-1, m)
                    .astype(np.int64)
                )
                qids = np.frombuffer(pdf["q_ids"].iloc[i], dtype=np.int64)
                qx = np.frombuffer(
                    pdf["qvs"].iloc[i], dtype=np.float64
                ).reshape(len(qids), -1)
                lut = np.empty((len(qids), m, kc), dtype=np.float64)
                # plain ADC LUT — identical expression to pq_topk's
                # driver-side build
                for s in range(m):
                    xs = qx[:, s * sub : (s + 1) * sub]
                    lut[:, s, :] = (
                        (xs[:, None, :] - books[s][None]) ** 2
                    ).sum(-1)
                for qi in range(len(qids)):
                    d2 = lut[qi, arange_m, c].sum(1)
                    keep = ids != qids[qi]
                    d2k, idk = d2[keep], ids[keep]
                    top = _exact_shortlist(d2k, idk, shortlist)
                    q_out.append(
                        np.full(len(top), qids[qi], dtype=np.int64)
                    )
                    n_out.append(idk[top])
                    d_out.append(d2k[top])
            if q_out:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(q_out),
                        "neighbor_id": np.concatenate(n_out),
                        "cosine": 1.0 - np.concatenate(d_out) / 2.0,
                    }
                )

    return score


# ---------------------------------------------------------------------------
# IVF-PQ (IVFADC, Jégou et al. 2011 §IV): the composition production ANN
# systems actually deploy. The coarse quantizer partitions the corpus
# into cells (queries probe n_probe cells instead of scanning
# everything); within a cell, vectors are stored as PQ codes of their
# RESIDUAL x - centroid (residuals are far more compact than raw
# vectors, so the same 8-byte budget buys much finer resolution), and
# candidates are scored by ADC lookup tables built per (query, probed
# cell). The exact re-rank tail is shared with pq_topk.
# ---------------------------------------------------------------------------


def train_ivfpq_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int | None = 16,
    n_subspaces: int = 8,
    n_centroids: int = 256,
    iters: int = 12,
    seed: int = 7,
    sample_n: int = 4096,
):
    """Driver-bounded index training: coarse centroids by seeded Lloyd
    on the deterministic hash-sample, then PQ codebooks trained on the
    sample's RESIDUALS. Returns (centroids (n_cells, d), books
    (m, k, d/m)) — KBs, deterministic. ``n_cells=None`` derives the
    cell count from the corpus size (auto_n_cells, k ~ sqrt(n)) so
    per-cell code-list length — each probed query's scoring cost —
    grows as sqrt(n), not n (the fixed-k lesson, VERDICT r7 #4 /
    round-10 LSH probe)."""
    import numpy as np

    n = corpus.count()
    if n_cells is None:
        n_cells = auto_n_cells(n)
    train = corpus
    if sample_n and n > sample_n:
        mod = 1_000_003
        thresh = int(mod * (sample_n / n))
        train = corpus.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod)) < F.lit(thresh)
        )
    rows = train.select(_as_double(F.col(vec_col)).alias("v")).collect()
    _check_sample_collect(len(rows), sample_n, "train_ivfpq_index")
    x = np.array([r["v"] for r in rows], dtype=np.float64)
    if x.ndim != 2 or x.shape[0] < max(n_cells, n_centroids):
        raise ValueError(
            f"IVF-PQ training needs >= {max(n_cells, n_centroids)} sampled "
            f"vectors, got {x.shape}"
        )
    d = x.shape[1]
    if d % n_subspaces:
        raise ValueError(f"dim {d} not divisible by n_subspaces {n_subspaces}")
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    centroids = _lloyd(x, n_cells, iters, rng)
    assign = (
        (-2.0 * (x @ centroids.T) + (centroids**2).sum(1)).argmin(1)
    )
    resid = x - centroids[assign]
    sub = d // n_subspaces
    books = np.empty((n_subspaces, n_centroids, sub))
    for s in range(n_subspaces):
        books[s] = _lloyd(resid[:, s * sub : (s + 1) * sub], n_centroids, iters, rng)
    return centroids, books


def ivfpq_encode(
    corpus: DataFrame,
    centroids,
    books,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cid, codes): nearest-cell assignment + residual PQ codes in
    one Arrow pass (write-time partitioning in a real deployment — the
    codes table would be PARTITIONED BY cid so a probe reads only its
    cells)."""
    import numpy as np
    import pandas as pd

    cents = np.asarray(centroids)
    bks = np.asarray(books)
    m, _, sub = bks.shape

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array(list(pdf[vec_col]), dtype=np.float64)
            x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
            cid = (-2.0 * (x @ cents.T) + (cents**2).sum(1)).argmin(1)
            resid = x - cents[cid]
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for s in range(m):
                rs = resid[:, s * sub : (s + 1) * sub]
                codes[:, s] = (
                    -2.0 * (rs @ bks[s].T) + (bks[s] ** 2).sum(1)
                ).argmin(1)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cid": cid.astype(np.int32),
                    "codes": list(codes),
                }
            )

    src = fan_out(corpus).select(
        F.col(id_col).cast("long").alias(id_col),
        _as_double(F.col(vec_col)).alias(vec_col),
    )
    return src.mapInPandas(run, schema=f"{id_col} long, cid int, codes array<int>")


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    n_subspaces: int = 8,
    n_centroids: int = 256,
    seed: int = 7,
    rerank: int = 4,
    index=None,
    max_query_rows: int | None = MAX_QUERY_COLLECT_ROWS,
    max_lut_bytes: int | None = 512 << 20,
) -> DataFrame:
    """IVFADC top-k: probe ``n_probe`` cells per query, ADC-score only
    their members' residual codes (per-(query, cell) lookup tables ride
    the task closure — n_queries*n_probe*m*k floats, MBs at most), exact
    re-rank of the shortlist; ``rerank=0`` skips the re-rank joins and
    ranks by raw ADC distance (same contract as ``pq_topk``). Output
    schema matches ``cosine_topk``.

    At 100 TB the cell assignment is the table's physical partitioning,
    so each query's IO is n_probe cells of 8-byte codes — neither the
    raw vectors nor the other cells are read. ``index`` takes a trained
    (centroids, books) pair (offline build); None trains in place.

    ``max_lut_bytes`` guards the DRIVER-BUILT lookup tables in BYTES —
    the row guard alone missed that LUT size also scales with n_probe
    (the round-10 1000x probe OOMed the py4j broadcast on a 2.1 GB
    closure from only 5k queries once auto-n_probe reached 26); past
    the budget this raises with a pointer to ivfpq_topk_distributed,
    whose LUTs are DataFrame rows, not a closure."""
    import numpy as np
    import pandas as pd

    cents, books = (
        index
        if index is not None
        else train_ivfpq_index(
            corpus, id_col, vec_col, n_cells, n_subspaces, n_centroids, seed=seed
        )
    )
    cents = np.asarray(cents)
    books = np.asarray(books)
    m, _, sub = books.shape

    q_ids, qx = _collect_query_vectors(
        queries, id_col, vec_col, "ivfpq_topk", max_query_rows
    )
    cell_d2 = -2.0 * (qx @ cents.T) + (cents**2).sum(1)  # (nq, n_cells)
    probe_cells = np.argsort(cell_d2, axis=1, kind="stable")[:, :n_probe]
    # LUT[qi, pi, s, j] = || (q - c_cell)_s - book[s][j] ||^2
    nq = len(q_ids)
    lut_bytes = nq * min(n_probe, cents.shape[0]) * m * books.shape[1] * 8
    if max_lut_bytes is not None and lut_bytes > max_lut_bytes:
        raise ValueError(
            f"ivfpq_topk: driver LUT would be {lut_bytes / 1e6:.0f} MB "
            f"({nq} queries x {n_probe} probes x {m} x {books.shape[1]} "
            f"doubles) > max_lut_bytes={max_lut_bytes / 1e6:.0f} MB; use "
            "ivfpq_topk_distributed (LUTs as packed DataFrame rows, no "
            "driver closure) or raise max_lut_bytes deliberately."
        )
    luts = np.empty((nq, n_probe, m, books.shape[1]))
    for qi in range(nq):
        for pi in range(n_probe):
            r = qx[qi] - cents[probe_cells[qi, pi]]
            for s in range(m):
                rs = r[s * sub : (s + 1) * sub]
                luts[qi, pi, s] = ((books[s] - rs) ** 2).sum(1)

    codes = ivfpq_encode(corpus, cents, books, id_col, vec_col).withColumnRenamed(
        id_col, "neighbor_id"
    )
    shortlist = max(1, rerank) * k

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            c = np.array(list(pdf["codes"]), dtype=np.int64)
            cid = pdf["cid"].to_numpy()
            ids = pdf["neighbor_id"].to_numpy()
            # batch rows grouped by cell ONCE — the old per-(query,
            # probe) boolean mask rescanned the whole batch
            # nq * n_probe times (round-12 scorer cut); the group
            # arrays preserve batch order within each cell, so the
            # candidate concatenation below is unchanged.
            cells_in_batch = {}
            for cell in np.unique(cid):
                cells_in_batch[int(cell)] = np.flatnonzero(cid == cell)
            # numpy accumulation + ONE frame per batch, not a pandas
            # DataFrame per query (guide §4.2 — same cut as
            # _adc_block_scorer; values bit-identical)
            q_out, n_out, d_out = [], [], []
            arange_m = np.arange(m)
            for qi in range(nq):
                d2s, idss = [], []
                for pi in range(n_probe):
                    rows_ix = cells_in_batch.get(int(probe_cells[qi, pi]))
                    if rows_ix is None:
                        continue
                    sel = rows_ix[ids[rows_ix] != q_ids[qi]]
                    if sel.size == 0:
                        continue
                    cm = c[sel]
                    d2s.append(luts[qi, pi, arange_m, cm].sum(1))
                    idss.append(ids[sel])
                if not d2s:
                    continue
                d2 = np.concatenate(d2s)
                idk = np.concatenate(idss)
                # neighbor-id tie-break (see pq_topk): deterministic
                # shortlist cut under code collisions.
                top = _exact_shortlist(idk=idk, d2k=d2, shortlist=shortlist)
                q_out.append(np.full(len(top), q_ids[qi], dtype=np.int64))
                n_out.append(idk[top])
                d_out.append(d2[top])
            if q_out:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(q_out),
                        "neighbor_id": np.concatenate(n_out),
                        "cosine": 1.0 - np.concatenate(d_out) / 2.0,
                    }
                )

    scored = codes.mapInPandas(
        score, schema="query_id long, neighbor_id long, cosine double"
    )
    return _finalize_topk(
        scored, corpus, queries, id_col, vec_col, k, rerank
    )


def _cell_blocks(df: DataFrame, cell_col: str, hash_col: str, per_block: int):
    """Per-cell block id for packed scoring groups: modulus =
    ``ceil(|cell| / per_block)`` from a broadcast per-cell histogram —
    group sizes stay bounded by ~``per_block`` rows under ANY cell-size
    skew (a hot cell gets proportionally MORE blocks, never bigger
    ones). Returns ``df`` + ``__blk``."""
    counts = df.groupBy(cell_col).agg(F.count(F.lit(1)).alias("__cn"))
    return (
        df.join(F.broadcast(counts), cell_col)
        .withColumn(
            "__blk",
            F.pmod(
                F.xxhash64(F.col(hash_col)),
                F.greatest(
                    F.lit(1),
                    F.ceil(F.col("__cn") / F.lit(per_block)).cast("long"),
                ),
            ).cast("int"),
        )
        .drop("__cn")
    )


def ivfpq_topk_distributed(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    n_subspaces: int = 8,
    n_centroids: int = 256,
    seed: int = 7,
    rerank: int = 4,
    index=None,
    queries_per_block: int = 512,
    codes_per_block: int = 65536,
) -> DataFrame:
    """Corpus-vs-corpus IVFADC (VERDICT r6 #4): the IVF-cell composition
    of ``pq_topk_distributed``. The pure-PQ distributed scorer pays the
    full n_cblocks x n_qblocks grid — Θ(nq·n) ADC work, intrinsic to
    all-pairs ADC — so at corpus-vs-corpus scale the coarse quantizer is
    the sub-quadratic swap: code blocks are partitioned BY COARSE CELL
    and each query block joins ONLY its cell's code blocks, bounding
    per-query work to its ``n_probe`` probed cells exactly as
    single-query IVFADC does (Jégou et al. 2011 §IV).

    No driver-side query collect anywhere:

      1. queries -> map-side probe assignment (centroids ride the task
         closure, KBs): each query replicates to ``n_probe``
         (query, cell) rows with its unit-normalized vector;
      2. corpus residual-PQ codes get a per-cell block id
         (``ceil(|cell| / codes_per_block)`` moduli from a broadcast
         histogram) — at 100 TB this table is written once at
         index-build time, PARTITIONED BY cell, so a probe reads only
         its cells' code blocks;
      3. one COGROUP on (cell, code-block): each group sees that
         block's raw code rows plus every query probing the cell
         (probe rows replicate per code block — the (id, d)-sized
         light side), builds residual LUTs task-side in
         ``queries_per_block`` chunks from the SAME expressions as
         ``ivfpq_topk``'s driver build (distances bit-identical), and
         emits only each query's local ``rerank*k`` shortlist. An
         equi-keyed cogroup, never a cross grid (plan-asserted: no
         CartesianProduct / BroadcastNestedLoop).

    Total ADC work is Σ_probed-cells |cell| per query instead of n —
    the n_probe/n_cells fraction of the pure-PQ grid. Cell-size skew:
    block counts are derived PER CELL from measured cell sizes, so a
    hot cell makes MORE bounded-size groups, never bigger tasks; at
    deployment the codes table and its cell histogram are write-time
    artifacts, so only the query side pays the aggregation.

    Output and semantics match ``ivfpq_topk`` exactly (parity-tested on
    both rerank paths at the guard boundary; block partitioning cannot
    change results — every surviving candidate is scored identically
    and local shortlists are supersets of the global cut)."""
    import numpy as np
    import pandas as pd

    cents, books = (
        index
        if index is not None
        else train_ivfpq_index(
            corpus, id_col, vec_col, n_cells, n_subspaces, n_centroids,
            seed=seed,
        )
    )
    cents = np.asarray(cents)
    books = np.asarray(books)
    m, kc, sub = books.shape

    shortlist = max(1, rerank) * k

    src = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    )

    def assign_probes(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            qx = np.array(list(pdf["qv"]), dtype=np.float64)
            qx = qx / np.maximum(
                np.linalg.norm(qx, axis=1, keepdims=True), 1e-12
            )
            # identical probe selection to ivfpq_topk (incl. the stable
            # argsort tie-break on equal cell distances)
            cell_d2 = -2.0 * (qx @ cents.T) + (cents**2).sum(1)
            probe = np.argsort(cell_d2, axis=1, kind="stable")[:, :n_probe]
            reps = np.repeat(np.arange(len(pdf)), n_probe)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"].to_numpy()[reps],
                    "qv": [qx[i] for i in reps],
                    "cell": probe.reshape(-1).astype(np.int32),
                }
            )

    probes = src.mapInPandas(
        assign_probes, schema="query_id long, qv array<double>, cell int"
    )

    # Round-13 stage fusion (VERDICT r12 #1, guide §2.2/§2.3): the old
    # pipeline packed each side into per-(cell, block) rows via two
    # applyInPandas shuffles, equi-joined the packed rows on the cell
    # id, and needed TWO localCheckpoints plus TWO per-cell histogram
    # aggregations to keep the GEMM maps single-execution — ~12 short
    # stages whose fixed overhead dominated the bench line after the
    # round-12 LUT redesign removed the data-volume term. A COGROUP on
    # (cell, code-block) collapses pack+pack+join+score into one
    # exchange per side feeding a single FlatMapCoGroupsInPandas:
    #   - codes keep the SAME skew-bounding block id as before
    #     (pmod(xxhash64(id), ceil(|cell| / codes_per_block)) from the
    #     measured per-cell histogram — a hot cell still splits into
    #     proportionally more bounded tasks, never bigger ones);
    #   - each probe row replicates to every code block of its probed
    #     cell (query rows are (id, d)-sized — the lightweight side);
    #   - query-side LUT batching moves INSIDE the task (chunks of
    #     queries_per_block), so LUT memory stays bounded without a
    #     separate query-block shuffle key.
    # Results are identical: per (query, code-block) the scorer sees
    # the same candidate codes, computes the same residual-LUT
    # distances, and emits the same local shortlist; _finalize_topk's
    # global (cosine desc, id) cut is invariant to block granularity
    # (parity-pinned against the driver-LUT path). The encode GEMM is
    # checkpointed lazily — still the single-execution cut for its two
    # consumers (histogram + cogroup), materialized on first use; at
    # deployment the codes table is a write-time artifact partitioned
    # by cell, so only the bench/ad-hoc path pays it (executor loss
    # recomputes from the truncated lineage's parquet inputs on the
    # cluster deployment path — see ckpt.py for the caveat).
    codes = ivfpq_encode(corpus, cents, books, id_col, vec_col).localCheckpoint(
        eager=False
    )
    counts = codes.groupBy("cid").agg(F.count(F.lit(1)).alias("__cn"))
    nblk = F.greatest(
        F.lit(1),
        F.ceil(F.col("__cn") / F.lit(codes_per_block)).cast("long"),
    )
    codes_b = (
        codes.join(F.broadcast(counts), "cid")
        .withColumn(
            "cblock", F.pmod(F.xxhash64(F.col(id_col)), nblk).cast("int")
        )
        .drop("__cn")
    )
    probes_b = (
        probes.join(F.broadcast(counts), probes["cell"] == counts["cid"])
        .withColumn(
            "cblock",
            F.explode(F.sequence(F.lit(0), (nblk - F.lit(1)).cast("int"))),
        )
        .select("query_id", "qv", "cell", "cblock")
    )

    scored = (
        codes_b.groupBy("cid", "cblock")
        .cogroup(probes_b.groupBy("cell", "cblock"))
        .applyInPandas(
            _adc_cell_scorer(
                m, kc, shortlist, books, cents, id_col, queries_per_block
            ),
            schema="query_id long, neighbor_id long, cosine double",
        )
    )
    return _finalize_topk(
        scored, corpus, queries, id_col, vec_col, k, rerank,
        broadcast_queries=False,
    )


def _adc_cell_scorer(
    m: int, kc: int, shortlist: int, books, cents, id_col: str,
    queries_per_block: int,
):
    """Cogrouped (cell, code-block) IVFADC scoring kernel: one group =
    that block's raw code rows + every query probing the cell. LUTs are
    built task-side from the SAME residual expression as ivfpq_topk's
    driver build (distances bit-identical), in chunks of
    ``queries_per_block`` queries so LUT memory stays bounded no matter
    how many queries probe a hot cell. The per-query LUT gather stays a
    ROW loop and the shortlist uses the O(n) partition — both round-12
    decisions, unchanged (see _adc_block_scorer's docstring for the
    measured reasons)."""
    import numpy as np
    import pandas as pd

    books = np.asarray(books)
    cents = np.asarray(cents)
    sub = books.shape[2]
    arange_m = np.arange(m)

    def _empty() -> "pd.DataFrame":
        return pd.DataFrame(
            {
                "query_id": pd.Series([], dtype="int64"),
                "neighbor_id": pd.Series([], dtype="int64"),
                "cosine": pd.Series([], dtype="float64"),
            }
        )

    def score(cdf: pd.DataFrame, qdf: pd.DataFrame) -> "pd.DataFrame":
        if len(cdf) == 0 or len(qdf) == 0:
            return _empty()
        ids = cdf[id_col].to_numpy(np.int64)
        c = np.array(list(cdf["codes"]), dtype=np.int64)
        cell = int(cdf["cid"].iloc[0])
        qids_all = qdf["query_id"].to_numpy(np.int64)
        qx_all = np.array(list(qdf["qv"]), dtype=np.float64)  # already unit
        q_out: list = []
        n_out: list = []
        d_out: list = []
        for lo in range(0, len(qids_all), queries_per_block):
            qids = qids_all[lo : lo + queries_per_block]
            # residual LUT — identical expression to ivfpq_topk's
            # driver-side build
            resid = qx_all[lo : lo + queries_per_block] - cents[cell]
            lut = np.empty((len(qids), m, kc), dtype=np.float64)
            for s in range(m):
                rs = resid[:, s * sub : (s + 1) * sub]
                lut[:, s, :] = ((books[s][None] - rs[:, None, :]) ** 2).sum(-1)
            for qi in range(len(qids)):
                d2 = lut[qi, arange_m, c].sum(1)
                keep = ids != qids[qi]
                d2k, idk = d2[keep], ids[keep]
                top = _exact_shortlist(d2k, idk, shortlist)
                q_out.append(np.full(len(top), qids[qi], dtype=np.int64))
                n_out.append(idk[top])
                d_out.append(d2k[top])
        if not q_out:
            return _empty()
        return pd.DataFrame(
            {
                "query_id": np.concatenate(q_out),
                "neighbor_id": np.concatenate(n_out),
                "cosine": 1.0 - np.concatenate(d_out) / 2.0,
            }
        )

    return score


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup, Abbas et al. 2023): cluster the embedding
# space with the IVF coarse quantizer, find cosine near-dups WITHIN each
# cluster only, keep one canonical document per duplicate group. The
# clustering turns the O(n^2) all-pairs problem into sum-of-cells
# |cell|^2 work — with k ~ sqrt(n) cells that is O(n^1.5) total and
# each cell is an independent task group. The embedding-space sibling
# of the n-gram cluster closure (dedup_cluster_ngram).
# ---------------------------------------------------------------------------


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "auto",
) -> DataFrame:
    """(id, v, cell, sim): nearest-centroid assignment. ``sim`` is the
    cosine to the assigned centroid (the typicality score SemDeDup's
    keeper policy ranks on); ties break to the smaller cell id on both
    paths.

    ``method="exact"``: centroids broadcast into a cross join scored by
    the Catalyst lambda cosine; Spark 4's WindowGroupLimit keeps the
    per-id shuffle at one row (see ivf_topk's audit note). Right for
    small k — but the lambda fold costs O(k*d) interpreted higher-order
    evaluations PER ROW, which dominates once k scales with the corpus
    (the auto_n_cells 100x probe measured 31.8x wall-clock at 100x data
    with k=448, almost all of it n*k lambda cosines).

    ``method="gemm"``: centroids collect to one small matrix (they are
    broadcast-sized by construction) and one Arrow ``mapInPandas`` pass
    computes (batch x centroids^T) dense BLAS per batch — ZERO
    exchanges, O(n*k*d) flops at GEMM rate. Re-probed at 100x/k=448:
    3.72x wall-clock.

    ``"auto"`` picks gemm at >= 32 cells (measured crossover: at k=45
    on 2k vectors the lambda path costs 1.96 s vs 0.53 s GEMM; below
    ~32 cells the Arrow transfer overhead wins) and exact below.
    """
    cent = centroids.select(
        F.col(id_col).alias("cell"), _as_double(F.col(vec_col)).alias("cv")
    )
    if method == "auto":
        method = "gemm" if cent.count() >= 32 else "exact"
    if method == "exact":
        scored = (
            corpus.select(
                F.col(id_col).cast("long").alias("id"),
                _as_double(F.col(vec_col)).alias("v"),
            )
            .crossJoin(F.broadcast(cent))
            .select(
                "id", "v", "cell", cosine(F.col("v"), F.col("cv")).alias("sim")
            )
        )
        w = Window.partitionBy("id").orderBy(F.col("sim").desc(), F.col("cell"))
        return (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") == 1)
            .select("id", "v", "cell", "sim")
        )

    import numpy as np
    import pandas as pd

    crows = cent.collect()
    crows.sort(key=lambda r: r["cell"])
    cells = np.array([r["cell"] for r in crows], dtype=np.int64)
    cm = np.array([r["cv"] for r in crows], dtype=np.float64)
    cn = np.linalg.norm(cm, axis=1)
    cn[cn == 0.0] = 1.0
    cmn = cm / cn[:, None]

    def assign(batches):
        for pdf in batches:
            for s in range(0, len(pdf), 4096):
                chunk = pdf.iloc[s : s + 4096]
                vm = np.array(list(chunk["v"]), dtype=np.float64)
                vn = np.linalg.norm(vm, axis=1)
                vn[vn == 0.0] = 1.0
                sims = (vm / vn[:, None]) @ cmn.T
                # argmax first-max == smallest cell id (cells sorted asc)
                best = np.argmax(sims, axis=1)
                yield pd.DataFrame(
                    {
                        "id": chunk["id"].to_numpy(),
                        "v": chunk["v"],
                        "cell": cells[best],
                        "sim": sims[np.arange(len(chunk)), best],
                    }
                )

    src = corpus.select(
        F.col(id_col).cast("long").alias("id"),
        _as_double(F.col(vec_col)).alias("v"),
    )
    return src.mapInPandas(
        assign, schema="id long, v array<double>, cell long, sim double"
    )


def semantic_dup_pairs(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    round_to: int = 9,
    block_size: int = 2048,
    n_blocks_per_cell: int | None = None,
    contract: bool = False,
) -> DataFrame:
    """Within-cell cosine near-dup pairs (id1 < id2, cosine >= thr).

    Each cell's members are hash-packed into ~``block_size``-vector
    block rows (FIXED Arrow row size regardless of corpus growth, same
    contract as cosine_dup_pairs_blocked); block pairs join on the cell
    id — an equi-join, so cells co-partition and never compare across
    cells — and one dense GEMM scores each pair. Exact within its cell:
    the only recall loss vs the quadratic baseline is pairs whose
    members landed in different cells, which is the SemDeDup trade by
    design (measured in tests vs cosine_dup_pairs_blocked).

    ``n_blocks_per_cell`` defaults from the AVERAGE cell size (one
    cheap count + the centroid count); a skewed cell then packs larger
    blocks — bounded by |cell| — rather than failing, and the GEMM
    stays dense BLAS either way.

    ``contract=True`` emits locally-union-found (root, member) edges
    instead of every qualifying pair (see _gemm_pair_scorer) — for
    closure consumers only; components are identical, the pair LIST is
    not.
    """
    import math

    if n_blocks_per_cell is None:
        n_cells = max(1, centroids.count())
        avg_cell = corpus.count() / n_cells
        n_blocks_per_cell = max(1, math.ceil(avg_cell / block_size))

    packed = (
        assign_cells(corpus, centroids, id_col, vec_col)
        .select(
            "cell",
            F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks_per_cell)).alias("b"),
            F.struct(F.col("id"), F.col("v")).alias("iv"),
        )
        .groupBy("cell", "b")
        .agg(F.collect_list("iv").alias("items"))
    )
    lhs = packed.select("cell", F.col("b").alias("b1"), F.col("items").alias("items1"))
    rhs = packed.select("cell", F.col("b").alias("b2"), F.col("items").alias("items2"))
    block_pairs = lhs.join(rhs, "cell").filter(F.col("b1") <= F.col("b2"))
    return block_pairs.mapInPandas(
        _gemm_pair_scorer(threshold, round_to, contract=contract),
        schema="id1 long, id2 long, cosine double",
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    round_to: int = 9,
    method: str = "exact",
    max_benchmark_vectors: int = 100_000,
    batch_rows: int = 1024,
) -> DataFrame:
    """EMBEDDING-level decontamination: flag every corpus vector whose
    max cosine against ANY benchmark vector reaches ``threshold`` — the
    semantic sibling of textops.decontaminate's exact-shingle check
    (catches paraphrased/reworded benchmark leakage that no n-gram
    match can see; the standard extra gate in modern pretraining-data
    hygiene, e.g. the embedding-similarity decontamination described in
    the Phi-1 report, Gunasekar et al. 2023 §2.4).

    Output: (id_col, nearest_benchmark_id, max_benchmark_cosine,
    contaminated). Ties on rounded cosine break to the smaller
    benchmark id; an empty benchmark yields 0.0 / NULL / 0 for every
    corpus row.

    ``method="exact"`` (default): the benchmark side broadcasts
    (guarded by ``max_benchmark_vectors`` — the same non-small-side
    refusal as decontaminate's shingle guard) into a cross join scored
    by the Catalyst sequential-fold cosine — bit-compatible with the
    DuckDB oracle — then one partial-aggregated max_by per corpus row;
    the single exchange carries one tiny row per corpus vector.

    ``method="gemm"``: one Arrow ``mapInPandas`` pass computing
    (batch x benchmark^T) dense GEMM per ~``batch_rows``-row batch —
    ZERO exchanges, the 100 TB path when per-row b*d scalar codegen
    work dominates. Row-identical with "exact" at the rounded
    precision (parity-pinned in tests); rows-only evidence class
    because BLAS pairwise summation is not bit-identical to a
    sequential fold.
    """
    if method not in ("exact", "gemm"):
        raise ValueError(f"method must be exact|gemm, got {method!r}")
    n_b = benchmark.count()
    if n_b > max_benchmark_vectors:
        raise ValueError(
            f"semantic_decontaminate: benchmark side has {n_b} vectors "
            f"> max_benchmark_vectors={max_benchmark_vectors}; "
            "broadcasting it would replicate a non-small relation to "
            "every task. Shrink the benchmark or raise the cap if the "
            "broadcast is genuinely affordable."
        )
    ids = corpus.select(F.col(id_col).cast("long").alias(id_col))
    if n_b == 0:
        return ids.select(
            id_col,
            F.lit(None).cast("long").alias("nearest_benchmark_id"),
            F.lit(0.0).alias("max_benchmark_cosine"),
            F.lit(0).alias("contaminated"),
        )
    if method == "exact":
        # norms hoisted OUT of the pair loop (PERFORMANCE.md fix #6):
        # each side's norm computes once per ROW, not once per pair —
        # the product of the same two doubles is bit-identical to the
        # inline form, so oracle parity is unaffected
        b = benchmark.select(
            F.col(id_col).alias("__bid"),
            _as_double(F.col(vec_col)).alias("__bv"),
        ).withColumn("__bn", norm(F.col("__bv")))
        c = fan_out(corpus).select(
            F.col(id_col).cast("long").alias(id_col),
            _as_double(F.col(vec_col)).alias("__cv"),
        ).withColumn("__cn", norm(F.col("__cv")))
        scored = c.crossJoin(F.broadcast(b)).select(
            id_col,
            "__bid",
            F.round(
                dot(F.col("__cv"), F.col("__bv"))
                / F.nullif(F.col("__cn") * F.col("__bn"), F.lit(0.0)),
                round_to,
            ).alias("__cos"),
        )
        best = scored.groupBy(id_col).agg(
            F.max_by(
                F.struct(F.col("__bid"), F.col("__cos")),
                F.struct(F.col("__cos"), (-F.col("__bid")).alias("nb")),
            ).alias("__b")
        )
        return best.select(
            id_col,
            F.col("__b.__bid").cast("long").alias("nearest_benchmark_id"),
            F.col("__b.__cos").alias("max_benchmark_cosine"),
            (F.col("__b.__cos") >= F.lit(threshold)).cast("int").alias(
                "contaminated"
            ),
        )

    import numpy as np
    import pandas as pd

    brows = benchmark.select(
        F.col(id_col).cast("long").alias("i"), _as_double(F.col(vec_col)).alias("v")
    ).collect()
    brows.sort(key=lambda r: r["i"])
    bid = np.array([r["i"] for r in brows], dtype=np.int64)
    bm = np.array([r["v"] for r in brows], dtype=np.float64)
    bn = np.linalg.norm(bm, axis=1)
    bn[bn == 0.0] = 1.0
    bmn = bm / bn[:, None]
    thr = float(threshold)

    def score(batches):
        for pdf in batches:
            for s in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[s : s + batch_rows]
                cm = np.array(list(chunk["v"]), dtype=np.float64)
                cn = np.linalg.norm(cm, axis=1)
                cn[cn == 0.0] = 1.0
                cos = np.round((cm / cn[:, None]) @ bmn.T, round_to)
                # argmax with min-benchmark-id tiebreak: bid is sorted
                # ascending, so np.argmax's first-max rule IS the rule
                best = np.argmax(cos, axis=1)
                mx = cos[np.arange(len(chunk)), best]
                yield pd.DataFrame(
                    {
                        "id": chunk["i"].to_numpy(),
                        "nearest_benchmark_id": bid[best],
                        "max_benchmark_cosine": mx,
                        "contaminated": (mx >= thr).astype("int32"),
                    }
                )

    src = fan_out(corpus).select(
        F.col(id_col).cast("long").alias("i"), _as_double(F.col(vec_col)).alias("v")
    )
    return src.mapInPandas(
        score,
        schema=(
            "id long, nearest_benchmark_id long, "
            "max_benchmark_cosine double, contaminated int"
        ),
    ).withColumnRenamed("id", id_col)


def auto_n_planes(
    n_rows: int, target_occupancy: int = 32, lo: int = 4, hi: int = 24
) -> int:
    """Corpus-size-derived LSH hash width: enough hyperplanes that the
    EXPECTED bucket occupancy n / 2^planes stays ~``target_occupancy``.

    A FIXED plane count silently degrades to quadratic candidate work
    as the corpus grows — bucket occupancy is n/2^planes, so candidates
    per query grow linearly with n and the bucket join's output grows
    n^2/2^planes (the round-10 1000x probe filled the DISK with shuffle
    spill on exactly this: 500k vectors x 4 planes = 31k-vector buckets
    x 8 tables x 5k queries ~ 1.25B candidate rows carrying full
    vectors). Widening the key with log2(n) keeps per-bucket occupancy
    — and therefore per-query candidate count — constant; recall per
    table falls as keys widen, which the multi-table OR compensates
    (same trade FAISS's LSH and the Manku SimHash banding make). Capped
    at ``hi`` (2^24 buckets) because beyond that bucket-key cardinality
    outgrows any realistic shuffle-partition count, and floored at
    ``lo`` so tiny fixtures keep the historical 4-plane behavior."""
    import math

    occ = max(1, n_rows // max(1, target_occupancy))
    return max(lo, min(int(math.ceil(math.log2(max(2, occ)))), hi))


def auto_n_cells(n_rows: int, max_cells: int = 65536) -> int:
    """Corpus-size-derived IVF/SemDeDup cell count: k ~ sqrt(n).

    Balanced cells make the within-cell quadratic work sum(|cell|^2)
    ~= n^2/k, so k ~ sqrt(n) holds total GEMM cost to ~n^1.5 as the
    corpus grows — a FIXED k silently degrades to n^2/const (the
    round-7 probe measured SemDeDup at 5.2x for 100x data only because
    k was pinned; the ratio climbs with another 10x). Capped at
    ``max_cells`` (FAISS-style IVF practice) because cell assignment is
    a per-row O(k*d) broadcast argmin — past ~65k cells the assignment
    scan dominates and a second quantizer level is the right tool."""
    import math

    return max(4, min(int(math.ceil(math.sqrt(max(1, n_rows)))), max_cells))


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.8,
    centroids: DataFrame | None = None,
    n_cells: int | None = None,
    seed: int = 7,
    block_size: int = 2048,
    keeper: str = "min_id",
    n_blocks_per_cell: int | None = None,
) -> DataFrame:
    """SemDeDup assignment: every vector labeled (id, cluster_id,
    is_canonical) where clusters are the transitive closure of
    within-cell cosine-near-dup pairs. ``filter(is_canonical = 1)`` is
    the semantically deduplicated corpus.

    ``keeper`` picks the canonical member per cluster:
    - ``"min_id"`` (default): the cluster's minimum id — the repo-wide
      convention, deterministic and join-free.
    - ``"centroid_far"``: the member with the LOWEST cosine to its
      assigned cell centroid — the SemDeDup paper's policy (Abbas et
      al. 2023 §3: keeping the most atypical example preserves more
      diversity than keeping a random/arbitrary one). One extra
      per-cluster rank window over the (id, sim) table; cluster_id
      stays the min member id either way, so labels are
      policy-independent.

    ``centroids`` accepts a pre-trained quantizer (offline index build,
    same contract as ivf_topk); None trains the seeded KMeans coarse
    quantizer on a bounded hash-sample in place, with ``n_cells=None``
    (the default) deriving k from the corpus row count via
    :func:`auto_n_cells` (k ~ sqrt(n), so within-cell GEMM cost stays
    ~n^1.5 instead of n^2/const as the corpus grows) and scaling the
    training sample to keep >=16 points per centroid. Composition: cells
    (map-side broadcast argmin) -> within-cell GEMM pairs (equi-join on
    cell) -> alternating-star closure (operators/components.py) ->
    assignment join. Every stage is the already-audited primitive.
    """
    from .components import dedup_cluster_assignment

    if keeper not in ("min_id", "centroid_far"):
        raise ValueError(f"keeper must be min_id|centroid_far, got {keeper!r}")
    if centroids is None:
        if n_cells is None:
            n_cells = auto_n_cells(corpus.count())
        centroids = train_ivf_centroids(
            corpus,
            k=n_cells,
            id_col=id_col,
            vec_col=vec_col,
            seed=seed,
            sample_n=max(4096, 16 * n_cells),
        )
    # contract=True: the closure only needs connectivity, so the pair
    # pass emits per-task union-find roots (<= 1 edge per vector)
    # instead of the potentially-quadratic qualifying pair list —
    # components are provably identical (round-10 probe fix)
    pairs = semantic_dup_pairs(
        corpus,
        centroids,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        block_size=block_size,
        n_blocks_per_cell=n_blocks_per_cell,
        contract=True,
    )
    assign = dedup_cluster_assignment(
        corpus, pairs, id_col=id_col, src="id1", dst="id2"
    )
    if keeper == "min_id":
        return assign
    sims = assign_cells(corpus, centroids, id_col, vec_col).select(
        F.col("id").alias(id_col), "sim"
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("sim").asc(), F.col(id_col)
    )
    return (
        assign.drop("is_canonical")
        .join(sims, id_col)
        .withColumn("__r", F.row_number().over(w))
        .withColumn("is_canonical", (F.col("__r") == 1).cast("int"))
        .drop("__r", "sim")
    )


# ---------------------------------------------------------------------------
# Embedding dimensionality reduction: the standard pre-ANN/pre-cluster
# step of a 100 TB embedding pipeline (project 768-dim vectors to the
# 32-64 dims that carry the variance; ANN index size and GEMM cost drop
# proportionally). MLlib PCA: the fit is a distributed covariance +
# driver SVD (deterministic — no RNG in the decomposition), the
# transform is a map-side JVM matrix multiply — no Python anywhere.
# ---------------------------------------------------------------------------


def pca_project(
    corpus: DataFrame,
    n_components: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = 4096,
    model=None,
):
    """Project the embedding column onto its top ``n_components``
    principal axes. Returns ``(projected_df, model)`` where
    ``projected_df`` is (id, embedding: array<double>[n_components])
    and ``model`` the fitted PCAModel (pass it back in to reuse a
    trained projection — the offline index-build contract shared with
    train_ivf_centroids / train_pq_codebooks).

    The fit runs on the bounded deterministic hash-sample (principal
    axes converge long before the full corpus is seen; the covariance
    of a uniform sample is an unbiased estimate), so training cost is
    CONSTANT in corpus size; the projection itself is one map-side
    matvec per row — zero shuffles, scan-bound at any scale.
    """
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    if model is None:
        train = corpus
        if sample_n:
            n = corpus.count()
            if n > sample_n:
                mod = 1_000_003
                thresh = int(mod * (sample_n / n))
                train = corpus.filter(
                    F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod)) < F.lit(thresh)
                )
        feats = train.select(
            array_to_vector(_as_double(F.col(vec_col))).alias("__v")
        )
        model = PCA(k=n_components, inputCol="__v", outputCol="__p").fit(feats)
    src = fan_out(corpus).select(
        F.col(id_col),
        array_to_vector(_as_double(F.col(vec_col))).alias("__v"),
    )
    projected = model.transform(src).select(
        id_col, vector_to_array(F.col("__p")).alias(vec_col)
    )
    return projected, model


def save_ivfpq_index(spark, index, path: str) -> None:
    """Persist a trained IVF-PQ index as ordinary parquet — the offline
    index-build artifact (train once at write time, serve many runs):
    a centroid table (cell, vector) and a codebook table (subspace,
    code, vector). Doubles round-trip parquet exactly, so a reloaded
    index reproduces bit-identical assignments and ADC tables."""
    import numpy as np

    cents, books = index
    cents = np.asarray(cents)
    books = np.asarray(books)
    spark.createDataFrame(
        [(i, [float(x) for x in cents[i]]) for i in range(cents.shape[0])],
        "cell int, v array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    rows = [
        (s, c, [float(x) for x in books[s, c]])
        for s in range(books.shape[0])
        for c in range(books.shape[1])
    ]
    spark.createDataFrame(
        rows, "s int, c int, v array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")


def load_ivfpq_index(spark, path: str):
    """Reload a persisted IVF-PQ index into the (centroids, books)
    numpy pair every ``ivfpq_*`` entry point accepts.

    A truncated or partially-written artifact raises here rather than
    silently yielding np.empty garbage in unfilled codebook cells (and
    therefore wrong ADC distances): the centroid cells must be exactly
    0..n-1 and the codebook must cover every (subspace, code) cell
    exactly once."""
    import numpy as np

    crows = spark.read.parquet(f"{path}/centroids").collect()
    cells = sorted(r["cell"] for r in crows)
    if cells != list(range(len(cells))):
        raise ValueError(
            f"corrupt IVF-PQ index at {path}: centroid cells are not "
            f"contiguous 0..{len(cells) - 1} (got {cells[:5]}...)"
        )
    cents = np.array(
        [r["v"] for r in sorted(crows, key=lambda r: r["cell"])],
        dtype=np.float64,
    )
    brows = spark.read.parquet(f"{path}/codebooks").collect()
    m = 1 + max(r["s"] for r in brows)
    kc = 1 + max(r["c"] for r in brows)
    seen = {(r["s"], r["c"]) for r in brows}
    if len(brows) != m * kc or len(seen) != m * kc:
        raise ValueError(
            f"corrupt IVF-PQ index at {path}: codebook covers "
            f"{len(seen)}/{m * kc} (subspace, code) cells "
            f"({len(brows)} rows) — refuse a partial artifact"
        )
    sub = len(brows[0]["v"])
    books = np.empty((m, kc, sub), dtype=np.float64)
    for r in brows:
        books[r["s"], r["c"]] = r["v"]
    return cents, books


def source_centroid_drift(
    docs: DataFrame,
    emb: DataFrame,
    group_col: str = "source",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-source embedding drift report: each source's centroid norm
    and its cosine to the GLOBAL corpus centroid — the embedding-space
    analog of `text_source_kl` (that compares token distributions; this
    compares semantic mass). A feed whose centroid swings away from the
    global one between crawls is the standard drift alarm before
    retraining mixture weights.

    Scale shape: ONE (group, dim) partial-aggregated sum/count exchange
    (the posexplode is map-side; rows into the shuffle are
    groups x dims, corpus-size-free after partial agg); the global
    centroid re-aggregates that tiny table by dim; the final per-source
    dot/norm agg runs over groups x dims rows. No vector ever collects
    to the driver.

    Output: (group, n_docs, centroid_norm, cos_to_global), floats
    rounded to 6 — fully SQL-expressible (zipped-unnest oracle).
    """
    e = emb.select(
        F.col(vec_id_col).alias(id_col), _as_double(F.col(vec_col)).alias("v")
    )
    j = docs.select(id_col, group_col).join(e, id_col)
    dims = j.select(group_col, F.posexplode("v").alias("dim", "val"))
    byd = dims.groupBy(group_col, "dim").agg(
        F.sum("val").alias("s"), F.count(F.lit(1)).alias("c")
    )
    glob = byd.groupBy("dim").agg(
        (F.sum("s") / F.sum("c")).alias("gm")
    )
    per = byd.select(
        group_col,
        "dim",
        (F.col("s") / F.col("c")).alias("m"),
        F.col("c"),
    ).join(F.broadcast(glob), "dim")
    agg = per.groupBy(group_col).agg(
        F.max("c").cast("long").alias("n_docs"),
        F.sum(F.col("m") * F.col("gm")).alias("_dot"),
        F.sum(F.col("m") * F.col("m")).alias("_nm"),
        F.sum(F.col("gm") * F.col("gm")).alias("_ng"),
    )
    return agg.select(
        group_col,
        "n_docs",
        F.round(F.sqrt("_nm"), 6).alias("centroid_norm"),
        F.round(
            F.col("_dot") / (F.sqrt("_nm") * F.sqrt("_ng")), 6
        ).alias("cos_to_global"),
    )


def jl_project(
    corpus: DataFrame,
    out_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    batch_rows: int = 4096,
) -> DataFrame:
    """Johnson–Lindenstrauss random projection to ``out_dim`` dims via
    the sparse Achlioptas matrix (entries {+s, 0, -s} with prob
    {1/6, 2/3, 1/6}, s = sqrt(3/out_dim) — Achlioptas 2003, the
    database-friendly JL construction; pairwise distances preserved to
    1±eps with out_dim = O(log n / eps²)).

    The projection matrix is DATA-INDEPENDENT: generated from ``seed``
    alone (PCG64), so unlike pca_project there is NO training pass at
    all — no sample, no fit job, nothing to persist beyond the seed.
    At 100 TB that means the whole operator is ONE Arrow mapInPandas
    GEMM over the scan (zero exchanges, plan-asserted in tests), and
    any two clusters/runs/days that share the seed project into the
    SAME space — the property that makes JL the right tool for
    incremental-ingest ANN sketching where PCA would drift with each
    refit. Output: (id_col, vec_col: array<double>[out_dim])."""
    import numpy as np

    if out_dim <= 0:
        raise ValueError(f"out_dim must be positive, got {out_dim}")
    first = corpus.select(vec_col).first()
    id_type = dict(corpus.dtypes)[id_col]
    if first is None:  # empty corpus: empty result, correct schema
        return corpus.sparkSession.createDataFrame(
            [], f"{id_col} {id_type}, {vec_col} array<double>"
        )
    d_in = len(first[0])
    rng = np.random.default_rng(seed)
    s = float(np.sqrt(3.0 / out_dim))
    draws = rng.random((d_in, out_dim))
    mat = np.where(draws < 1 / 6, s, np.where(draws < 5 / 6, 0.0, -s))

    src = fan_out(corpus).select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__v")
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                part = pdf.iloc[lo : lo + batch_rows]
                x = np.asarray(list(part["__v"]), dtype=np.float64)
                p = x @ mat
                yield pd.DataFrame(
                    {id_col: part[id_col].values, vec_col: list(p)}
                )

    return src.mapInPandas(
        run, schema=f"{id_col} {id_type}, {vec_col} array<double>"
    )


def cluster_silhouette(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    batch_rows: int = 4096,
) -> DataFrame:
    """Simplified (centroid-based) silhouette per cluster cell:
    a(x) = ||x − own centroid||, b(x) = min over OTHER centroids
    ||x − c||, s(x) = (b − a)/max(a, b) ∈ [−1, 1] — the clustering-
    quality readout for the learned-domain mixing tier (are the
    k-means cells real structure or noise?). The full silhouette's
    O(n²) pairwise distances are replaced by distances to the k
    centroids — the standard big-data form (the same simplification
    scikit-learn's Davies-Bouldin-style screens make), exact in the
    statistic it claims, approximate only to the classical silhouette.

    Scale: centroids are broadcast-sized by construction; ONE Arrow
    mapInPandas pass computes the n x k distance grid per batch
    (GEMM-expanded ||x||² − 2xCᵀ + ||c||²), takes min/second-min
    per row, and ONE cell agg finishes — the assign_cells(gemm)
    posture with two extra reductions. Output: (cell, n, mean_sil);
    cells as assigned by nearest-centroid, ties to the smaller id."""
    import numpy as np

    cent = centroids.orderBy(id_col).collect()
    cmat = np.asarray([list(r[vec_col]) for r in cent], dtype=np.float64)
    cells = np.asarray([r[id_col] for r in cent], dtype=np.int64)
    if len(cent) < 2:
        raise ValueError("silhouette needs >= 2 centroids")

    src = fan_out(corpus).select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("__v")
    )
    cn2 = (cmat * cmat).sum(axis=1)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                part = pdf.iloc[lo : lo + batch_rows]
                x = np.asarray(list(part["__v"]), dtype=np.float64)
                d2 = (
                    (x * x).sum(axis=1)[:, None]
                    - 2.0 * (x @ cmat.T)
                    + cn2[None, :]
                )
                np.maximum(d2, 0.0, out=d2)
                order = np.argsort(d2, axis=1, kind="stable")
                own = order[:, 0]
                a = np.sqrt(d2[np.arange(len(x)), own])
                b = np.sqrt(d2[np.arange(len(x)), order[:, 1]])
                denom = np.maximum(np.maximum(a, b), 1e-300)
                yield pd.DataFrame(
                    {
                        "cell": cells[own],
                        "sil": (b - a) / denom,
                    }
                )

    scored = src.mapInPandas(run, schema="cell long, sil double")
    return scored.groupBy("cell").agg(
        F.count("*").alias("n"),
        F.round(F.avg("sil"), 6).alias("mean_sil"),
    )
