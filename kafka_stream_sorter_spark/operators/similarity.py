"""Similarity search over the ``embeddings`` table (array<float>, dim 64).

Two tiers (BASELINE.json north star):
* **Brute-force exact top-k** — the correctness baseline. Cosine is a
  JVM-side ``zip_with``/``aggregate`` fold in float64 (embeddings cast up
  from float32 first: float arithmetic is NOT cross-engine stable, float64
  is to ~1e-15). Queries are broadcast against the corpus scan, so the cost
  is one pass over the vectors per query batch — no shuffle of the corpus.
* **Blocked / IVF-style top-k** — the scale path: candidates restricted to
  the query's partition (here the ``label`` column stands in for an IVF
  cluster assignment), turning all-pairs into an equi-join on the block
  key. Same pattern as LSH-bucketed ANN.

Ranking is by cosine ROUNDED to 6 decimals with vec_id tie-break, so the
top-k boundary is engine-independent — with one deliberate exception:
:func:`brute_force_topk_vectorized` ranks on UNROUNDED float64 and omits
the score (see its docstring: BLAS vs sequential-fold summation differs
in the last ulp, so rounding would flip digits at half-boundaries far
more often than unrounded ranks diverge on random data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns — one fused fold, no
    UDF. Delegates to the same folds every operator uses
    (:func:`vec_norm` + :func:`cosine_with_norms`), so the fold-order
    invariant lives in exactly one place."""
    return cosine_with_norms(a, b, vec_norm(a), vec_norm(b))


def vec_norm(a: Column) -> Column:
    """L2 norm of an array<double> column — the same sequential fold
    :func:`cosine` uses internally, exposed so pairwise operators can
    precompute it once per VECTOR instead of re-folding once per PAIR.
    Higher-order array functions run interpreted (outside whole-stage
    codegen), so a blocked self-join scoring P pairs pays 3 folds/pair with
    inline :func:`cosine` but only 1 with stored norms — the "store norms
    with the vectors" layout every vector store uses at scale. Numerically
    identical: same fold order, same dot/(na*nb) expression."""
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_with_norms(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """:func:`cosine` when both norms are precomputed via :func:`vec_norm`."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    return dot / (na * nb)


def _as_double(df: DataFrame) -> DataFrame:
    return df.withColumn("embedding", F.col("embedding").cast("array<double>"))


def _with_norm(df: DataFrame) -> DataFrame:
    return df.withColumn("_norm", vec_norm(F.col("embedding")))


def _query_frame(emb: DataFrame, query_ids: list[int], carry: list[str]) -> DataFrame:
    """The broadcast-side query frame every ANN operator builds: the query
    vectors with their precomputed norms, plus ``carry`` columns renamed
    ``q_<col>`` (bucket / label / cluster — the operator's join key)."""
    sel = [
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("_norm").alias("q_norm"),
    ] + [F.col(c).alias(f"q_{c}") for c in carry]
    return emb.filter(F.col("vec_id").isin(query_ids)).select(*sel)


def _score_candidates(cand: DataFrame, carry: dict[str, Column]) -> DataFrame:
    """(query, candidate) pairs → scored rows. The round-to-6 +
    precomputed-norm cosine policy lives HERE, once, for every bucketed/
    blocked/brute-force operator (the vectorized BLAS path is the one
    documented exception)."""
    cols = ["query_id", F.col("vec_id").alias("neighbor_id")]
    cols += [expr.alias(name) for name, expr in carry.items()]
    cols.append(
        F.round(
            cosine_with_norms(
                F.col("q_emb"), F.col("embedding"), F.col("q_norm"), F.col("_norm")
            ),
            6,
        ).alias("cos_sim")
    )
    return cand.select(*cols)


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k under the engine-stable (cos_sim desc, id asc)
    order — the shared tail of every ANN operator."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
        F.col("rank") <= k
    )


def brute_force_topk(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (self excluded)."""
    emb = _with_norm(_as_double(embeddings))
    q = _query_frame(emb, query_ids, [])
    pairs = emb.crossJoin(F.broadcast(q)).filter(F.col("vec_id") != F.col("query_id"))
    return _rank_topk(_score_candidates(pairs, {}), k)


def brute_force_topk_vectorized(
    embeddings: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Exact top-k cosine — the Arrow/numpy scale path.

    Per-partition `mapInPandas` computes a normalized matrix product
    (BLAS dgemm) of the partition's vectors against the broadcast query
    matrix and emits only each partition's local top-k per query; a final
    window over ``numPartitions × k × |queries|`` candidate rows picks the
    global top-k. The corpus is never shuffled and Python sees Arrow
    batches, not rows — this is 10-100× the per-row fold of
    :func:`brute_force_topk` on wide corpora. Results agree with the
    fold-based operator except on measure-zero rank boundaries: this
    path ranks on unrounded cosine (below) while brute_force_topk ranks
    on round(cos, 6) + id, so two neighbors whose cosines round equal
    but differ in the raw float can order differently at the k boundary.

    The query matrix is collected to the driver first: it is k-bounded
    (≪ broadcast threshold) by contract, exactly like a broadcast dim.

    Returns (query_id, neighbor_id, rank) — rank on UNROUNDED float64
    cosine with vec_id tie-break. The score itself is not emitted: BLAS
    and a sequential SQL fold differ in last-ulp summation order, which
    is harmless for ranking distinct random vectors but would flip a
    rounded digit at a half-boundary often enough to break value-hash
    oracles."""
    import numpy as np

    qrows = (
        embeddings.filter(F.col("vec_id").isin(query_ids))
        .select("vec_id", "embedding")
        .collect()
    )
    if not qrows:  # no query vectors exist in the corpus → empty result
        spark = embeddings.sparkSession
        return spark.createDataFrame([], "query_id long, neighbor_id long, rank long")
    q_ids = np.array([r.vec_id for r in qrows], dtype=np.int64)
    Q = np.array([list(r.embedding) for r in qrows], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-300)

    def score_partition(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            M = np.array([np.asarray(e, dtype=np.float64) for e in pdf["embedding"]])
            Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
            sims = Mn @ Qn.T  # (n_rows, n_queries)
            out_q, out_n, out_s = [], [], []
            for qi in range(len(q_ids)):
                s = sims[:, qi]
                mask = ids != q_ids[qi]
                cand_idx = np.nonzero(mask)[0]
                if cand_idx.size == 0:
                    continue
                # local top-k by (sim desc, id asc): global top-k rows are
                # necessarily inside their partition's top-k under the
                # same ordering, so pruning here loses nothing
                order = np.lexsort((ids[cand_idx], -s[cand_idx]))[:k]
                keep = cand_idx[order]
                out_q.extend([int(q_ids[qi])] * keep.size)
                out_n.extend(ids[keep].tolist())
                out_s.extend(s[keep].tolist())
            if out_q:
                yield pd.DataFrame(
                    {"query_id": out_q, "neighbor_id": out_n, "cos_sim": out_s}
                )

    cand = embeddings.select("vec_id", "embedding").mapInPandas(
        score_partition, "query_id long, neighbor_id long, cos_sim double"
    )
    return (
        _rank_topk(cand, k)
        .select("query_id", "neighbor_id", "rank")
    )


EMB_DIM = 64
LSH_BITS = 6


def _plane_sign(j: int, d: int) -> float:
    """Deterministic, well-mixed ±1 — sha256 of the (plane, dim) pair.

    NOT a linear formula: sign patterns like parity((j*D+d)*odd + odd) are
    identical across planes (parity is invariant under odd multipliers), which
    collapses every plane to one bit. The signs are compile-time literals
    embedded identically in the Spark plan and the DuckDB oracle, so no
    arithmetic needs to be reproduced engine-side."""
    import hashlib

    digest = hashlib.sha256(f"hp:{j}:{d}".encode()).digest()
    return 1.0 if int.from_bytes(digest[:4], "big") % 2 == 0 else -1.0


# (Real systems sample Gaussians; ±1 "sign" planes are the standard cheap
# variant and are exactly representable in float64.)
HYPERPLANE_SIGNS: list[list[float]] = [
    [_plane_sign(j, d) for d in range(EMB_DIM)] for j in range(LSH_BITS)
]


def _band_signs(band: int) -> list[list[float]]:
    """Sign planes for band ``band``: globally-indexed planes
    [band·LSH_BITS, (band+1)·LSH_BITS) from the same sha256 family, so
    band 0 is exactly HYPERPLANE_SIGNS (the oracle-twinned planes) and
    every further band is an independent draw."""
    if band == 0:
        return HYPERPLANE_SIGNS
    base = band * LSH_BITS
    return [
        [_plane_sign(base + j, d) for d in range(EMB_DIM)] for j in range(LSH_BITS)
    ]


def hyperplane_bucket(emb: Column | str, band: int = 0) -> Column:
    """Random-hyperplane LSH bucket id of an array<double> embedding:
    bit j = (emb · plane_j >= 0). Vectors at angle θ disagree on a bit with
    probability θ/π, so near-identical vectors share all LSH_BITS bits —
    the blocking key that makes embedding near-dup sub-quadratic.

    ``band`` selects an independent set of LSH_BITS planes (band 0, the
    default, is the registered-contract bucket with a DuckDB twin).

    The dot product is a left fold seeded with 0.0 in both engines, so the
    float64 sum order — and therefore every bit — is bit-identical.

    ``emb`` as a STRING (a SQL expression for the array<double> column) is
    the fast build path (r16): the whole bucket expression renders as one
    SQL string and parses in ~2 ms, where the per-element ``F.lit`` form
    cost LSH_BITS×EMB_DIM = 1024 py4j round-trips (~0.65 s of serial
    driver time per call site). The signs are exactly ±1.0, rendered with
    the ``D`` suffix so they parse as the same float64 literals the lit
    path built; fold seed and order are textually identical, so every
    bit — and the DuckDB twin — is unchanged. A Column argument keeps the
    old (general-expression) path for callers that pass casts."""
    if isinstance(emb, str):
        parts = []
        for j, plane in enumerate(_band_signs(band)):
            # r16 ADVICE: the {s:.1f} render is exact ONLY for ±1.0; a
            # future sign-family change must fail loudly here rather
            # than silently mis-round the string path away from the
            # Column path and the DuckDB twin.
            assert all(s in (1.0, -1.0) for s in plane), plane
            arr = "array(" + ",".join(f"{s:.1f}D" for s in plane) + ")"
            dot = (
                f"aggregate(zip_with({emb}, {arr}, (x, s) -> x * s), "
                f"0.0D, (a, v) -> a + v)"
            )
            parts.append(
                f"(CASE WHEN {dot} >= 0 THEN cast({1 << j} as bigint) "
                f"ELSE cast(0 as bigint) END)"
            )
        return F.expr("cast(0 as bigint) + " + " + ".join(parts))
    acc = F.lit(0).cast("long")
    for j, plane in enumerate(_band_signs(band)):
        # one F.lit per PLANE (array<double> literal), never per element —
        # CLAUDE.md driver-literal rule
        signs = F.lit([float(s) for s in plane])
        dot = F.aggregate(
            F.zip_with(emb, signs, lambda x, s: x * s),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        acc = acc + F.when(dot >= 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
    return acc


def sql_hyperplane_bucket(emb_expr: str) -> str:
    """DuckDB twin of :func:`hyperplane_bucket` (emb_expr: a DOUBLE[] expr,
    1-indexed)."""
    parts = []
    for j in range(LSH_BITS):
        dot = "0.0"
        for d, s in enumerate(HYPERPLANE_SIGNS[j]):
            dot = f"({dot} + {emb_expr}[{d + 1}] * ({s:.1f}))"
        parts.append(f"(CASE WHEN {dot} >= 0 THEN {1 << j}::BIGINT ELSE 0::BIGINT END)")
    return "(" + " + ".join(parts) + ")"


def lsh_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5) -> DataFrame:
    """LSH-bucketed ANN: candidates share the query's hyperplane bucket.
    Unlike blocked_topk's given partition (label), the bucket is computed
    from the vector itself — the self-indexing scale path when no cluster
    assignment exists. Queries landing in singleton buckets return fewer
    than k rows (the standard LSH recall trade; widen with multi-probe)."""
    emb = _with_norm(
        _as_double(embeddings).withColumn("bucket", hyperplane_bucket("embedding"))
    )
    q = _query_frame(emb, query_ids, ["bucket"])
    cand = emb.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("q_bucket")) & (F.col("vec_id") != F.col("query_id")),
    )
    return _rank_topk(_score_candidates(cand, {"bucket": F.col("bucket")}), k)


def lsh_topk_multiprobe(
    embeddings: DataFrame, query_ids: list[int], k: int = 5, hamming: int = 1
) -> DataFrame:
    """Multi-probe LSH ANN: candidates live in the query's hyperplane bucket
    OR any bucket within Hamming distance ``hamming`` of it (flipped bits).

    Closes :func:`lsh_topk`'s recall gap — a query in a singleton bucket
    still reaches its adjacent buckets, and a near neighbor that disagrees
    on few planes (the most likely miss, P ∝ θ/π per bit) is recovered.
    Scale shape is unchanged: the probe set is built by exploding the
    *broadcast query side* into sum(C(LSH_BITS, i), i≤hamming) probe
    bucket values, so the corpus is still probed via a pure equi-join on
    its single precomputed bucket — no corpus replication, no distance
    math outside the candidate set. Candidate volume is bounded by
    n_probes × the per-bucket candidate count; each (query, candidate)
    pair arises from exactly one probe value (all XOR masks are distinct),
    so no dedup pass is needed.

    ``hamming`` is the recall/cost dial, measured at 1M×64-d (SCALING.md
    §Round-6): on clustered data hamming=1 reaches recall 0.95; on
    UNIFORM data — the adversarial shape with no cluster structure, where
    per-bit agreement for true neighbors is weak — hamming=1 gets 0.40 vs
    single-bucket 0.10, and hamming=2 (22 of 64 buckets probed, ~3× the
    candidate volume) reaches 0.74 (and 1.00 on clustered). Default 1 is
    the registered query's contract."""
    from itertools import combinations

    emb = _with_norm(
        _as_double(embeddings).withColumn("bucket", hyperplane_bucket("embedding"))
    )
    masks = [
        sum(1 << j for j in bits)
        for h in range(hamming + 1)
        for bits in combinations(range(LSH_BITS), h)
    ]
    probes = F.array(
        *[F.col("q_bucket").bitwiseXOR(F.lit(m).cast("long")) for m in masks]
    )
    q = _query_frame(emb, query_ids, ["bucket"]).withColumn("probe", F.explode(probes))
    cand = emb.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("probe")) & (F.col("vec_id") != F.col("query_id")),
    )
    return _rank_topk(_score_candidates(cand, {"bucket": F.col("bucket")}), k)


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.999, n_bands: int = 1
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: exact cosine verification over
    candidates blocked by hyperplane bucket — the vector twin of MinHash-LSH
    text dedup (operators/dedup.py). Within-bucket quadratic only; at 100 TB
    the bucket count scales with LSH_BITS to keep blocks executor-sized.

    ``n_bands`` is the recall/cost dial (the dedup-side sibling of
    multiprobe's ``hamming`` and IVF's ``n_probe``): a pair is a candidate
    when it shares the bucket of ANY of ``n_bands`` independent 6-bit
    plane sets, lifting blocking recall from p to 1-(1-p)^B for ~B× the
    candidate volume. Planted-pair measurement at 108k vectors
    (scripts/probe_dedup_recall.py, SCALING.md round-7): cosine-0.999
    recall 0.92 / 0.994+ at n_bands 1 / 2. Default 1 is the registered
    query's contract (bit-identical plan and output, band-0 bucket
    emitted). Each qualifying pair is emitted ONCE — at its first
    matching band (reference-band filter, the same no-dedup-shuffle trick
    as the interval overlap join) — so no distinct pass is needed.

    Shuffle-shape note (deliberate): the multi-band self-join carries the
    full embedding and ``_norm`` through BOTH sides of the exchange, so
    pre-join shuffle volume grows ~n_bands × corpus width — LINEAR in
    corpus size, and the price of keeping the cosine filter INLINE in the
    join stage so the within-bucket-QUADRATIC candidate pair set is
    filtered where it is generated and never materialized. The "slim"
    alternative (exchange only (vec_id, band, bucket, bk*), re-attach
    embeddings by vec_id after the band filter) was implemented and
    REVERTED in r8: re-attaching forces the ~quadratic candidate set
    through two more shuffle joins — at the 108k-vector recall probe that
    is ~10⁸ pairs × 64-double rows, which spilled past the machine's
    ~80 GB of scratch disk and died ENOSPC (SCALING.md round-8), where
    this shape runs in seconds. Wide-but-linear beats slim-but-quadratic.

    Threshold note: on a real corpus use ~0.99+; the synthetic fixture's
    embeddings are isotropic random unit vectors (no true near-dups exist at
    any sf), so the registered query sets the threshold at the similarity
    distribution's tail to keep the verify path exercised end-to-end."""
    emb = _as_double(embeddings)
    if n_bands == 1:
        emb = _with_norm(emb.withColumn("bucket", hyperplane_bucket("embedding")))
        a, b = emb.alias("a"), emb.alias("b")
        joined = a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        return (
            joined.select(
                F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
                F.col("a.bucket").alias("bucket"),
                F.round(
                    cosine_with_norms(
                        F.col("a.embedding"),
                        F.col("b.embedding"),
                        F.col("a._norm"),
                        F.col("b._norm"),
                    ),
                    6,
                ).alias("cos_sim"),
            )
            .filter(F.col("cos_sim") >= threshold)
        )
    emb = _with_norm(
        emb.select(
            "*",
            *[
                hyperplane_bucket("embedding", band=i).alias(f"bk{i}")
                for i in range(n_bands)
            ],
        )
    )
    # Carry embedding + _norm through the explode × n_bands self-join (see
    # the docstring's shuffle-shape note: this keeps the cosine filter in
    # the join stage, so the within-bucket-quadratic candidate set is
    # consumed where it is generated, never exchanged).
    ex = emb.withColumn(
        "band", F.explode(F.array(*[F.lit(i) for i in range(n_bands)]))
    ).withColumn(
        "bucket",
        F.element_at(
            F.array(*[F.col(f"bk{i}") for i in range(n_bands)]), F.col("band") + 1
        ),
    )
    a, b = ex.alias("a"), ex.alias("b")
    # reference band: emit only where no earlier band already matched
    no_earlier = F.lit(True)
    ref = F.when(F.col("a.band") == 0, F.lit(True))
    for j in range(1, n_bands):
        no_earlier = no_earlier & (
            F.col(f"a.bk{j - 1}") != F.col(f"b.bk{j - 1}")
        )
        ref = ref.when(F.col("a.band") == j, no_earlier)
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(ref.otherwise(F.lit(False)))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.bucket").alias("bucket"),
            F.round(
                cosine_with_norms(
                    F.col("a.embedding"),
                    F.col("b.embedding"),
                    F.col("a._norm"),
                    F.col("b._norm"),
                ),
                6,
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def blocked_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5) -> DataFrame:
    """IVF-style ANN: candidates share the query's block (label ≙ coarse
    cluster id). The corpus-side join key makes this an ordinary shuffle
    join — per-block quadratic, never corpus-quadratic."""
    emb = _with_norm(_as_double(embeddings))
    q = _query_frame(emb, query_ids, ["label"])
    cand = emb.join(
        F.broadcast(q),
        (F.col("label") == F.col("q_label")) & (F.col("vec_id") != F.col("query_id")),
    )
    return _rank_topk(
        _score_candidates(cand, {"block": F.col("label").cast("long")}), k
    )


def knn_self_join(embeddings: DataFrame, k: int = 3) -> DataFrame:
    """All-pairs kNN join: every vector's top-k neighbors within its
    hyperplane bucket — the full-corpus variant of :func:`lsh_topk` (no
    query subset, so no broadcast side). The bucket-blocked self-join
    keeps the candidate count at sum(|bucket|²) instead of n², and the
    per-vector top-k window partitions by query vector over bucket-local
    candidates only. At 100 TB, LSH_BITS scales the bucket count to keep
    each block executor-sized; vectors in singleton buckets yield no rows
    (the standard LSH recall trade — widen with multi-probe)."""
    emb = _with_norm(
        _as_double(embeddings).withColumn("bucket", hyperplane_bucket("embedding"))
    )
    a, b = emb.alias("a"), emb.alias("b")
    scored = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") != F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("query_id"),
        F.col("b.vec_id").alias("neighbor_id"),
        F.col("a.bucket").alias("bucket"),
        F.round(
            cosine_with_norms(
                F.col("a.embedding"),
                F.col("b.embedding"),
                F.col("a._norm"),
                F.col("b._norm"),
            ),
            6,
        ).alias("cos_sim"),
    )
    return _rank_topk(scored, k)


# ---------------------------------------------------------------------------
# Trained IVF: deterministic integer-micros k-means (Lloyd) + cluster probe
# ---------------------------------------------------------------------------


def _micros_vec(emb: Column) -> Column:
    """array<double> -> array<long> of integer micros (floor(v*1e6+0.5)).

    All k-means arithmetic runs on these integers: summation order can't
    change an integer result, so the trained centroids — and therefore the
    cluster assignments — are bit-identical across engines and across
    partitionings/retries. The float->int quantization is the same
    portable-money trick as functions/numeric.money_micros, applied
    per-dimension."""
    return F.transform(emb, lambda v: F.floor(v * 1_000_000 + F.lit(0.5)).cast("long"))


def _dist_sql(c_vals: list[int], xi_sql: str) -> str:
    """SQL text of the exact integer squared-L2 distance of ``xi_sql``
    (an array<long> column/expression) to one centroid — the shared
    kernel of the single-assignment and multi-probe expressions below.

    Rendered as ONE SQL string instead of per-element ``F.lit`` columns
    (r16): the old form cost 64 py4j round-trips per centroid plus the
    higher-order-function lambda plumbing — ~0.75 s of SERIAL driver
    time per assignment expression at 8×64 (profiled: 9165 py4j
    send_commands for 3 builds), paid 3× per ivf_kmeans_topk call
    (each Lloyd round + the final assignment); the rendered string
    parses in ~2 ms into the IDENTICAL expression tree (same fold, same
    int literal types — SQL int literals widen to BIGINT past 2^31
    exactly like py4j Integer/Long), so execution and results are
    bit-for-bit unchanged (pinned by test_ivf_kmeans_nprobe_dial's
    brute-force equality and the registered oracle)."""
    arr = "array(" + ",".join(str(int(v)) for v in c_vals) + ")"
    return (
        f"aggregate(zip_with({xi_sql}, {arr}, (a, b) -> (a - b) * (a - b)), "
        f"cast(0 as bigint), (acc, v) -> acc + v)"
    )


def _nearest_cluster(cent: dict[int, list[int]], xi_sql: str = "xi") -> Column:
    """Expression assigning the row's ``xi_sql`` (array<long>) to the
    nearest centroid by exact integer squared-L2; ties break to the lowest
    cluster id (array_position returns the FIRST minimum; the centroid
    array is built in ascending-id order)."""
    ids = sorted(cent)
    dists = "array(" + ",".join(_dist_sql(cent[i], xi_sql) for i in ids) + ")"
    ids_arr = "array(" + ",".join(str(int(i)) for i in ids) + ")"
    return F.expr(
        f"element_at({ids_arr}, "
        f"cast(array_position({dists}, array_min({dists})) as int))"
    )


def _nearest_clusters(cent: dict[int, list[int]], p: int, xi_sql: str) -> Column:
    """The ``p`` nearest cluster ids of ``xi_sql``, nearest first — ties
    break to the lowest cluster id (struct array_sort orders by (dist,
    id)), so element 1 always equals :func:`_nearest_cluster`'s
    assignment. Same one-parse SQL rendering as :func:`_dist_sql`."""
    ids = sorted(cent)
    structs = ",".join(
        f"named_struct('d', {_dist_sql(cent[i], xi_sql)}, 'c', cast({int(i)} as int))"
        for i in ids
    )
    return F.expr(
        f"slice(transform(array_sort(array({structs})), s -> s.c), "
        f"1, {min(p, len(ids))})"
    )


def ivf_kmeans_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    n_clusters: int = 8,
    n_iter: int = 2,
    k: int = 5,
    n_probe: int = 1,
    train_sample_mod: int | None = None,
    eager_checkpoint: bool = False,
) -> DataFrame:
    """ANN with a TRAINED coarse quantizer: k-means (fixed ``n_iter`` Lloyd
    rounds, centroids seeded from vec_ids ``< n_clusters`` — the corpus
    must contain ids 0..n_clusters-1, checked loudly), then
    probe = per-cluster top-k — the trained sibling of :func:`blocked_topk`
    (which inherits its partition from a label column).

    Deterministic by construction, so a DuckDB oracle can replay training
    exactly (see queries/llm.py:ann_ivf_kmeans): vectors quantize to
    integer micros, distances are exact integer squared-L2, and each new
    centroid component is floor(sum/count) — floor of an exact-double
    ratio of ints, identical in any engine. Clusters that lose all members
    keep their previous centroid.

    Scale shape: per Lloyd round, assignment is a broadcast map stage
    (centroids are k×d literals — k is small by definition of a COARSE
    quantizer) and the update is one groupBy over (cluster, dim) = k·d
    cells; rounds are driver-sequenced like connected_dedup_groups. The
    probe is an equi-join on cluster id — sum(|cluster|²) work, never
    corpus-quadratic. At 100 TB: train on a sample, broadcast the
    centroids, assignment stays a map stage over the full corpus.

    ``n_probe`` is the recall/cost dial (the IVF twin of multiprobe
    LSH's hamming dial, r6 verdict item 4): each query probes its
    ``n_probe`` NEAREST trained cells instead of only its own. The probe
    set explodes on the tiny broadcast *query* side (recomputing the
    query's integer distances to the k centroid literals — k·d work per
    query, not per corpus row); the corpus keeps its single cluster
    assignment, so the join stays one equi-join with candidate volume
    n_probe × cell size and no corpus replication. Each (query,
    candidate) pair arises from exactly one probe value (the p nearest
    cells are distinct), so no dedup pass is needed. ``n_probe=1``
    preserves the registered query's exact contract (same plan shape,
    same oracle); recall/cost curve at 1M × 64-d in SCALING.md.

    ``train_sample_mod`` is the 100 TB training dial (r7 verdict item 4):
    when set (> 1), Lloyd rounds train on the deterministic hash-sample
    ``xxhash64(vec_id) % mod == 0`` (seed rows ``vec_id < n_clusters``
    always included, so the seeding contract is unchanged) and only the
    FINAL assignment touches the full corpus — one pass, nothing
    corpus-sized materialized. The default (None) keeps the registered
    query's exact contract: full-corpus training with the corpus
    projection localCheckpointed and re-read n_iter+2 times (the
    legitimate iterative-training trade at fixture scale). Centroids from
    a 1/mod sample are NOT bit-identical to full-corpus centroids —
    sampling changes the cluster means — so the dial has no oracle; its
    recall parity is measured on planted neighbors instead
    (scripts/probe_ann_scale.py, SCALING.md round-8)."""
    import math

    emb = _as_double(embeddings)
    base = emb.select(
        "vec_id", "embedding", _micros_vec(F.col("embedding")).alias("xi")
    )
    if train_sample_mod is not None and train_sample_mod > 1:
        # The sample is small by construction: checkpoint IT for the loop
        # and leave the full corpus lazy (scanned once at final assignment).
        train = base.filter(
            (F.pmod(F.xxhash64("vec_id"), F.lit(train_sample_mod)) == 0)
            | (F.col("vec_id") < n_clusters)
        ).localCheckpoint(eager=eager_checkpoint)
    else:
        # localCheckpoint: the training loop re-reads base n_iter+2 times
        # (seed collect, each round's assign + stats, final assignment);
        # without pinning, each pass re-runs the parquet scan + double cast
        # + the interpreted _micros_vec transform from scratch.
        # LAZY (eager=False, r16): the seed collect below is the first
        # action over the checkpointed frame, so letting IT materialize
        # the blocks folds (checkpoint job + seed job) into ONE pass over
        # the corpus projection — the same lazy-checkpoint+first-action
        # fold the CC loop uses (operators/dedup.py:_cc_loop). The seed
        # filter sits ABOVE the checkpoint boundary, so every partition
        # is still computed and cached by that job. One full corpus scan
        # + _micros_vec transform saved at any scale; measured A/B in
        # scripts/probe_ivf_ckpt_ab.py (r16). ``eager_checkpoint=True``
        # is the probe dial for the pre-r16 behavior.
        base = base.localCheckpoint(eager=eager_checkpoint)
        train = base

    seeds = (
        train.filter(F.col("vec_id") < n_clusters)
        .orderBy("vec_id")
        .select("vec_id", "xi")
        .collect()
    )
    cent: dict[int, list[int]] = {int(r.vec_id): list(r.xi) for r in seeds}
    if len(cent) != n_clusters:
        # The seed rule is part of the determinism contract (the DuckDB
        # oracle replays `vec_id < n_clusters` literally), so it requires
        # ids 0..n_clusters-1 to exist. Fail with the contract named
        # instead of a bare StopIteration on an empty dict.
        raise ValueError(
            f"ivf_kmeans_topk seeds from vec_ids < {n_clusters} but only "
            f"{len(cent)} such ids exist; the corpus must contain "
            f"contiguous ids 0..{n_clusters - 1} (or lower n_clusters)"
        )
    dim = len(next(iter(cent.values())))

    for _ in range(n_iter):
        assigned = train.withColumn("cluster", _nearest_cluster(cent))
        # posexplode×dim → groupBy(cluster, pos) beats the tempting
        # "wide" alternative (one sum column per dimension): measured
        # 0.3 s vs 0.9 s per round at sf0.1 — 64 aggregate buffers cost
        # more than the row explosion at any corpus size, since partial
        # aggregation collapses the exploded rows to k·d cells map-side.
        stats = (
            assigned.select("cluster", F.posexplode("xi").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()  # k*d cells — bounded by the quantizer, not the data
        )
        new: dict[int, list[int]] = {}
        for r in stats:
            new.setdefault(int(r.cluster), [0] * dim)[int(r.pos)] = int(
                math.floor(r.s / r.n)
            )
        cent = {cid: new.get(cid, vec) for cid, vec in cent.items()}

    final = _with_norm(base.withColumn("cluster", _nearest_cluster(cent)))
    q = _query_frame(final, query_ids, ["cluster"])
    if n_probe <= 1:
        cand = final.join(
            F.broadcast(q),
            (F.col("cluster") == F.col("q_cluster"))
            & (F.col("vec_id") != F.col("query_id")),
        )
    else:
        probes = _nearest_clusters(cent, n_probe, "_q_xi")
        qp = (
            q.withColumn("_q_xi", _micros_vec(F.col("q_emb")))
            .withColumn("probe", F.explode(probes))
            .drop("_q_xi")
        )
        cand = final.join(
            F.broadcast(qp),
            (F.col("cluster") == F.col("probe"))
            & (F.col("vec_id") != F.col("query_id")),
        )
    return _rank_topk(
        _score_candidates(cand, {"cluster": F.col("cluster").cast("long")}), k
    )
