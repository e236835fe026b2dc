"""Deduplication operators — exact, content-hash, blocked n-gram Jaccard,
MinHash+LSH, SimHash (BASELINE.json north star; the reference has no
dedup of any kind — SURVEY.md §2.B).

Scale design notes (the 100 TB story):
* Exact dedup is a hash groupBy — one shuffle on the dedup key.
* Content-hash dedup shuffles 16-byte digests, never documents.
* Near-dup NEVER does all-pairs: candidates come from an inverted-index
  style equi-join on a blocking key (here lang × length-bucket) or on LSH
  band buckets, so the join is an ordinary shuffle join on small keys and
  the quadratic blowup is confined to within-bucket groups.
* All hashing is engine-portable integer arithmetic
  (functions/text_hash.py) evaluated JVM-side — no Python in the loop.
"""

from __future__ import annotations

import gc
import itertools
import logging
import uuid

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_LOG = logging.getLogger(__name__)

from kafka_stream_sorter_spark.functions.text_hash import (
    LSH_BANDS,
    LSH_ROWS,
    token_hashes,
)
from kafka_stream_sorter_spark.operators.text import tokens


def dedup_exact(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Keep exactly one row per key group — the *lowest* ``order_col`` row,
    a deterministic version of ``dropDuplicates`` (which keeps an arbitrary
    row). One shuffle on the group keys; no collect."""
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def content_hash_groups(docs: DataFrame) -> DataFrame:
    """MD5 content-hash dedup ledger: one row per distinct text, with the
    canonical (minimum) doc_id and the duplicate count."""
    return (
        docs.select(F.md5(F.col("text").cast("binary")).alias("content_md5"), "doc_id")
        .groupBy("content_md5")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def _word_sets(docs: DataFrame, hashed: bool = True) -> DataFrame:
    """Per-doc sorted distinct word set, by default as polynomial token
    hashes (array<long>): long-set intersection is ~3x cheaper than
    string-set intersection (no per-pair string hashing/equality), the
    standard shingle-hash trick. Collisions (< 1e-5 per pair at these set
    sizes) are mirrored bit-for-bit by the oracle, which hashes the same
    way."""
    words = F.array_distinct(tokens(F.col("text")))
    if hashed:
        words = token_hashes(words)
    return docs.select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / 100).cast("long").alias("len_bucket"),
        F.array_sort(words).alias("words"),
    )


def char_ngram_hashes(s: Column, n: int = 3) -> Column:
    """Sorted distinct polynomial hashes of a string's character n-grams
    (the shingle set for n-gram Jaccard). JVM-side sequence+transform —
    no UDF. Strings shorter than n yield an empty set (sequence() would
    otherwise produce a *descending* [1,0] range and bogus shingles)."""
    from kafka_stream_sorter_spark.functions.text_hash import char_poly_hash

    grams = F.transform(
        F.sequence(F.lit(1), F.length(s) - (n - 1)),
        lambda i: F.substring(s, i, F.lit(n)),
    )
    safe = F.when(F.length(s) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )
    return F.array_sort(F.array_distinct(F.transform(safe, char_poly_hash)))


def _prefix_filtered_jaccard(sets: DataFrame, threshold: float) -> DataFrame:
    """Exact blocked Jaccard pairs via **prefix filtering** (the standard
    set-similarity-join pruning — Bayardo et al. style).

    ``sets`` must have columns (doc_id, lang, len_bucket, items:array<long>).
    Order every doc's items by global document frequency (rarest first,
    item id as tie-break); two sets with J ≥ t MUST share an item within
    their first ``|s| − ⌈t·|s|⌉ + 1`` items under any fixed global order.
    Candidate pairs therefore come from an equi-join on *prefix* items only
    — rare ones, so heavy hitters ("the", common shingles) never explode
    the join — and the exact array-intersect verification runs on
    candidates, not on the blocked cross product. Results are identical to
    the naive blocked all-pairs form (which is what the DuckDB oracles
    compute); pruning affects cost only.

    The shingle sets are persisted for the duration (read 3×: df counts,
    prefix build, verification) and unpersisted before returning — the
    result is eagerly localCheckpoint-ed (pairs are a sliver of the
    corpus), so cached blocks don't accumulate across the three Jaccard
    queries in a long-lived session. The prefix table is persisted too
    (r17): it feeds BOTH sides of the candidate self-join, and without a
    materialization each side re-runs the whole explode → df join →
    per-doc window subtree — including a second full document-frequency
    aggregation and a second window sort of the exploded corpus (the
    executed plan really did embed the subtree twice;
    plans/r17/dedup_jaccard_body_before.txt). One linear-cost cached
    pass replacing a second corpus-wide shuffle+sort is the same trade
    the g persist already makes."""
    g = sets.persist()
    pinned: list[DataFrame] = []
    try:
        return _prefix_filtered_jaccard_body(
            g, threshold, pinned
        ).localCheckpoint()
    finally:
        g.unpersist()
        for df in pinned:
            df.unpersist()


def _prefix_filtered_jaccard_body(
    g: DataFrame, threshold: float, pinned: list | None = None
) -> DataFrame:
    ex = g.select(
        "doc_id",
        "lang",
        "len_bucket",
        F.size("items").alias("n_items"),
        F.explode("items").alias("item"),
    )
    df_counts = ex.groupBy("item").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("item").asc())
    # ε inside every ceil/bound below: t·n etc. are exact rationals but are
    # computed in float64, which can land one ulp ABOVE the exact value
    # (e.g. 19·0.9/1.9 = 9.000000000000002 → ceil 10, exact 9), turning a
    # lossless prune into a false negative for pairs exactly at the
    # threshold. Slackening by 1e-9 prunes marginally less — always safe,
    # since exact array-intersect verification follows. (ADVICE r3.)
    _EPS = 1e-9
    prefix_len = (
        F.col("n_items") - F.ceil(F.col("n_items") * threshold - _EPS) + 1
    ).cast("int")
    prefix = (
        ex.join(df_counts, "item")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= prefix_len)
        .select("doc_id", "lang", "len_bucket", "n_items", "item", "_rn")
    )
    if pinned is not None:
        # both sides of the self-join below read this one materialization
        # instead of each re-running explode → df join → window (r17)
        prefix = prefix.persist()
        pinned.append(prefix)

    # PPJoin-style positional filter (Xiao et al., WWW'08) on top of the
    # prefix match: J(A,B) ≥ t needs overlap α = ⌈t/(1+t)·(|A|+|B|)⌉, and
    # common items at/after prefix positions (ra, rb) number at most
    # 1 + min(|A|−ra, |B|−rb). For a qualifying pair the bound holds at its
    # FIRST common prefix item, so filtering each matched item pair and
    # taking distinct keeps every true pair — necessary condition only,
    # exactness preserved. Cuts candidates ~2× when the shingle space is
    # small relative to the corpus (measured at sf0.1: 311k → 142k).
    alpha = F.ceil(
        (F.col("pa.n_items") + F.col("pb.n_items")) * threshold / (1.0 + threshold)
        - _EPS
    )
    positional = (
        F.least(
            F.col("pa.n_items") - F.col("pa._rn"),
            F.col("pb.n_items") - F.col("pb._rn"),
        )
        + 1
        >= alpha
    )

    pa, pb = prefix.alias("pa"), prefix.alias("pb")
    cand = (
        pa.join(
            pb,
            (F.col("pa.item") == F.col("pb.item"))
            & (F.col("pa.lang") == F.col("pb.lang"))
            & (F.col("pa.len_bucket") == F.col("pb.len_bucket"))
            & (F.col("pa.doc_id") < F.col("pb.doc_id"))
            # size bound: J(A,B) ≥ t ⟹ min|·| ≥ t·max|·|
            & (
                F.least(F.col("pa.n_items"), F.col("pb.n_items"))
                >= F.greatest(F.col("pa.n_items"), F.col("pb.n_items")) * threshold
                - _EPS
            )
            & positional,
        )
        .select(F.col("pa.doc_id").alias("doc_a"), F.col("pb.doc_id").alias("doc_b"))
        .distinct()
    )

    ga = g.select(F.col("doc_id").alias("doc_a"), F.col("items").alias("items_a"))
    gb = g.select(F.col("doc_id").alias("doc_b"), F.col("items").alias("items_b"))
    # the intersection projects ONCE (r17): deriving n_union and jaccard
    # from the same `inter` Column inlined the array_intersect into every
    # consumer AND the pushed-down threshold filter — 6 set
    # intersections per candidate pair in the executed plan where 1
    # suffices (within-bucket candidates are the quadratic term, so
    # per-candidate work is the thing to minimize). Residual: Catalyst
    # still pushes the threshold into the JOIN CONDITION (2 intersects
    # per candidate there — it prefers filtering before materializing
    # survivors); survivors now pay 3 total instead of 6. Integer/size
    # arithmetic is unchanged, so jaccard stays the same int/int→double
    # division the oracle mirrors.
    inter = F.size(F.array_intersect(F.col("items_a"), F.col("items_b")))
    stot = F.size("items_a") + F.size("items_b")
    return (
        cand.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            inter.alias("_i"),
            stot.alias("_s"),
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("_i").cast("long").alias("n_common"),
            (F.col("_s") - F.col("_i")).cast("long").alias("n_union"),
            (F.col("_i") / (F.col("_s") - F.col("_i"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.9
) -> DataFrame:
    """Character-n-gram Jaccard near-dup pairs — the word-order-insensitive,
    typo-tolerant sibling of :func:`jaccard_pairs`. Char shingle sets are
    ~10× larger than word sets, so prefix filtering
    (:func:`_prefix_filtered_jaccard`) is what keeps this sub-quadratic."""
    sets = docs.select(
        "doc_id",
        "lang",
        F.floor(F.col("n_chars") / 100).cast("long").alias("len_bucket"),
        char_ngram_hashes(F.col("text"), n).alias("items"),
    )
    return _prefix_filtered_jaccard(sets, threshold)


def jaccard_pairs(docs: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Blocked exact word-set Jaccard near-dup pairs, prefix-filtered
    (:func:`_prefix_filtered_jaccard`): candidates share a rare prefix
    token within a (lang, length-bucket) block; exact |A∩B| / (|A|+|B|−|A∩B|)
    over distinct hashed word sets verifies. The int/int division is
    bit-deterministic cross-engine."""
    sets = _word_sets(docs).withColumnRenamed("words", "items")
    return _prefix_filtered_jaccard(sets, threshold)


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """16-permutation MinHash signature per document (portable integer
    hashing). At scale this is a pure map stage.

    r16 optimization, two effects:
    * BUILD: the 16 permutation expressions parse from SQL text
      (functions/text_hash.spark_sql_minhash_exprs) instead of being
      built column-by-column — ~150 py4j round-trips per build instead
      of 1296 (the 18 higher-order lambdas dominated serial driver time).
    * EXECUTION: the premixed token-hash array is projected ONCE as
      ``_g``. The old form embedded the full tokenize → per-char
      polynomial hash → cube-premix subtree inside EVERY mh column, and
      CollapseProject happily inlined it — the executed plan hashed each
      document's text 16 times per row (visible in
      plans/r16/dedup_minhash_sig_before.txt). With ``_g`` in its own
      projection Spark keeps the boundary (expensive + multi-use), so
      tokenization+hashing+premix run once per row and the 16
      permutations are cheap integer maps over the cached array.
    Values are bit-identical (replica test + registered oracles); the
    premix-shared-by-all-permutations contract already matched the
    DuckDB twin (sql_minhash takes the premixed g_expr)."""
    from kafka_stream_sorter_spark.functions.text_hash import (
        _cube_mix,
        spark_sql_minhash_exprs,
    )

    th = token_hashes(F.array_distinct(tokens(F.col("text"))))
    base = docs.select("doc_id", F.transform(th, _cube_mix).alias("_g"))
    return base.select(
        "doc_id",
        *[
            F.expr(s).alias(f"mh{i}")
            for i, s in enumerate(spark_sql_minhash_exprs("_g"))
        ],
    )


def minhash_band_buckets(docs: DataFrame) -> DataFrame:
    """LSH banding: LSH_BANDS bands × LSH_ROWS rows — band key folds the
    band's minhashes into one bucket id. Output: (doc_id, band, bucket).

    The band-struct array parses from SQL text (one ``F.expr``) instead
    of per-band Column folds — same ``(acc*31 + mh) % P`` chain
    (functions/text_hash.spark_sql_band_bucket), ~700 fewer py4j
    round-trips per build (r16; values pinned bit-identical by the
    registered oracles and tests/test_minhash_random.py)."""
    from kafka_stream_sorter_spark.functions.text_hash import (
        spark_sql_band_bucket,
    )

    sigs = minhash_signatures(docs)
    structs = ",".join(
        "named_struct('band', cast({i} as bigint), 'bucket', {fold})".format(
            i=i,
            fold=spark_sql_band_bucket(
                [f"mh{LSH_ROWS * i + r}" for r in range(LSH_ROWS)]
            ),
        )
        for i in range(LSH_BANDS)
    )
    bands = F.expr(f"array({structs})")
    return sigs.select("doc_id", F.explode(bands).alias("bb")).select(
        "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.9) -> DataFrame:
    """MinHash-LSH near-dup pipeline, star-verified: each LSH bucket elects
    its minimum doc_id as representative; candidates are (representative,
    member) edges — at most LSH_BANDS per doc — and exact Jaccard verifies.

    Why star, not all-pairs: a dup cluster of m docs has m²/2 within-bucket
    pairs — quadratic blowup that melts down on a corpus whose point is to
    *contain* big dup clusters. Star verification is O(n·bands) edges total
    while still touching every cluster member, which is the shape that holds
    at 100 TB. The candidate join shuffles only (band, bucket, doc_id)
    triples; the verify join ships word sets for surviving edges only."""
    buckets = minhash_band_buckets(docs)
    rep = Window.partitionBy("band", "bucket")
    cand = (
        buckets.withColumn("rep", F.min("doc_id").over(rep))
        .filter(F.col("rep") < F.col("doc_id"))
        .select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        .distinct()
    )
    ws = _word_sets(docs).select("doc_id", "words")
    # same single-intersection projection as _prefix_filtered_jaccard's
    # verify stage (r17): the one-select form re-ran array_intersect 4x
    # per candidate (numerator, denominator, and both again in the
    # pushed-down threshold filter)
    inter = F.size(F.array_intersect(F.col("wa.words"), F.col("wb.words")))
    stot = F.size(F.col("wa.words")) + F.size(F.col("wb.words"))
    return (
        cand.join(ws.alias("wa"), F.col("doc_a") == F.col("wa.doc_id"))
        .join(ws.alias("wb"), F.col("doc_b") == F.col("wb.doc_id"))
        .select("doc_a", "doc_b", inter.alias("_i"), stot.alias("_s"))
        .select(
            "doc_a",
            "doc_b",
            (F.col("_i") / (F.col("_s") - F.col("_i"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_groups(docs: DataFrame) -> DataFrame:
    """LSH dedup-group assignment: doc → canonical doc_id, where canonical =
    min over the doc's buckets of each bucket's min doc_id (one star-
    contraction step of the duplicate graph — deterministic, linear, and the
    operator a 100 TB dedup pass actually materializes; iterate to a fixpoint
    for full connected components)."""
    buckets = minhash_band_buckets(docs)
    w = Window.partitionBy("band", "bucket")
    return (
        buckets.withColumn("bmin", F.min("doc_id").over(w))
        .groupBy("doc_id")
        .agg(F.min("bmin").alias("canonical_doc_id"))
    )


def simhash(docs: DataFrame, bits: int = 16) -> DataFrame:
    """SimHash signature: for each bit b, sum +1/-1 over token hashes'
    b-th bit, then take the sign.

    MAP-ONLY since r17: each bit's signed count is one ``aggregate()``
    higher-order fold over the per-doc token-hash array, so the whole
    signature is a per-row projection — ZERO shuffles. The r16 form
    exploded tokens × bit positions and two-level-aggregated the ±1
    sums, shuffling ``bits`` rows per (doc, token) through a
    (doc_id, bit) exchange and the per-doc sums through a second one;
    at 100 TB that is 16× the corpus' token count crossing the network
    for per-row-computable integer arithmetic. Results are
    bit-identical: the per-bit sum is order-invariant integer
    arithmetic over the same multiset of token hashes, and the
    ``size > 0`` filter reproduces the explode semantics (docs with an
    empty/null token set produced no rows, hence no output row).

    The bit expressions render as ONE SQL string (the r16 driver-literal
    rule: expression construction is serial driver time), and the token
    array projects once as ``_th`` in its own select so the ``bits``
    folds share one tokenize+hash pass per row — the projection-boundary
    lesson from the r16 minhash fix (CollapseProject keeps a non-cheap
    multi-referenced column in its own projection)."""
    sh = " + ".join(
        "(CASE WHEN aggregate(_th, 0L, (acc, h) -> acc + "
        f"(CASE WHEN (h & {1 << b}L) != 0L THEN 1 ELSE -1 END)) >= 0 "
        f"THEN {1 << b}L ELSE 0L END)"
        for b in range(bits)
    )
    return (
        # the exploded form dropped exactly the docs whose token array
        # was null or empty; split() yields ≥1 element for ANY non-null
        # text (all-whitespace included), so that set is precisely the
        # null-text docs — filtered here as a plain IsNotNull the scan
        # can push down (a size(_th) > 0 filter would instead be pushed
        # below the projection and re-derive the whole tokenize+hash
        # chain a second time per row)
        docs.filter(F.col("text").isNotNull())
        .select(
            "doc_id",
            token_hashes(F.array_distinct(tokens(F.col("text")))).alias("_th"),
        )
        .select("doc_id", F.expr(sh).cast("long").alias("simhash"))
    )


def connected_dedup_groups(
    nodes: DataFrame, edges: DataFrame, max_iter: int = 20, stats: dict | None = None
) -> DataFrame:
    """Full connected components over the duplicate graph — the fixpoint
    that :func:`minhash_lsh_groups` takes one step of.

    Iterative min-label propagation: every node's label starts as its own
    doc_id; each round it takes the min of its label and its neighbors'
    labels, until no label changes (≤ graph-diameter rounds; the sf0.1
    LSH dup graph measures diameter ~7 → 8 rounds — cross-band bucket
    chains, NOT star-like). This is the DataFrame form
    of an iterative graph algorithm: one join + groupBy per round, a
    driver-side convergence check on a scalar count, and an eager
    localCheckpoint per round so the plan lineage stays O(1) instead of
    growing by one join per iteration (the classic iterative-Spark trap).

    ``nodes``: (doc_id); ``edges``: (doc_a, doc_b) undirected pairs.
    Returns (doc_id, component_id) with component_id = min doc_id in the
    component — singleton docs map to themselves.

    ``stats``: optional dict; on return carries ``rounds`` (label-
    propagation iterations to fixpoint) and ``sym_edges`` — lets the
    scale probe verify the pointer-jumping O(log diameter) round bound
    without instrumenting logs.
    """
    sym = edges.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(edges.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    # Only edge-touched vertices can ever change label; every other node is
    # a singleton component fixed at its own id from round 0. Iterating over
    # the touched subgraph (dup pairs are a sliver of any real corpus) makes
    # each round's join proportional to the duplicate graph, not the corpus
    # — the full node set rejoins once at the end.
    # LAZY localCheckpoint + count: marking the RDD for local checkpointing
    # and letting the count job materialize it folds (checkpoint job +
    # count job) into ONE job — the blocks persist as a side effect of the
    # first action that computes them, and lineage truncates identically.
    # (r8 verdict #3: the loop's 2-jobs-per-round was why wall time swung
    # 4.0-5.1 s with bit-identical code — every job resamples VM noise.)
    sym = sym.localCheckpoint(eager=False)
    # Size the iteration to the FRONTIER, not the cluster: the duplicate
    # graph is a sliver of the corpus, and every round pays
    # (join + groupBy + checkpoint) × partitions in fixed overhead. The
    # edge count doubles as the checkpoint-materializing action — it runs
    # under the CALLER's conf (AQE on), because it executes the caller's
    # whole edge-building plan (e.g. an LSH bucket join), where AQE's
    # skew/broadcast decisions matter. ~1M edges per partition keeps
    # rounds dense at any scale (a 100 TB corpus with a billion dup edges
    # still fans out to ~1000 tasks).
    n_edges = sym.count()
    parallelism = sym.sparkSession.sparkContext.defaultParallelism
    n_parts = int(max(1, min(parallelism, n_edges // 1_000_000 + 1)))
    loop_spark = _loop_session(nodes.sparkSession, n_parts)
    labels = _cc_loop(
        _rebind(sym, loop_spark), n_parts, n_edges, max_iter, stats
    )
    # Re-home the converged label map onto the CALLER's session: the final
    # corpus-sized nodes⋈labels join must execute under the caller's conf,
    # where AQE's broadcast-vs-shuffle choice is exactly what we want (see
    # the no-broadcast-hint note). No broadcast hint: the touched-label map
    # is tiny on clean corpora but can be a large fraction of a dirty one —
    # AQE picks broadcast vs shuffle from the actual size at runtime.
    labels = _rebind(labels, nodes.sparkSession)
    return nodes.join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("label", "doc_id").alias("component_id")
    )


def _loop_session(spark, n_parts: int):
    """Build the CC loop's execution session: a ``spark.newSession()``
    derivative (shared SparkContext, block manager, and cache; isolated
    SQL conf) pinned to AQE off, shuffle width = the explicitly sized
    ``n_parts``.

    Inside the loop AQE only adds jobs: every exchange becomes its own
    query-stage job (~10 jobs/round measured at sf0.1, scripts/
    probe_cc_jobs.py — 93 jobs → 14 with the bracket) while none of its
    decisions apply — partition count is sized from the edge count, both
    join inputs are checkpoint-backed, and skew means a hot component,
    which salting can't split anyway (min-label is a holistic
    per-component computation). With AQE off the intra-round shuffles
    would fall back to spark.sql.shuffle.partitions (32+ mostly-empty
    tasks per exchange at fixture scale), so the loop session pins that
    to n_parts too — the same width AQE used to coalesce to, now without
    the extra stage jobs.

    A derived session (r10 verdict stretch #6, closing the r9 ADVICE
    session-scope caveat) means the caller's conf is never mutated, even
    transiently: a multi-tenant caller running other queries on its own
    session concurrently with this loop is unaffected. The derived
    session inherits context-level conf (everything set at builder time);
    caller session-LOCAL conf is copied explicitly below so the loop also
    matches a caller that reconfigured its session after creation —
    semantics-relevant knobs like ANSI mode carry over.

    The ``SET`` command is used only to ENUMERATE the explicitly-set
    keys; each value is re-read through ``spark.conf.get``, which does
    not pass through ``spark.redaction.regex`` — the SET output redacts
    values for matching keys (secret|password|token|access.key), and
    copying the literal ``*********(redacted)`` sentinel into the loop
    session would corrupt that conf (r11 ADVICE item 1).

    One loop session is allocated per call and released to Python GC
    with the returned DataFrame's plan; sessions share the caller's
    SparkContext so the JVM-side cost is one SessionState. A long-lived
    embedder hammering this in a tight loop amortizes nothing across
    calls by design — n_parts is sized from each call's edge count, so
    a cached session would pin a stale width."""
    loop = spark.newSession()
    for row in spark.sql("SET").collect():  # explicitly-set confs only
        if row.value is not None and loop.conf.isModifiable(row.key):
            loop.conf.set(row.key, spark.conf.get(row.key))
    loop.conf.set("spark.sql.adaptive.enabled", "false")
    loop.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    return loop


_REBIND_SEQ = itertools.count(1)


def _rebind(df: DataFrame, spark) -> DataFrame:
    """Re-home ``df`` onto ``spark`` — another session of the SAME
    SparkContext — via a global temp view, the public cross-session
    plan-sharing mechanism. ``spark.table`` resolves the view eagerly at
    analysis time (the returned DataFrame embeds the analyzed plan, not a
    catalog reference), so the view is dropped immediately; lazy
    localCheckpoint blocks referenced by the plan live in the shared
    block manager and survive the round-trip. Execution conf binds at
    ACTION time from the DataFrame's session — this is what moves the
    loop's jobs onto the pinned session and the final join back under the
    caller's.

    Names must be unique across CONCURRENT callers — global temp views
    share one per-SparkContext namespace, the very thing the derived
    session exists to make safe — so the counter is an atomic
    ``itertools.count`` (its ``next`` is a single C call, safe under
    the GIL) plus a random suffix as a belt for embedders that share
    the module across interpreters.

    Classic-PySpark-only: the drop-immediately pattern relies on
    ``spark.table`` resolving the view EAGERLY at analysis time. Under
    Spark Connect the plan stays unresolved until action time and the
    already-dropped view would fail to resolve — but newSession()/
    global-temp plan sharing is itself a classic-session mechanism, so
    the whole derived-session loop is classic-only, not just this
    helper (r11 ADVICE item 2)."""
    name = f"_kss_cc_rebind_{next(_REBIND_SEQ)}_{uuid.uuid4().hex[:8]}"
    gt_db = spark.conf.get("spark.sql.globalTempDatabase", "global_temp")
    df.createOrReplaceGlobalTempView(name)
    try:
        return spark.table(f"{gt_db}.{name}")
    finally:
        df.sparkSession.catalog.dropGlobalTempView(name)


def _cc_loop(
    sym: DataFrame,
    n_parts: int,
    n_edges: int,
    max_iter: int,
    stats: dict | None,
) -> DataFrame:
    # Both lazy: round 1's single job computes repartitioned edges AND the
    # initial labels, caching both for every later round.
    sym = sym.repartition(n_parts, "dst").localCheckpoint(eager=False)
    labels = (
        sym.select(F.col("src").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("label"))
        .repartition(n_parts, "doc_id")
        .localCheckpoint(eager=False)
    )

    if stats is not None:
        stats["sym_edges"] = n_edges
        stats["rounds"] = 0
    for _ in range(max_iter):
        if stats is not None:
            stats["rounds"] += 1
        neigh = (
            sym.join(labels, sym.dst == labels.doc_id)
            .groupBy("src")
            .agg(F.min("label").alias("neigh_min"))
        )
        # The convergence signal rides the same projection (old label is
        # already on the row) — no separate new-vs-old join per round —
        # AND the same job: the checkpoint is lazy, so the changed-count
        # action below is the round's ONLY job, materializing the blocks
        # while it counts. (The count's filter sits ABOVE the checkpoint
        # boundary, so every partition/row is still computed and cached.)
        stepped = (
            labels.join(neigh, labels.doc_id == neigh.src, "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("neigh_min"), F.col("label"))
                ).alias("label"),
                (
                    F.coalesce(F.col("neigh_min"), F.col("label")) < F.col("label")
                ).alias("_changed"),
            )
            .localCheckpoint(eager=False)
        )
        changed = stepped.filter(F.col("_changed")).count()
        labels = stepped.drop("_changed")
        # Free the superseded round's checkpoint blocks NOW. localCheckpoint
        # blocks live in the block manager until the ContextCleaner sees the
        # JVM-side RDD garbage-collected — and in PySpark that only happens
        # after a PYTHON gc releases the py4j Dataset reference. Without
        # this, a long-converging graph accumulates two vertex-sized block
        # sets per round (the 50M-node chain probe OOMed a 24g heap at
        # ~round 15); with it, peak storage is O(current + previous round).
        gc.collect()
        if changed == 0:
            break
        _LOG.debug("connected-components round: %d labels changed", changed)
        # Pointer jumping: label <- label(label). A label value is always
        # the id of a touched node in the same component whose own label is
        # <= it, so composing the mapping with itself is correct and
        # monotone — and it collapses chain-shaped components exponentially
        # (plain neighbor-min walks a path one hop per round, needing
        # diameter rounds; with jumping the effective reach doubles, so a
        # path of n nodes converges in O(log n) rounds). One extra
        # vertex-sized self-join per round buys diameter-robustness: before
        # this, any component with diameter > max_iter aborted the job.
        # The jump stays LAZY: both sides read the just-checkpointed
        # `stepped` blocks, so lineage depth stays O(1) and the next
        # round's checkpoint job absorbs the join. Materializing it eagerly
        # cost one full extra job per round — which at small scale (1-few
        # partitions, star-like graphs, 2-4 rounds) was a measured 1.6×
        # wall regression at sf0.1 (r7 verdict, What's missing #2), and at
        # 50M an extra vertex-sized block set held per round for nothing.
        # Exactly ONE lazy jump per round: stacking k un-checkpointed
        # jumps nests self-joins k deep and plan analysis blows up
        # super-linearly (measured: 3 stacked jumps → 434 s/loop at
        # sf0.1 vs 5 s). More jumps also buy nothing — the measured
        # round count is neighbor-hop-limited (8 rounds at any k), not
        # pointer-chain-limited.
        lmap = labels.select(
            F.col("doc_id").alias("_l_id"), F.col("label").alias("_l_lab")
        )
        labels = labels.join(lmap, labels.label == lmap._l_id, "left").select(
            "doc_id",
            F.coalesce(F.col("_l_lab"), F.col("label")).alias("label"),
        )
    else:
        # With pointer jumping, rounds grow like log2(diameter) + waves of
        # the frontier, so max_iter=20 covers ~million-hop chains. Hitting
        # the cap therefore signals a bug, not a big graph. Fail loudly —
        # a silent wrong answer is worse than an abort.
        raise RuntimeError(
            f"connected_dedup_groups: no fixpoint after max_iter={max_iter} "
            f"rounds ({changed} labels still changing); raise max_iter"
        )
    return labels
