"""Edge-case behavior of custom operators: empty inputs, degenerate strings,
missing keys — the states a 100 TB run hits somewhere in some partition."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_sorter_spark.operators.dedup import (
    char_ngram_hashes,
    jaccard_pairs,
    ngram_jaccard_pairs,
)
from kafka_stream_sorter_spark.operators.interval_join import interval_join_after
from kafka_stream_sorter_spark.operators.similarity import brute_force_topk_vectorized
from kafka_stream_sorter_spark.sources.parquet import load_table


def test_char_ngrams_of_short_strings_are_empty(spark):
    df = spark.createDataFrame(
        [("", ), ("a", ), ("ab", ), ("abc", ), ("abcd", )], ["s"]
    ).select(F.size(char_ngram_hashes(F.col("s"), 3)).alias("n"))
    assert [r.n for r in df.collect()] == [0, 0, 0, 1, 2]


def test_interval_join_empty_right_side(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    left = events.select("user_id", F.col("ts").alias("lts")).limit(10)
    right = events.filter(F.lit(False)).select("user_id", F.col("ts").alias("rts"))
    out = interval_join_after(
        left, right, keys=["user_id"], left_ts="lts", right_ts="rts", width_seconds=60
    )
    assert out.count() == 0


def test_jaccard_empty_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.lit(False))
    assert jaccard_pairs(docs).count() == 0
    assert ngram_jaccard_pairs(docs).count() == 0


def test_vectorized_ann_missing_query_ids(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    # query ids far outside the corpus -> no query vectors -> no results
    out = brute_force_topk_vectorized(emb, query_ids=[10**12], k=5)
    assert out.count() == 0


def test_vectorized_ann_k_larger_than_corpus(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(3)
    out = brute_force_topk_vectorized(emb, query_ids=[0], k=50)
    # at most corpus-1 neighbors, every rank unique
    rows = out.collect()
    assert 0 < len(rows) <= 2
    assert sorted({r.rank for r in rows}) == sorted(r.rank for r in rows)


def test_connected_components_chain_and_islands(spark):
    from kafka_stream_sorter_spark.operators.dedup import connected_dedup_groups

    # chain 1-2-3-4-5 (diameter > 1 forces multiple propagation rounds),
    # pair 10-11, singleton 20
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 5, 10, 11, 20]], ["doc_id"])
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], ["doc_a", "doc_b"]
    )
    got = {r.doc_id: r.component_id for r in connected_dedup_groups(nodes, edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_no_edges(spark):
    from kafka_stream_sorter_spark.operators.dedup import connected_dedup_groups

    nodes = spark.createDataFrame([(i,) for i in range(5)], ["doc_id"])
    edges = spark.createDataFrame([], "doc_a long, doc_b long")
    got = {r.doc_id: r.component_id for r in connected_dedup_groups(nodes, edges).collect()}
    assert got == {i: i for i in range(5)}


def test_interval_join_boundary_exactness(spark):
    """Pairs land exactly on the (open, closed] boundary: r.ts == l.ts is
    excluded, r.ts == l.ts + width is included, one µs past is excluded —
    and bucket replication finds pairs that straddle a bucket edge."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def t(sec):
        return base + dt.timedelta(seconds=sec)

    left = spark.createDataFrame([(1, t(0))], ["k", "lts"])
    width = 10
    right = spark.createDataFrame(
        [
            (1, 100, t(0)),       # == l.ts → excluded (strict >)
            (1, 101, t(5)),       # inside, same bucket
            (1, 102, t(10)),      # == l.ts + width → included (<=)
            (1, 103, t(10) + dt.timedelta(microseconds=1)),  # 1µs past → out
            (1, 104, t(15)),      # next bucket, out of window
        ],
        ["k", "rid", "rts"],
    )
    out = interval_join_after(left, right, ["k"], "lts", "rts", width)
    assert sorted(r.rid for r in out.collect()) == [101, 102]

    # straddle: left at 9s, window (9, 19]; right at 12s is in bucket 1
    # while left's home bucket is 0 — only the +1 replica can find it
    left2 = spark.createDataFrame([(1, t(9))], ["k", "lts"])
    out2 = interval_join_after(left2, right, ["k"], "lts", "rts", width)
    assert sorted(r.rid for r in out2.collect()) == [102, 103, 104]


def test_time_bucket_boundary(spark):
    """An event exactly on a bucket edge belongs to the bucket it opens."""
    from kafka_stream_sorter_spark.functions.numeric import epoch_us

    import datetime as dt

    width = 21_600_000_000  # 6h, as agg_time_bucket
    rows = [
        (dt.datetime(2024, 1, 1, 0, 0, 0),),   # edge: bucket start
        (dt.datetime(2024, 1, 1, 5, 59, 59),), # last µs-ish of bucket 0
        (dt.datetime(2024, 1, 1, 6, 0, 0),),   # edge: next bucket
    ]
    df = spark.createDataFrame(rows, ["ts"]).select(
        ((epoch_us("ts") - epoch_us("ts") % width) / width).cast("long").alias("b")
    )
    b = [r.b for r in df.collect()]
    assert b[0] == b[1] and b[2] == b[0] + 1


def test_fuzzy_join_blocks_exclude_cross_nation(spark):
    """Identical names in different nations must NOT pair (blocked join);
    distance-2 names in one nation must not pass the <=1 frontier."""
    from kafka_stream_sorter_spark.registry import QUERIES

    rows = [
        (1, "Supplier#000000001", 1, 0.0),
        (2, "Supplier#000000001", 2, 0.0),  # same name, other nation
        (3, "Supplier#000000002", 1, 0.0),  # dist 1 from #1
        (4, "Supplier#000000033", 1, 0.0),  # dist 2 from #1
    ]
    sup = spark.createDataFrame(rows, ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"])
    sup.createOrReplaceTempView("__fuzzy_edge")
    from pyspark.sql import functions as _F
    a = sup.select(_F.col("s_suppkey").alias("supp_a"), _F.col("s_name").alias("name_a"), _F.col("s_nationkey").alias("nk_a"))
    b = sup.select(_F.col("s_suppkey").alias("supp_b"), _F.col("s_name").alias("name_b"), _F.col("s_nationkey").alias("nk_b"))
    out = (
        a.join(b, (_F.col("nk_a") == _F.col("nk_b")) & (_F.col("supp_a") < _F.col("supp_b"))
               & (_F.abs(_F.length("name_a") - _F.length("name_b")) <= 1))
        .withColumn("d", _F.levenshtein("name_a", "name_b"))
        .filter(_F.col("d") <= 1)
        .select("supp_a", "supp_b")
    )
    got = {(r.supp_a, r.supp_b) for r in out.collect()}
    assert got == {(1, 3)}  # only the within-nation distance-1 pair


def test_stream_topk_ties_deterministic(spark, sf_dir):
    """stream_topk's boundary is deterministic under value ties thanks to
    the event_id tie-break: re-running yields the identical row set."""
    from kafka_stream_sorter_spark.registry import QUERIES

    a = {(r.event_id, r.value) for r in QUERIES["stream_topk"](spark, sf_dir).collect()}
    b = {(r.event_id, r.value) for r in QUERIES["stream_topk"](spark, sf_dir).collect()}
    assert a == b and len(a) == 100


def test_interval_join_pre_epoch_timestamps(spark):
    """Bucket arithmetic must hold for pre-1970 (negative-epoch) timestamps:
    truncation-toward-zero division still satisfies the two-bucket covering
    property, so no qualifying pair is dropped."""
    import datetime as dt

    base = dt.datetime(1969, 12, 31, 23, 59, 30)  # 30s before the epoch

    def t(sec):
        return base + dt.timedelta(seconds=sec)

    left = spark.createDataFrame([(1, t(0))], ["k", "lts"])
    right = spark.createDataFrame(
        [(1, 200, t(5)), (1, 201, t(10)), (1, 202, t(35)), (1, 203, t(0))],
        ["k", "rid", "rts"],
    )
    # width 10s, window (base, base+10]: rid 200 in, 201 on the inclusive
    # edge (straddles the epoch boundary itself), 202 out, 203 excluded
    out = interval_join_after(left, right, ["k"], "lts", "rts", 10)
    assert sorted(r.rid for r in out.collect()) == [200, 201]


def test_connected_components_long_chain_converges(spark):
    """A 60-node path has diameter 59 — plain neighbor-min propagation
    walks it one hop per round and would abort at max_iter=20. Pointer
    jumping (label <- label(label), added round 4) must converge it in
    O(log n) rounds with every node labeled by the chain head."""
    from kafka_stream_sorter_spark.operators.dedup import connected_dedup_groups

    n = 60
    nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], ["doc_id"])
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], ["doc_a", "doc_b"]
    )
    got = {r.doc_id: r.component_id for r in connected_dedup_groups(nodes, edges).collect()}
    assert got == {i: 1 for i in range(1, n + 1)}


def test_connected_components_chain_worst_label_order(spark):
    """Chain labeled so the MIN sits at the far end of the walk direction
    (ids descending along the path): ids 1..40 connected as
    (40,39),(39,38),... — the minimum must still reach node 40."""
    from kafka_stream_sorter_spark.operators.dedup import connected_dedup_groups

    n = 40
    nodes = spark.createDataFrame([(i,) for i in range(1, n + 1)], ["doc_id"])
    edges = spark.createDataFrame(
        [(i + 1, i) for i in range(1, n)], ["doc_a", "doc_b"]
    )
    got = {r.doc_id: r.component_id for r in connected_dedup_groups(nodes, edges).collect()}
    assert got == {i: 1 for i in range(1, n + 1)}


def test_connected_components_random_graphs_vs_union_find(spark):
    """Fuzz: random graphs at several densities vs a pure-Python
    union-find replica — exercises propagation + pointer jumping together
    across multi-partition inputs (the jumping self-join shuffles by
    label, a path no fixture-shaped graph stresses)."""
    import random

    from kafka_stream_sorter_spark.operators.dedup import connected_dedup_groups

    def union_find(n, pairs):
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        # canonical component id = min node id in the component
        comp = {}
        for x in range(n):
            r = find(x)
            comp.setdefault(r, []).append(x)
        out = {}
        for members in comp.values():
            m = min(members)
            for x in members:
                out[x] = m
        return out

    rng = random.Random(99)
    for n, n_edges in ((50, 10), (80, 80), (120, 300)):
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(n_edges)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        nodes = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"])
        edges = spark.createDataFrame(pairs, ["doc_a", "doc_b"]).repartition(5)
        got = {
            r.doc_id: r.component_id
            for r in connected_dedup_groups(nodes, edges).collect()
        }
        assert got == union_find(n, pairs), f"diverged at n={n}, e={len(pairs)}"


def test_ivf_kmeans_rejects_non_contiguous_seed_ids(spark):
    """The seed rule (vec_id < n_clusters, replayed literally by the
    DuckDB oracle) requires ids 0..n_clusters-1; a corpus without them
    must fail with the contract named, not StopIteration / silent
    under-clustering."""
    import pytest as _pytest

    from kafka_stream_sorter_spark.operators.similarity import ivf_kmeans_topk

    emb = spark.createDataFrame(
        [(1000 + i, [float(i), float(i % 3)]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(ValueError, match="contiguous ids"):
        ivf_kmeans_topk(emb, query_ids=[1000], n_clusters=4)


def test_text_operators_survive_degenerate_docs(spark):
    """Empty and single-token documents: quality_scores divided by
    length(text)==0 and repetition_scores indexed element_at(toks, 2) on a
    1-token array — both crashed under Spark 4's default ANSI mode until
    guarded (round-4 review). The oracles' CASE WHEN twins yield 0 for the
    guarded ratios."""
    from kafka_stream_sorter_spark.operators.text import (
        pii_scrub,
        quality_scores,
        repetition_scores,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, "hello"), (3, "  "), (4, "a b a b")],
        "doc_id long, text string",
    )
    q = {r.doc_id: r for r in quality_scores(docs).collect()}
    assert q[1].punct_ratio_micro == 0  # guarded, not DIVIDE_BY_ZERO
    assert q[2].n_tokens == 1

    r = {x.doc_id: x for x in repetition_scores(docs).collect()}
    assert r[2].dup_bigram_ratio_micro == 0  # single token -> no bigrams
    assert r[4].dup_bigram_ratio_micro == 333_333  # 3 bigrams, 2 distinct

    p = {x.doc_id: x for x in pii_scrub(docs).collect()}
    assert p[1].n_emails == 0 and p[1].n_phones == 0


def test_pii_phone_inside_email_counted_once(spark):
    """A phone-shaped digit run inside an email address is redacted as
    part of the email and must NOT be counted as a phone (counts describe
    exactly the redactions performed)."""
    from kafka_stream_sorter_spark.operators.text import pii_scrub

    docs = spark.createDataFrame(
        [(1, "mail me: 555-123-4567@example.com"), (2, "call 555-123-4567")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert got[1].n_emails == 1 and got[1].n_phones == 0
    assert got[2].n_emails == 0 and got[2].n_phones == 1


def test_frame_offsets_empty_doc_emits_no_rows(spark):
    """Empty blob: sequence(0, -1, k) would throw; the guard drops the row
    via explode of an empty array — matching the oracle's range(0,0,k)."""
    from kafka_stream_sorter_spark.operators.multimodal import frame_sample_offsets

    docs = spark.createDataFrame([(1, ""), (2, "x" * 2000)], "doc_id long, text string")
    rows = frame_sample_offsets(docs).collect()
    assert sorted(r.doc_id for r in rows) == [2, 2]
    assert sorted(r.frame_offset for r in rows) == [0, 1024]


def test_normalize_timestamps_covers_all_declared_ts_columns(spark):
    """Legacy-nanos normalization keys on the DECLARED schema, not a
    hard-coded 'ts' name: a bigint o_orderdate (a NANOS flip hitting the
    orders table) must normalize too."""
    from kafka_stream_sorter_spark.sources.parquet import normalize_timestamps

    ns = 1_700_000_000_000_000_000  # 2023-11-14T22:13:20Z in nanos
    df = spark.createDataFrame(
        [(1, ns), (2, ns + 86_400 * 10**9)], "o_orderkey long, o_orderdate long"
    )
    out = normalize_timestamps(df)
    assert dict(out.dtypes)["o_orderdate"] == "timestamp"
    got = out.orderBy("o_orderkey").collect()[0].o_orderdate
    assert got.year == 2023 and got.month == 11 and got.day == 14


def test_tokenizer_whitespace_class_matches_duckdb_on_vertical_tab(spark):
    """Java's \\s includes \\x0B, RE2's does not — the explicit class must
    make Spark and DuckDB tokenize a vertical-tab document identically."""
    import duckdb

    from kafka_stream_sorter_spark.operators.text import tokens
    from kafka_stream_sorter_spark.queries.llm import SQL_TOKS
    from pyspark.sql import functions as F

    weird = "a\x0bb c\td"
    spark_toks = (
        spark.createDataFrame([(weird,)], "text string")
        .select(tokens(F.col("text")).alias("t"))
        .collect()[0]
        .t
    )
    duck_toks = duckdb.sql(
        f"SELECT {SQL_TOKS} FROM (SELECT '{weird}' AS text)"
    ).fetchall()[0][0]
    assert spark_toks == duck_toks == ["a", "b", "c", "d"]


def test_connected_components_session_isolated(spark):
    """The CC loop runs on a ``newSession()``-derived session pinned to
    (AQE off, shuffle width = n_parts); the caller's conf is NEVER
    mutated — not even transiently (r10 verdict stretch #6, closing the
    r9 multi-tenant caveat) — including when the loop raises (max_iter
    exhaustion fails loudly by design). The loop's own session must
    really carry the pins, the loop frames must really be bound to it,
    and no global temp view may leak."""
    import pytest

    from kafka_stream_sorter_spark.operators import dedup as dedup_mod
    from kafka_stream_sorter_spark.operators.dedup import connected_dedup_groups

    keys = ("spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions")
    before = {k: spark.conf.get(k) for k in keys}

    seen: dict = {}
    orig_loop = dedup_mod._cc_loop

    def spying_loop(sym, n_parts, n_edges, max_iter, stats):
        loop_spark = sym.sparkSession
        seen["is_caller"] = loop_spark is spark
        seen["aqe"] = loop_spark.conf.get("spark.sql.adaptive.enabled")
        seen["width"] = loop_spark.conf.get("spark.sql.shuffle.partitions")
        seen["n_parts"] = n_parts
        # mid-loop: the CALLER's conf must be untouched right now
        seen["caller_mid"] = {k: spark.conf.get(k) for k in keys}
        return orig_loop(sym, n_parts, n_edges, max_iter, stats)

    nodes = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], ["doc_a", "doc_b"]
    )
    dedup_mod._cc_loop = spying_loop
    try:
        out = connected_dedup_groups(nodes, edges)
        rows = {r.doc_id: r.component_id for r in out.collect()}
    finally:
        dedup_mod._cc_loop = orig_loop
    assert rows == {i: 0 for i in range(6)}
    assert seen["is_caller"] is False
    assert seen["aqe"] == "false"
    assert seen["width"] == str(seen["n_parts"])
    assert seen["caller_mid"] == before
    assert {k: spark.conf.get(k) for k in keys} == before
    # the rebind views must not leak into the shared global-temp catalog
    gt_db = spark.conf.get("spark.sql.globalTempDatabase", "global_temp")
    leaked = [
        t.name
        for t in spark.catalog.listTables(gt_db)
        if t.name.startswith("_kss_cc_rebind_")
    ]
    assert leaked == []

    # failure path: a 6-node chain cannot converge in 1 round
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_dedup_groups(nodes, edges, max_iter=1)
    assert {k: spark.conf.get(k) for k in keys} == before


def test_cc_loop_session_conf_copy_unredacted(spark):
    """``_loop_session`` enumerates explicitly-set confs via the SET
    command but re-reads each VALUE through ``conf.get``: SET redacts
    values whose key matches ``spark.redaction.regex`` (secret|password|
    token|access.key), and copying the literal sentinel would corrupt
    the loop session's conf (r11 ADVICE item 1). No registered
    modifiable SQL conf matches the default regex today, so the hazard
    is pinned two ways: (a) the SET-vs-conf.get discrepancy is real on
    this Spark build — if it ever stops being real the rationale is
    stale; (b) every conf the loop session carries equals the caller's
    TRUE value, never the redaction sentinel."""
    from kafka_stream_sorter_spark.operators.dedup import _loop_session

    sentinel = "*********(redacted)"
    sess = spark.newSession()
    sess.conf.set("spark.kss.test.password", "hunter2")
    ansi = sess.conf.get("spark.sql.ansi.enabled")
    sess.conf.set("spark.sql.ansi.enabled", ansi)  # modifiable → copied
    set_vals = {r.key: r.value for r in sess.sql("SET").collect()}
    assert set_vals["spark.kss.test.password"] == sentinel
    assert sess.conf.get("spark.kss.test.password") == "hunter2"

    loop = _loop_session(sess, 4)
    assert loop.conf.get("spark.sql.shuffle.partitions") == "4"
    assert loop.conf.get("spark.sql.adaptive.enabled") == "false"
    assert loop.conf.get("spark.sql.ansi.enabled") == ansi
    for row in loop.sql("SET").collect():
        assert loop.conf.get(row.key) != sentinel, row.key


def test_connected_components_concurrent_multitenant(spark):
    """Two CC loops running CONCURRENTLY from two independent caller
    sessions — the exact scenario the old conf-mutation bracket forbade
    (any co-running query silently executed under AQE-off/width-pinned
    conf). Both must converge correctly: no shared-conf interference and
    no global-temp-view name collision in the shared catalog. The two
    graphs differ in size and id range so cross-talk cannot accidentally
    produce the right answer."""
    import threading

    from kafka_stream_sorter_spark.operators.dedup import connected_dedup_groups

    def run(sess, n, shift, out, key):
        try:
            nodes = sess.createDataFrame(
                [(shift + i,) for i in range(n)], ["doc_id"]
            )
            edges = sess.createDataFrame(
                [(shift + i, shift + i + 1) for i in range(n - 1)],
                ["doc_a", "doc_b"],
            )
            out[key] = {
                r.doc_id: r.component_id
                for r in connected_dedup_groups(nodes, edges).collect()
            }
        except BaseException as e:  # surface thread failures in the assert
            out[key] = e

    s1, s2 = spark.newSession(), spark.newSession()
    out: dict = {}
    threads = [
        threading.Thread(target=run, args=(s1, 8, 100, out, "a")),
        threading.Thread(target=run, args=(s2, 12, 500, out, "b")),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert out["a"] == {100 + i: 100 for i in range(8)}, out["a"]
    assert out["b"] == {500 + i: 500 for i in range(12)}, out["b"]


def test_connected_components_job_count_bounded(spark):
    """Machine-independent pin of the r9 jobs-per-round fix (lazy
    localCheckpoint folds the checkpoint job into the convergence count;
    AQE off inside the loop stops per-exchange stage jobs): one run must
    submit ≤ rounds + a small setup constant of Spark jobs. The eager-
    checkpoint + AQE regime measured ~10 jobs/round (scripts/
    probe_cc_jobs.py: 104 → 20 at sf0.1); this bound fails if either
    regression returns."""
    from kafka_stream_sorter_spark.operators.dedup import connected_dedup_groups

    sc = spark.sparkContext
    nodes = spark.createDataFrame([(i,) for i in range(40)], ["doc_id"])
    # two 20-node chains: diameter 19 -> ~6 pointer-jumping rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(19)]
        + [(20 + i, 21 + i) for i in range(19)],
        ["doc_a", "doc_b"],
    )
    group = "cc_jobcount_probe"
    sc.setJobGroup(group, "cc job-count bound")
    stats: dict = {}
    connected_dedup_groups(nodes, edges, stats=stats).collect()
    sc.setJobGroup("cc_jobcount_idle", "idle")
    n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    # budget: 1 edge-count job (runs under caller conf, AQE stage jobs
    # possible: +2 slack) + 1 job/round + the final collect (AQE again)
    rounds = stats["rounds"]
    assert rounds >= 5  # the shape really is multi-round
    assert n_jobs <= rounds + 8, (
        f"CC loop submitted {n_jobs} jobs for {rounds} rounds — "
        "the per-round job fold regressed"
    )
