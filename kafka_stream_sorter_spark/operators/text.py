"""Text-analysis operators over the ``documents`` table — the
training-data-pipeline surface (BASELINE.json north star; absent from the
reference, whose only string handling is positional CSV key extraction at
``/root/reference/internal/sort/external_sort.go:368-398``).

Everything is built-in column expressions (split / regexp / aggregate /
transform) — JVM-side, codegen'd, shuffle-free per row; at 100 TB these run
as a pure map stage over the document scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_stream_sorter_spark.functions.text_hash import char_poly_hash

# tiny fixed stopword lists per language — the n-gram/marker-word heuristic
# (real pipelines use fastText; the *operator shape* is what matters here:
# deterministic score columns + argmax with a fixed tie order).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}


# Explicit ASCII whitespace class instead of \s: Java's \s includes
# vertical tab \x0B, RE2's (DuckDB) does not, and Python's is
# unicode-aware — three dialects, three answers on exotic bytes. The
# literal below parses identically in all three (\xhh hex escapes), so
# tokenization can never diverge on a regenerated corpus. llm.py's
# SQL_TOKS / the udtf_tokenize splitter carry the same class.
WS_CLASS = r" \t\n\x0B\f\r"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (lowercased) — array<string>."""
    return F.split(F.lower(F.trim(text)), f"[{WS_CLASS}]+")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: total, distinct, and a BPE-ish subword estimate
    (ceil(chars/4) per token — the standard ~4-chars-per-token heuristic)."""
    # `_toks` projects once in its own select (r17): the single-select
    # form pasted the tokenize subtree into all three token expressions
    # (3 tokenizations per row; CollapseProject keeps a non-cheap
    # multi-referenced column in its own projection — the minhash `_g`
    # pattern).
    base = df.select(
        "doc_id",
        tokens(F.col(text_col)).alias("_toks"),
        F.length(text_col).cast("long").alias("n_chars_actual"),
    )
    toks = F.col("_toks")
    return base.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, t: acc + F.ceil(F.length(t) / 4.0)
        ).alias("n_subwords_est"),
        "n_chars_actual",
    )


# GPT-2-ish pre-tokenizer shape, restricted to a regex dialect Spark (Java)
# and DuckDB (RE2) parse identically: letter runs, digit runs, single
# non-alnum-non-space marks.
BPE_PRETOKEN_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def bpe_pretokens(text: Column) -> Column:
    """BPE-style pre-tokenization (regex, lowercased) — array<string>. The
    merge loop of real BPE is vocab-driven; the pre-tokenizer is the part a
    corpus pipeline runs at scale (token counting, cost estimation)."""
    return F.regexp_extract_all(F.lower(text), F.lit(BPE_PRETOKEN_RE), 0)


def bpe_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Regex-tokenizer counting: total pieces and the alpha/numeric/punct
    split — all JVM-side regexp + filter, no Python."""
    # `_pieces` projects once, and each counted filter runs once — the
    # single-select form re-ran the regex pre-tokenizer 6x per row
    # (n_pieces, alpha, num, and all three AGAIN inside n_punct) (r17)
    base = df.select("doc_id", bpe_pretokens(F.col(text_col)).alias("_pieces"))
    pieces = F.col("_pieces")
    mid = base.select(
        "doc_id",
        F.size(pieces).cast("long").alias("_np"),
        F.size(F.filter(pieces, lambda p: p.rlike("^[a-z]+$")))
        .cast("long")
        .alias("_na"),
        F.size(F.filter(pieces, lambda p: p.rlike("^[0-9]+$")))
        .cast("long")
        .alias("_nn"),
    )
    return mid.select(
        "doc_id",
        F.col("_np").alias("n_pieces"),
        F.col("_na").alias("n_alpha"),
        F.col("_nn").alias("n_num"),
        (F.col("_np") - F.col("_na") - F.col("_nn")).alias("n_punct"),
    )


def token_frequencies(df: DataFrame, text_col: str = "text", top_n: int = 100) -> DataFrame:
    """Corpus vocabulary: explode whitespace tokens, count, keep the top_n by
    (count desc, token asc). The shuffle is on token strings with map-side
    partial aggregation; the top-n is orderBy+limit (TakeOrderedAndProject —
    per-partition heads only), so the global-rank window runs over at most
    top_n rows, never the vocabulary."""
    from pyspark.sql import Window

    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    order = [F.col("n_occurrences").desc(), F.col("token").asc()]
    top = counts.orderBy(*order).limit(top_n)
    w = Window.orderBy(*order)
    return top.withColumn("rank", F.row_number().over(w).cast("long"))


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / repetition signals, micros-scaled to
    exact BIGINTs so they are cross-engine hashable (functions/numeric.py)."""
    text = F.col(text_col)
    # `_toks` projects once (r17: the single-select form re-tokenized 6x
    # per row); the text-derived lengths ride the same first projection
    base = df.select(
        "doc_id",
        tokens(text).alias("_toks"),
        F.length(text).alias("_nc"),
        (
            F.length(text)
            - F.length(F.regexp_replace(text, f"[^\\w{WS_CLASS}]", ""))
        ).alias("_punct"),
    )
    toks = F.col("_toks")
    n_tok = F.size(toks)
    n_chars = F.col("_nc")
    stop_hits = F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS["en"])))
    punct = F.col("_punct")
    distinct_ratio = F.size(F.array_distinct(toks)) / n_tok
    # n_tok >= 1 always (split of '' is ['']), but n_chars CAN be 0: an
    # empty-text doc would hit DIVIDE_BY_ZERO under Spark 4's default ANSI
    # mode while DuckDB quietly yields NULL — guard both sides to 0 (the
    # oracle carries the matching CASE WHEN).
    punct_ratio = F.when(
        n_chars > 0, F.floor(punct / n_chars * 1_000_000)
    ).otherwise(F.lit(0))
    return base.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        F.floor(n_chars / n_tok * 1000).cast("long").alias("avg_token_len_milli"),
        F.floor(stop_hits / n_tok * 1_000_000).cast("long").alias("stopword_ratio_micro"),
        punct_ratio.cast("long").alias("punct_ratio_micro"),
        F.floor(distinct_ratio * 1_000_000).cast("long").alias("distinct_ratio_micro"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: score = marker hits per language; argmax with
    fixed tie order (score desc, language asc). Deterministic; degenerate on
    the synthetic corpus (English-ish vocab) by design of the fixture."""
    # two projection boundaries (r17): the single-select form pasted the
    # tokenize+filter subtree of every language's score into `best` and
    # into every argmax WHEN — ~60 copies of the tokenize subtree in the
    # executed plan, i.e. ~60 tokenizations + marker scans per row. Now
    # `_toks` projects once, each score computes once, and the argmax
    # reads score COLUMNS.
    base = df.select("doc_id", tokens(F.col(text_col)).alias("_toks"))

    def _hits(markers: list[str]) -> Column:
        # closure factory — a default-arg lambda would change the SQL arity
        return F.size(
            F.filter(F.col("_toks"), lambda t: t.isin(*markers))
        ).cast("long")

    mid = base.select(
        "doc_id",
        *[
            _hits(LANG_MARKERS[lang]).alias(f"score_{lang}")
            for lang in sorted(LANG_MARKERS)
        ],
    )
    scores = {lang: F.col(f"score_{lang}") for lang in LANG_MARKERS}
    best = F.greatest(*scores.values())
    pred = F.coalesce(
        *[F.when((scores[lang] == best) & (best > 0), F.lit(lang)) for lang in sorted(scores)],
        F.lit("und"),
    )
    return mid.select(
        "doc_id",
        *[scores[lang].alias(f"score_{lang}") for lang in sorted(scores)],
        pred.alias("lang_pred"),
    )


def fingerprints(df: DataFrame, text_col: str = "text", k: int = 5) -> DataFrame:
    """Document fingerprinting: whole-text polynomial hash + the minimum of
    all rolling k-char-gram hashes (the winnowing primitive). Both are plain
    integer arithmetic — portable across engines (functions/text_hash.py)."""
    text = F.col(text_col)
    # greatest(..., 1) guards docs shorter than k (sequence(1, 0) would
    # otherwise produce a DESCENDING sequence, not an empty one)
    rolling = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(text) - (k - 1), F.lit(1))),
        lambda i: char_poly_hash(F.substring(text, i, k)),
    )
    # `_roll` projects once (r17): min and max each re-ran the whole
    # rolling-hash transform — every k-gram hashed twice per row
    base = df.select(
        "doc_id",
        char_poly_hash(text).alias("full_hash"),
        rolling.alias("_roll"),
    )
    return base.select(
        "doc_id",
        "full_hash",
        F.array_min("_roll").alias("min_kgram_hash"),
        F.array_max("_roll").alias("max_kgram_hash"),
    )


def repetition_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition quality signals, computed array-side so the
    whole operator is a shuffle-free map stage (no corpus-wide explode):
    top-token fraction (count of the modal token / total tokens) and
    duplicate-bigram fraction (1 − distinct bigrams / bigrams). Ratios are
    micros-scaled exact integers (functions/numeric.py rationale). Per-row
    cost is O(distinct·total) token comparisons — bounded by document
    length, irrelevant next to the scan at corpus scale."""
    # The token array projects ONCE as `_toks` in its own select (r17):
    # the single-select form pasted the tokenize subtree into every
    # output expression — 16 copies of split(lower(trim(text))) in the
    # executed plan, including INSIDE the bigram transform's lambda,
    # where element_at(tokens(text), i) re-tokenized the document per
    # bigram index (O(n) tokenizations per row). Same projection-
    # boundary pattern as the r16 minhash `_g` fix: CollapseProject
    # keeps a non-cheap multi-referenced column in its own projection.
    base = df.select("doc_id", tokens(F.col(text_col)).alias("_toks"))
    toks = F.col("_toks")
    n_tok = F.size(toks)
    # modal-token count = longest equal-run in the sorted token array —
    # O(n log n) per row (the naive distinct×filter scan is O(n²), which
    # at 100-token docs is a 100× slowdown measured at sf0.1)
    acc0 = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )

    def _run(acc: Column, t: Column) -> Column:
        run = F.when(t == acc.getField("prev"), acc.getField("run") + 1).otherwise(F.lit(1))
        return F.struct(
            t.alias("prev"), run.alias("run"), F.greatest(acc.getField("best"), run).alias("best")
        )

    top_n = F.aggregate(F.array_sort(toks), acc0, _run, lambda acc: acc.getField("best"))
    # single-token docs have NO bigrams: the old sequence(1, greatest(n-1, 1))
    # still emitted index 1 and element_at(toks, 2) threw
    # INVALID_ARRAY_INDEX_IN_ELEMENT_AT under Spark 4's default ANSI mode.
    # Guard to an empty array (the oracle's CASE WHEN len >= 2 twin), and
    # guard the ratio's /n_bi the same way.
    bigrams = F.when(
        n_tok >= 2,
        F.transform(
            F.sequence(F.lit(1), n_tok - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # second boundary: the bigram array and modal count are each read
    # twice downstream (count + ratio), so they materialize as columns —
    # the bigram concat runs once per row, not once per reader
    mid = base.select(
        "doc_id",
        n_tok.alias("_ntok"),
        top_n.alias("_top"),
        bigrams.alias("_bi"),
    )
    n_bi = F.size("_bi")
    dup_bigram = F.when(
        n_bi > 0,
        F.floor((1 - F.size(F.array_distinct("_bi")) / n_bi) * 1_000_000),
    ).otherwise(F.lit(0))
    return mid.select(
        "doc_id",
        F.col("_ntok").cast("long").alias("n_tokens"),
        F.col("_top").cast("long").alias("top_token_count"),
        F.floor(F.col("_top") / F.col("_ntok") * 1_000_000)
        .cast("long")
        .alias("top_token_ratio_micro"),
        dup_bigram.cast("long").alias("dup_bigram_ratio_micro"),
    )


# PII patterns restricted to a dialect Java regex and RE2 share (no
# backrefs, no lookaround); text is lowercased first so the classes stay
# short. Order matters: emails are scrubbed before phones so the phone
# pattern can't match digits inside an already-redacted token.
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII detection + redaction: count and replace email/phone matches
    with typed placeholders. Pure JVM regexp (codegen'd map stage); the
    counts let a pipeline quantify leakage before deciding to drop vs
    scrub. Returns doc_id, match counts, and the scrubbed text's length
    and portable hash (the hash pins the exact redacted bytes cross-engine
    without hauling full text through the compare)."""
    text = F.lower(F.col(text_col))
    n_emails = F.regexp_count(text, F.lit(PII_EMAIL_RE))
    # Phones are counted on the email-scrubbed intermediate, not the raw
    # text, so a phone-shaped digit run inside an email address is neither
    # counted nor double-redacted — the counts describe exactly the
    # redactions performed (the oracle counts on the same intermediate).
    # Each scrub stage projects once (r17): the single-select form re-ran
    # the email replace 3x and the phone replace 2x per row (5
    # regexp_replace passes in the executed plan where 2 suffice).
    email_scrubbed = F.regexp_replace(text, PII_EMAIL_RE, "<email>")
    base = df.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        email_scrubbed.alias("_es"),
    )
    mid = base.select(
        "doc_id",
        "n_emails",
        F.regexp_count(F.col("_es"), F.lit(PII_PHONE_RE))
        .cast("long")
        .alias("n_phones"),
        F.regexp_replace(F.col("_es"), PII_PHONE_RE, "<phone>").alias("_sc"),
    )
    return mid.select(
        "doc_id",
        "n_emails",
        "n_phones",
        F.length("_sc").cast("long").alias("scrubbed_len"),
        char_poly_hash(F.col("_sc")).alias("scrubbed_hash"),
    )


def chunk_windows(
    df: DataFrame, text_col: str = "text", size: int = 200, stride: int = 150
) -> DataFrame:
    """RAG-style context chunking: overlapping character windows of
    ``size`` every ``stride``, as (doc_id, chunk_idx, chunk_start,
    chunk_len, chunk_hash) — posexplode over a JVM-generated start
    sequence, so chunking a 100 TB corpus is a pure map+explode stage with
    no Python and no shuffle. The final window is allowed to run short
    (substring clamps at end-of-text); docs shorter than ``size`` yield
    exactly one chunk. The portable chunk hash pins content without
    carrying chunk text through the compare."""
    text = F.col(text_col)
    starts = F.sequence(
        F.lit(1), F.greatest(F.length(text) - size + stride, F.lit(1)), F.lit(stride)
    )
    chunk = F.substring(F.col("__t"), F.col("start"), size)
    return (
        df.select("doc_id", text.alias("__t"), F.posexplode(starts).alias("chunk_idx", "start"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.col("start").cast("long").alias("chunk_start"),
            F.length(chunk).cast("long").alias("chunk_len"),
            char_poly_hash(chunk).alias("chunk_hash"),
        )
    )
