"""Portable text hashing — the primitive under fingerprinting, MinHash,
SimHash, and LSH banding.

Built-in hash functions are engine-specific (Spark xxhash64/murmur3 have no
DuckDB twin), so every hash here is a *polynomial rolling hash over ASCII
codes* computed with plain integer arithmetic — bit-identical in any engine
(verified Spark == DuckDB in tests). Spark evaluates it inside whole-stage
codegen via ``transform``/``aggregate`` higher-order functions: no UDF, no
Python in the loop, fully distributed.

    h(s) = fold(chars(s), 0, (acc, c) -> (acc * 31 + ascii(c)) mod P)

P = 1e9+7 keeps every intermediate < 2^63 (acc < P, acc*31 + 127 < 3.3e10).
MinHash permutations are the classic universal-hash family
(a_i * h + b_i) mod P with fixed multipliers (all the family needs is
a_i != 0 mod P; MINHASH_A[15] happens to be even).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 1_000_000_007

# fixed MinHash permutation parameters: 16 hashes → 4 bands × 4 rows.
# 4-row bands collide with probability j^4 per band — with 2-row bands a
# small-vocabulary corpus put >60% of docs into ONE bucket (candidate set
# quadratic in corpus size); r=4 keeps the LSH threshold ≈ (1/4)^(1/4) ≈ 0.71.
MINHASH_A = [
    1_000_003, 999_983, 838_021, 753_211, 613_651, 541_699, 479_001, 402_653,
    334_211, 287_117, 251_263, 199_999, 166_601, 131_071, 104_729, 87_178,
]
MINHASH_B = [
    12_289, 24_593, 49_157, 98_317, 196_613, 393_241, 786_433, 1_572_869,
    3_145_739, 6_291_469, 12_582_917, 25_165_843, 50_331_653, 100_663_319,
    201_326_611, 402_653_189,
]
N_MINHASH = len(MINHASH_A)
LSH_ROWS = 4  # minhashes per band
LSH_BANDS = N_MINHASH // LSH_ROWS


def char_poly_hash(s: Column) -> Column:
    """Polynomial hash of a string column (JVM-side fold over its chars)."""
    return F.aggregate(
        F.split(s, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % P,
    )


def token_hashes(tokens: Column) -> Column:
    """array<string> → array<long> of per-token polynomial hashes."""
    return F.transform(tokens, char_poly_hash)


def _perm(a: int, b: int):
    # closure factory: pyspark inspects lambda arity, so default-arg capture
    # (lambda h, a=a: ...) would be mis-read as a 3-arg SQL lambda
    return lambda h: (h * a + b) % P


def _cube_mix(h):
    """Non-linear premix g = h^3 mod P applied to token hashes before the
    linear permutation family. The linear family alone is NOT min-wise
    independent on structured hash sets: tokens with sequential decimal
    suffixes ("item_0", "item_1", … — log lines, counters, templated
    boilerplate, exactly what a web-scale corpus contains) produce char
    hashes in arithmetic runs, and (a*h+b) mod P maps runs to runs, so
    which element is the min becomes correlated across documents.
    Measured planted-pair recall at 1M docs (scripts/probe_dedup_recall.py,
    SCALING.md round-7 table) collapsed to 0.813 at Jaccard 0.9 (theory
    0.986) and to 0.246 at Jaccard 0.7 (theory 0.667).
    Cubing is non-linear (breaks runs), a BIJECTION mod P (gcd(3, P-1)=1
    — no extra collisions), overflow-safe ((P-1)^2 ≈ 1.0e18 < 2^63), and
    restores theory-exact recall at every planted level. Applied once per
    token hash; all 16 permutations share the mixed value."""
    return ((h * h % P) * h) % P


def minhash_signature(tok_hashes: Column) -> list[Column]:
    """16 MinHash values: min over tokens of (a_i * g + b_i) mod P where
    g = h^3 mod P (see :func:`_cube_mix` for why the premix exists)."""
    mixed = F.transform(tok_hashes, _cube_mix)
    return [
        F.array_min(F.transform(mixed, _perm(a, b)))
        for a, b in zip(MINHASH_A, MINHASH_B)
    ]


def spark_sql_minhash_exprs(g_sql: str) -> list[str]:
    """Spark-SQL texts of the 16 MinHash values over a PREMIXED
    token-hash array column/expression ``g_sql`` (= cube premix of the
    token hashes, :func:`_cube_mix` — the caller projects it once, like
    the DuckDB twin's :func:`sql_minhash` contract) — the SAME
    permutation expressions :func:`minhash_signature` builds from Column
    objects, rendered as strings so one ``F.expr`` parse replaces ~80
    py4j round-trips of higher-order-lambda plumbing per permutation
    (r16: 1296 → ~150 round-trips per signature build; profiled in
    OPTIMIZATION_r16.md). Arithmetic is textually the Column form's —
    ``(g*a + b) % P`` per permutation, integer literals only, so values
    are bit-identical (pinned by tests/test_minhash_random.py's replica
    and the registered oracles). Kept adjacent to
    :func:`minhash_signature` and :func:`sql_minhash` so the three-way
    lockstep (Spark / DuckDB twin / Python replica) stays reviewable in
    one file."""
    return [
        f"array_min(transform({g_sql}, g -> (g * {a} + {b}) % {P}))"
        for a, b in zip(MINHASH_A, MINHASH_B)
    ]


def band_bucket(minhashes: list[Column]) -> Column:
    """Folds one band's LSH_ROWS minhash columns into a single bucket id via
    the same polynomial fold as char hashing (all intermediates < 32*P)."""
    acc = F.lit(0).cast("long")
    for mh in minhashes:
        acc = (acc * 31 + mh) % P
    return acc


def sql_band_bucket(mh_exprs: list[str]) -> str:
    """DuckDB twin of band_bucket."""
    acc = "0::BIGINT"
    for e in mh_exprs:
        acc = f"(({acc}) * 31 + {e}) % {P}"
    return acc


def spark_sql_band_bucket(mh_exprs: list[str]) -> str:
    """Spark-SQL text of :func:`band_bucket`'s fold — the same
    ``(acc*31 + mh) % P`` chain rendered as a string (r16 build-cost
    rule; see :func:`spark_sql_minhash_exprs`). Textually mirrors
    :func:`sql_band_bucket` with Spark's cast syntax."""
    acc = "cast(0 as bigint)"
    for e in mh_exprs:
        acc = f"(({acc}) * 31 + {e}) % {P}"
    return acc


# --- SQL twins (DuckDB oracle side) ---------------------------------------

SQL_CHAR_POLY_HASH = (
    "list_reduce(list_prepend(0::BIGINT, "
    "list_transform(string_split({s}, ''), c -> ascii(c)::BIGINT)), "
    "(a, b) -> (a * 31 + b) % 1000000007)"
)


def sql_char_poly_hash(s_expr: str) -> str:
    return SQL_CHAR_POLY_HASH.format(s=s_expr)


def sql_cube_mix(h_expr: str) -> str:
    """DuckDB twin of :func:`_cube_mix` (g = h^3 mod P)."""
    return f"((({h_expr} * {h_expr}) % {P}) * {h_expr}) % {P}"


def sql_minhash(i: int, g_expr: str) -> str:
    """DuckDB twin of one minhash permutation over a PREMIXED hash
    ``g_expr`` (= ``sql_cube_mix(h)``). The premix is the caller's job so
    it is evaluated once per token row and shared by all 16 permutations —
    mirroring the Spark side, where ``minhash_signature`` computes
    ``mixed`` once — instead of being re-inlined into every min()."""
    return f"min((({g_expr}) * {MINHASH_A[i]} + {MINHASH_B[i]}) % {P})"
