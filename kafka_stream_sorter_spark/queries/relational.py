"""Relational breadth — SURVEY.md §2.C rows filter/join/agg/window/setops/scalar.

These operators are absent from the reference (verified §2.B: no filter,
join, aggregation, window, set op, or scalar library anywhere in its
tree) — they are the capability gap a Spark-native engine fills for free
via Catalyst. Plans are declared with the DataFrame API; physical strategy
(broadcast vs sort-merge join, partial aggregation, TakeOrderedAndProject)
is left to the optimizer, with explicit hints only where we know better
(``F.broadcast`` on dimension tables).

Cross-engine determinism conventions (vs the DuckDB oracle):
* arithmetic double results → ``round(_, N)`` identically on both sides;
  raw stored doubles pass through unrounded (identical bits).
* computed integers → BIGINT on both sides (DuckDB row_number/year/sum
  are BIGINT-or-wider; Spark row_number/year are INT — we cast up, and
  CAST(... AS BIGINT) in the SQL where DuckDB would produce HUGEINT).
* timestamps → emitted as ``strftime``-formatted strings or extracted ints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_stream_sorter_spark.functions.numeric import (
    MONEY_MICROS_SQL,
    epoch_us,
    money_micros,
    ts_lit as _ts,
)
from kafka_stream_sorter_spark.registry import query
from kafka_stream_sorter_spark.sources.parquet import load_table




# ---------------------------------------------------------------------------
# Filter / project
# ---------------------------------------------------------------------------


@query(
    "filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_quantity < 24
    """,
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection, both pushed into the parquet scan by
    Catalyst (PushedFilters/ReadSchema in .explain) — at 100 TB this reads
    only the 5 projected columns and skips row groups by min/max stats."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
        & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "join_broadcast",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ small dim with an explicit broadcast hint: zero shuffle of
    the fact side — the strategy that matters most at 1000 executors."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    return orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey
    ).select("o_orderkey", "o_totalprice", "c_name", "c_mktsegment")


@query(
    "join_sortmerge",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, o_orderstatus, o_orderpriority
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_totalprice > 150000
    """,
)
def join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large ⋈ large on the natural key → shuffle on l_orderkey/o_orderkey
    (sort-merge or AQE-elected shuffled-hash). The o_totalprice filter is
    pushed below the join into the orders scan."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey", "l_linenumber", "l_quantity", "o_orderstatus", "o_orderpriority"
    )


@query(
    "join_multiway",
    oracle="""
    SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(c_acctbal), 2) AS total_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema snowflake: two broadcast dims chained, then aggregate.
    Catalyst collapses both joins into the customer scan stage."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS → left_semi: probe side streams, no row multiplication."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left_anti (customers with no orders in 2001+)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts("2001-01-01")
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@query(
    "agg_tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           CAST(sum({MONEY_MICROS_SQL("l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS sum_disc_price_micros,
           CAST(sum({MONEY_MICROS_SQL("l_extendedprice * (1 - l_discount) * (1 + l_tax)")}) AS BIGINT) AS sum_charge_micros,
           round(avg(l_quantity), 4)                                    AS avg_qty,
           round(avg(l_extendedprice), 4)                               AS avg_price,
           round(avg(l_discount), 4)                                    AS avg_disc,
           CAST(count(*) AS BIGINT)                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: hash aggregate with map-side partial aggregation —
    the shuffle carries only (2-key × 8-agg) partial states, not rows."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= _ts("2001-09-02")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        # money products → exact integer micros per row, then exact int sum
        # (cross-engine round() is unsafe at half-boundaries — functions/numeric.py)
        F.sum(money_micros(disc_price)).alias("sum_disc_price_micros"),
        F.sum(money_micros(disc_price * (1 + F.col("l_tax")))).alias("sum_charge_micros"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
           CAST(count(*) AS BIGINT)                  AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-distinct aggregate → Spark expands to a partial-dedup plan;
    exact (approx_count_distinct is the 100 TB-budget variant)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(count(*) AS BIGINT)  AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice), 2) AS sum_price,
           CAST(count(*) AS BIGINT)       AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT l_returnflag,
           min(l_quantity)                              AS min_qty,
           max(l_quantity)                              AS max_qty,
           round(stddev_samp(l_quantity), 4)            AS std_qty,
           round(quantile_cont(l_quantity, 0.5), 4)     AS median_qty,
           round(avg(l_extendedprice), 4)               AS avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates incl. exact interpolated median
    (Spark `percentile` == DuckDB `quantile_cont`, both linear)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.round(F.stddev_samp("l_quantity"), 4).alias("std_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("median_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
    )


@query(
    "agg_pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (never inferred — inference is a
    full extra scan at 100 TB)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnRenamed("O", "qty_o")
        .withColumnRenamed("F", "qty_f")
    )


@query(
    "tpch_q6",
    oracle=f"""
    SELECT CAST(sum({MONEY_MICROS_SQL("l_extendedprice * l_discount")}) AS BIGINT) AS revenue_micros
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.08
      AND l_quantity < 25
    """,
)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan+filter+global agg — the all-pushdown query."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.08)
            & (F.col("l_quantity") < 25)
        )
        .agg(
            F.sum(money_micros(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue_micros"
            )
        )
    )


@query(
    "tpch_q3_topk",
    oracle=f"""
    SELECT o_orderkey,
           CAST(sum({MONEY_MICROS_SQL("l_extendedprice * (1 - l_discount)")}) AS BIGINT) AS revenue_micros,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue_micros DESC, o_orderkey
    LIMIT 10
    """,
)
def tpch_q3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join → agg → top-k on the aggregate. Revenue is
    summed as exact integer micros so the ORDER BY k-boundary is
    engine-independent (functions/numeric.py)."""
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _ts("1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > _ts("1998-01-01"))
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.sum(money_micros(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_micros"
            )
        )
        .select(
            "o_orderkey",
            "revenue_micros",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue_micros").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------


@query(
    "window_rank",
    oracle="""
    SELECT user_id, event_id, value, rn FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY value DESC, event_id) AS rn
        FROM events
    ) WHERE rn <= 3
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: one shuffle on the partition key, per-partition
    sort — never a global sort. The filter on rn is pushed into the window
    via Spark's WindowGroupLimit (rank pushdown) so only k rows per group
    survive the sort buffer."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id").asc())
    return (
        events.select(
            "user_id", "event_id", "value", F.row_number().over(w).cast("long").alias("rn")
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_analytic",
    oracle="""
    SELECT user_id, event_id, value,
           round(value - lag(value) OVER w, 4)  AS delta_prev,
           lead(event_id) OVER w                AS next_event_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
           CAST(rank() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS value_rank
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/running-sum/rank over one window spec: Spark evaluates all
    four in a single WindowExec pass after one shuffle on user_id."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    wrank = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id").asc())
    return events.select(
        "user_id",
        "event_id",
        "value",
        F.round(F.col("value") - F.lag("value").over(w), 4).alias("delta_prev"),
        F.lead("event_id").over(w).alias("next_event_id"),
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2
        ).alias("running_value"),
        F.rank().over(wrank).cast("long").alias("value_rank"),
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return customer.union(supplier).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return customer.intersect(supplier)


@query(
    "set_except",
    oracle="""
    SELECT p_size AS key FROM part
    EXCEPT
    SELECT n_nationkey FROM nation
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part sizes (1..50) minus nation keys (0..24) — non-empty at every sf."""
    part = load_table(spark, sf_dir, "part").select(F.col("p_size").alias("key"))
    nation = load_table(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("key"))
    # subtract == EXCEPT DISTINCT (exceptAll is multiset difference — a key
    # on both sides would survive whenever its left count exceeds its right)
    return part.subtract(nation)


# ---------------------------------------------------------------------------
# Scalar function library — ≙ the reference's only scalar code, the two key
# extractors (external_sort.go:368-425), generalized to a real library.
# ---------------------------------------------------------------------------


@query(
    "scalar_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                       AS name_upper,
           substr(c_name, 1, 9)                AS name_prefix,
           CAST(length(c_name) AS BIGINT)      AS name_len,
           concat(c_mktsegment, '#', c_name)   AS tagged,
           replace(c_name, 'Customer', 'C')    AS short_name,
           CAST(strpos(c_name, '#') AS BIGINT) AS hash_pos
    FROM customer
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 9).alias("name_prefix"),
        F.length("c_name").cast("long").alias("name_len"),
        F.concat(F.col("c_mktsegment"), F.lit("#"), F.col("c_name")).alias("tagged"),
        F.regexp_replace("c_name", "Customer", "C").alias("short_name"),
        F.instr(F.col("c_name"), "#").cast("long").alias("hash_pos"),
    )


@query(
    "scalar_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)    AS yr,
           CAST(month(o_orderdate) AS BIGINT)   AS mo,
           CAST(dayofmonth(o_orderdate) AS BIGINT) AS dom,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')    AS plus_30d
    FROM orders
    """,
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dom"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias(
            "plus_30d"
        ),
    )


@query(
    "scalar_math",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {MONEY_MICROS_SQL("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS charge_micros,
           CAST(ceil(l_quantity / 7.0) AS BIGINT)  AS qty_bucket,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_kband,
           abs(l_discount - 0.05)                  AS disc_dev,
           round(ln(l_extendedprice + 1), 6)       AS log_price,
           round(sqrt(l_quantity), 6)              AS sqrt_qty,
           CAST(l_orderkey % 97 AS BIGINT)         AS pm
    FROM lineitem
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        money_micros(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
        ).alias("charge_micros"),
        F.ceil(F.col("l_quantity") / 7.0).cast("long").alias("qty_bucket"),
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("price_kband"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("log_price"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        (F.col("l_orderkey") % 97).cast("long").alias("pm"),
    )


@query(
    "scalar_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
    FROM events
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events payload column — the
    semi-structured half of the scalar library (get_json_object stays
    JVM-side; no Python in the loop)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.select("event_id", k.alias("k_val"), (k % 10).alias("k_mod"))


@query(
    "join_asof",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN event_type = 'purchase' THEN event_id END AS p_id
      FROM events WHERE event_type IN ('click', 'purchase')
    ),
    m AS (
      SELECT user_id, ts, event_id, event_type,
             last_value(p_id IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_purchase_id
      FROM u
    )
    SELECT event_id, user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
           prev_purchase_id
    FROM m WHERE event_type = 'click'
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (an operator Spark lacks built-in): every click
    gets the most recent strictly-earlier purchase of the same user —
    operators/asof.py:asof_join_backward (union + partitioned window; one
    shuffle, no per-row probe). The event time is emitted as epoch micros
    (registry determinism rule: never a raw timestamp across engines)."""
    from kafka_stream_sorter_spark.operators.asof import asof_join_backward

    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join_backward(
        clicks,
        purchases,
        by=["user_id"],
        ts="ts",
        tiebreak="event_id",
        payload="event_id",
        payload_alias="prev_purchase_id",
    )
    return joined.select(
        "event_id",
        "user_id",
        epoch_us("ts").alias("ts_us"),
        "prev_purchase_id",
    )


@query(
    "agg_quantiles",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.5),  6) AS p50,
           round(quantile_cont(value, 0.75), 6) AS p75,
           round(quantile_cont(value, 0.95), 6) AS p95,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def agg_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-percentile per group (Spark `percentile` ≡ DuckDB
    `quantile_cont`, both linear interpolation). At 100 TB the drop-in
    budget variant is approx_percentile with a bounded error — the exact
    form is the oracle-checkable baseline."""
    e = load_table(spark, sf_dir, "events")
    pcts = F.percentile("value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.95)))
    return e.groupBy("event_type").agg(
        pcts.alias("_p"), F.count(F.lit(1)).alias("n")
    ).select(
        "event_type",
        F.round(F.col("_p")[0], 6).alias("p25"),
        F.round(F.col("_p")[1], 6).alias("p50"),
        F.round(F.col("_p")[2], 6).alias("p75"),
        F.round(F.col("_p")[3], 6).alias("p95"),
        "n",
    )


@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(least(greatest(floor((l_extendedprice - 900.0) / 5210.0), 0), 19) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-bound 20-bin histogram of l_extendedprice (bounds are plan
    literals — inferring them would cost an extra full scan at 100 TB;
    out-of-range values clamp into the edge bins). Bin arithmetic is pure
    integer-producing double math, identical in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    bin_col = F.least(
        F.greatest(F.floor((F.col("l_extendedprice") - 900.0) / 5210.0), F.lit(0)),
        F.lit(19),
    ).cast("long")
    return li.groupBy(bin_col.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@query(
    "agg_salted_skew",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum({MONEY_MICROS_SQL("value")}) AS BIGINT) AS sum_value_micros
    FROM events GROUP BY event_type
    """,
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter aggregation via two-stage salting (event_type has 5
    values — every key is hot at cluster scale): stage 1 groups on
    (key, hash(event_id) % 16) so each key spreads over 16 reducers,
    stage 2 folds the ≤16 partials per key — operators/skew.py. Exact
    integer micros make both stages' sums order-independent; the oracle
    is the plain one-stage GROUP BY."""
    from kafka_stream_sorter_spark.operators.skew import salted_agg

    e = load_table(spark, sf_dir, "events")
    return salted_agg(
        e,
        keys=["event_type"],
        salt_on="event_id",
        sums={"sum_value_micros": money_micros(F.col("value"))},
        buckets=16,
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(count(DISTINCT event_id) AS BIGINT) AS exact_events,
           TRUE AS users_within_tol,
           TRUE AS events_within_tol
    FROM events
    GROUP BY event_type
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts — the 100 TB budget variant of
    agg_distinct (fixed-size sketch per key vs a full dedup shuffle). HLL
    estimates are engine-specific, so the driver-checkable contract is the
    estimate's *accuracy bound*, not its raw value: emit the exact counts
    plus a within-10%-of-exact boolean per sketch (2% configured rsd → 10%
    is a 5σ margin), and the oracle asserts the booleans are TRUE against
    DuckDB's own exact distincts. tests/test_approx.py additionally bounds
    the raw estimate at the 2% rsd."""
    e = load_table(spark, sf_dir, "events").select("event_type", "user_id", "event_id")
    # Two countDistincts + two HLL sketches in ONE agg would plan as a
    # 3-way Expand (every row tripled before the shuffle) — measured 6×
    # slower at sf0.1 than this split form: each exact distinct is its own
    # partial-deduped (key, value) distinct + count, the sketches ride a
    # plain single-pass agg, and the three 5-row results broadcast-join
    # back together. Same three shuffles of deduped pairs at 100 TB, no
    # row multiplication.
    eu = (
        e.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("exact_users"))
    )
    ee = (
        e.select("event_type", "event_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("exact_events"))
    )
    ap = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("au"),
        F.approx_count_distinct("event_id", 0.02).alias("ae"),
    )
    agged = ap.join(eu, "event_type").join(ee, "event_type")
    within = lambda a, x: F.abs(F.col(a) - F.col(x)) <= 0.10 * F.col(x)  # noqa: E731
    return agged.select(
        "event_type",
        "exact_users",
        "exact_events",
        within("au", "exact_users").alias("users_within_tol"),
        within("ae", "exact_events").alias("events_within_tol"),
    )


@query(
    "window_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 14400000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, ts, event_id,
             CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end
    FROM sess GROUP BY user_id, session_id
    """,
)
def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a new session starts after a >4 h gap in a
    user's event stream (gap-flag via lag, session id via running sum —
    one shuffle on user_id, both windows share the same spec so Spark
    evaluates them in a single WindowExec pass). The streaming twin is
    stream_session_window (F.session_window); this is the replayable batch
    semantics. Gap comparison is on integer epoch micros — exact in both
    engines."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap_us = epoch_us("ts") - epoch_us(F.lag("ts").over(w))
    flagged = events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(gap_us.isNull() | (gap_us > 14_400_000_000), 1).otherwise(0).alias("new_sess"),
    )
    return (
        flagged.withColumn(
            "session_id",
            F.sum("new_sess")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("long"),
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_start"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("session_end"),
        )
    )


@query(
    "join_interval_bucketed",
    oracle="""
    SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id,
           CAST(epoch_us(c.ts) - epoch_us(v.ts) AS BIGINT) AS lag_us
    FROM events v JOIN events c
      ON v.user_id = c.user_id
     AND v.event_type = 'view' AND c.event_type = 'click'
     AND c.ts > v.ts AND c.ts <= v.ts + INTERVAL 2 HOUR
    """,
)
def join_interval_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-style range join: every click within 2 h after a view by
    the same user. Plain non-equi time predicates degrade to nested-loop
    plans; operators/interval_join.py quantizes time into join-width
    buckets so this runs as a hash equi-join on (user_id, bucket) — the
    strategy that survives 100 TB."""
    from kafka_stream_sorter_spark.operators.interval_join import interval_join_after

    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    joined = interval_join_after(
        views, clicks, keys=["user_id"], left_ts="view_ts", right_ts="click_ts",
        width_seconds=7200,
    )
    return joined.select(
        "view_id",
        "click_id",
        "user_id",
        (epoch_us("click_ts") - epoch_us("view_ts")).alias("lag_us"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS — the general form under rollup/cube (one shuffle; the
    Expand operator replicates rows per set, partial aggregation applies)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gsets")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(count(*) AS BIGINT) AS n_rows,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem_gsets
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@query(
    "scalar_array_struct",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(event_id)), ',')                  AS event_ids,
           array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types_seen,
           CAST(len(list(event_id)) AS BIGINT)              AS n,
           list_sort(list(event_id))[1]                     AS first_event,
           list_sort(list(event_id))[-1]                    AS last_event
    FROM events
    GROUP BY user_id
    """,
)
def scalar_array_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type surface: per-user event arrays via collect_list (sorted
    for determinism — collect order is partition-dependent), distinct type
    sets, and element access. One shuffle; arrays stay JVM-side until the
    final comparison projection, which serializes them to a canonical
    comma-joined string — engines render raw array values differently
    (Python lists vs DuckDB's numpy arrays), so the contract column is the
    canonical text, not the representation. The 100 TB caveat is the
    per-group array size — bound it upstream (here groups are user-sized)
    or switch to windowed slices."""
    e = load_table(spark, sf_dir, "events")
    ids = F.sort_array(F.collect_list("event_id"))
    return e.groupBy("user_id").agg(
        F.concat_ws(",", ids.cast("array<string>")).alias("event_ids"),
        F.concat_ws(
            ",", F.array_sort(F.array_distinct(F.collect_list("event_type")))
        ).alias("types_seen"),
        F.count(F.lit(1)).alias("n"),
        ids.getItem(0).alias("first_event"),
        F.element_at(ids, -1).alias("last_event"),
    )


@query(
    "udf_scalar_pandas",
    oracle="""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_py,
           CAST(length(text) - length(regexp_replace(text, '[aeiouAEIOU]', '', 'g')) AS BIGINT)
             AS n_vowels,
           CAST(CASE WHEN length(text) > 0
                     THEN (length(text) - length(regexp_replace(text, '[aeiouAEIOU]', '', 'g')))
                          * 1000000 // length(text)
                     ELSE 0 END AS BIGINT) AS vowel_ratio_micro
    FROM documents
    """,
)
def udf_scalar_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDF extension surface, done the fast way: an Arrow-batched
    scalar pandas_udf (vectorized pandas str ops per batch) — never a
    row-at-a-time Python UDF. Exists to pin the extension-point plumbing;
    anything expressible in built-ins (like this) should stay JVM-side."""
    import pandas
    from pyspark.sql.functions import pandas_udf

    # NB: annotations must be real types, not strings — this module has
    # `from __future__ import annotations`, and pyspark resolves UDF type
    # hints via get_type_hints in the function's globals, where a
    # function-local `pd` alias would not exist.
    def _text_stats(s: "pandas.Series") -> "pandas.DataFrame":
        n_chars = s.str.len().astype("int64")
        n_vowels = s.str.count(r"[aeiouAEIOU]").astype("int64")
        ratio = (n_vowels * 1_000_000).floordiv(n_chars.where(n_chars > 0, 1))
        ratio = ratio.where(n_chars > 0, 0)
        return pandas.DataFrame(
            {"n_chars_py": n_chars, "n_vowels": n_vowels, "vowel_ratio_micro": ratio}
        )

    _text_stats.__annotations__ = {"s": pandas.Series, "return": pandas.DataFrame}
    text_stats = pandas_udf(_text_stats, "n_chars_py long, n_vowels long, vowel_ratio_micro long")

    docs = load_table(spark, sf_dir, "documents")
    stats = text_stats(F.col("text")).alias("s")
    return docs.select("doc_id", stats).select(
        "doc_id", "s.n_chars_py", "s.n_vowels", "s.vowel_ratio_micro"
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) big
      ON c_custkey = big.o_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer against a filtered fact: unmatched customers survive with
    null order columns. The filter cannot be pushed below the outer join's
    null-producing side without changing results — Catalyst keeps it inside,
    which is the correct plan, and the probe side still streams."""
    customer = load_table(spark, sf_dir, "customer")
    big = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return customer.join(big, customer.c_custkey == big.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT cn.nationkey AS c_side, sn.nationkey AS s_side,
           cn.n_cust, sn.n_supp
    FROM (SELECT c_nationkey AS nationkey, CAST(count(*) AS BIGINT) AS n_cust
          FROM customer GROUP BY 1) cn
    FULL OUTER JOIN
         (SELECT s_nationkey AS nationkey, CAST(count(*) AS BIGINT) AS n_supp
          FROM supplier GROUP BY 1) sn
      ON cn.nationkey = sn.nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer over two aggregates: nations with customers but no
    suppliers (and vice versa) survive one-sided. Full outer cannot
    broadcast either side — it shuffles both, which AQE may still
    skew-split; correctness of null rows is the point here."""
    cn = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cn.alias("cn")
        .join(sn.alias("sn"), F.col("cn.nationkey") == F.col("sn.nationkey"), "full_outer")
        .select(
            F.col("cn.nationkey").alias("c_side"),
            F.col("sn.nationkey").alias("s_side"),
            "n_cust",
            "n_supp",
        )
    )


@query(
    "join_null_safe",
    oracle="""
    WITH e AS (
      SELECT event_id,
             CASE WHEN value < 5 THEN NULL ELSE event_type END AS grp
      FROM events
    ),
    d AS (SELECT DISTINCT grp FROM e)
    SELECT d.grp AS grp, CAST(count(*) AS BIGINT) AS n_events
    FROM e JOIN d ON e.grp IS NOT DISTINCT FROM d.grp
    GROUP BY d.grp
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` ≡ IS NOT DISTINCT FROM): null keys
    match each other instead of vanishing — the semantics a plain equi-join
    silently drops. Spark plans `<=>` as a hashable equi-condition, so this
    stays a hash join, not a nested loop."""
    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("value") < 5, None).otherwise(F.col("event_type")).alias("grp"),
    )
    d = e.select("grp").distinct().select(F.col("grp").alias("d_grp"))
    return (
        e.join(d, e.grp.eqNullSafe(d.d_grp))
        .groupBy("d_grp")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("d_grp").alias("grp"), "n_events")
    )


@query(
    "topk_paged",
    oracle="""
    SELECT event_id, user_id, value
    FROM events ORDER BY value DESC, event_id LIMIT 50 OFFSET 100
    """,
)
def topk_paged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: deterministic ORDER BY + LIMIT/OFFSET. Spark evaluates
    offset+limit as a single top-(150) then drops the first 100 — still
    TakeOrdered-style, never a full global sort."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return (
        e.orderBy(F.col("value").desc(), F.col("event_id").asc()).offset(100).limit(50)
    )


@query(
    "window_range_frame",
    oracle=f"""
    SELECT user_id, event_id,
           CAST(count(*) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_last_24h,
           CAST(sum({MONEY_MICROS_SQL("value")}) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS sum_last_24h_micros
    FROM events
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) window frame: per-user trailing-24 h count and
    sum — a frame ROWS cannot express when events are irregularly spaced.
    Ordering on integer epoch micros keeps the frame bound arithmetic
    exact and identical in both engines; ties (same timestamp) share the
    frame, which RANGE defines away as a determinism hazard."""
    e = load_table(spark, sf_dir, "events")
    ts_us = epoch_us("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_us)
        .rangeBetween(-86_400_000_000, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_last_24h"),
        F.sum(money_micros(F.col("value"))).over(w).alias("sum_last_24h_micros"),
    )


@query(
    "window_distribution",
    oracle="""
    SELECT event_id, user_id,
           CAST(ntile(4) OVER w AS BIGINT)  AS quartile,
           round(percent_rank() OVER w, 8)  AS pct_rank,
           round(cume_dist() OVER w, 8)     AS cum_dist
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
    """,
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile / percent_rank / cume_dist)
    per user. The (value, event_id) ordering is total, so rank-derived
    ratios are exact k/(n-1)-style rationals — identical IEEE doubles in
    both engines, rounded only as belt-and-braces."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").asc(), F.col("event_id").asc())
    return e.select(
        "event_id",
        "user_id",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 8).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 8).alias("cum_dist"),
    )


# One SQL text, two engines: the Spark side runs it via spark.sql over
# registered views — the SQL-API entry point a reference user would reach
# for first — and the oracle runs the identical string in DuckDB. Dialect
# kept to the shared ANSI core (CTE, join, window, floor/cast money micros).
_SQL_INTERFACE = f"""
    WITH rev AS (
      SELECT c_mktsegment, c_custkey, c_name,
             CAST(sum({MONEY_MICROS_SQL("o_totalprice")}) AS BIGINT)
               AS rev_micros
      FROM customer JOIN orders ON o_custkey = c_custkey
      GROUP BY c_mktsegment, c_custkey, c_name
    ),
    ranked AS (
      SELECT c_mktsegment, c_custkey, c_name, rev_micros,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY rev_micros DESC, c_custkey) AS rnk
      FROM rev
    )
    SELECT c_mktsegment, c_custkey, c_name, rev_micros, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 3
"""


@query("sql_interface", oracle=_SQL_INTERFACE)
def sql_interface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-text API: top-3 customers by revenue per market segment,
    submitted as a raw SQL string over registered fixture views
    (sources/parquet.py:register_views) and planned by Catalyst exactly
    like the DataFrame builders — one shuffle per agg/window, WindowGroupLimit
    for the rank filter. The oracle is the SAME string run by DuckDB,
    pinning engine-agnostic ANSI semantics end to end."""
    from kafka_stream_sorter_spark.sources.parquet import register_views

    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_SQL_INTERFACE)


@query(
    "unpivot_melt",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, value
    FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
          FROM lineitem)
    UNPIVOT INCLUDE NULLS (value FOR measure IN (l_quantity, l_extendedprice, l_discount))
    """,
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt — the inverse of agg_pivot: three measure columns fold
    into (measure, value) rows. A pure Expand map stage (row triplication
    without shuffle); values pass through as raw stored doubles, so both
    engines emit identical bits. INCLUDE NULLS pins the one semantic the
    engines default differently on: Spark's unpivot keeps NULL-valued
    measure rows, DuckDB's drops them — inert on today's non-null TPC-H
    measures, a hash mismatch the day a fixture carries a NULL."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount"],
        "measure",
        "value",
    )


@query(
    "udtf_tokenize",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             list_slice(regexp_split_to_array(lower(trim(text)), '\\s+'), 1, 5) AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(unnest(range(len(toks))) AS BIGINT) AS token_idx,
           unnest(toks) AS token
    FROM t
    """,
)
def udtf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (Spark 4): a table function emitting the first
    five (token_idx, token) rows per document through a LATERAL join —
    the row-expanding extension point (UDF/UDAF/UDTF all now covered:
    udf_scalar_pandas / udf_grouped_regression / this). Row-at-a-time
    Python is the slow path by design; the JVM twin of this exact shape is
    text_chunk_windows' posexplode. Oracle: generate_series lateral over
    the same tokenization."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token_idx: long, token: string")
    class FirstTokens:
        def eval(self, text: str):
            import re

            # Pinned to the engines' exact semantics, not Python's:
            # - strip(' ') — SQL trim() removes only spaces; Python's bare
            #   strip() also eats tabs/newlines and would swallow the
            #   leading empty token the oracle emits for '\\thello'.
            # - the explicit ASCII class (operators/text.py:WS_CLASS), not
            #   \\s — Python's \\s is unicode-aware, Java's includes \\x0B,
            #   RE2's doesn't; str.split() would additionally yield [] on
            #   empty text where regexp_split_to_array yields [''].
            for i, tok in enumerate(
                re.split("[ \t\n\x0b\f\r]+", text.strip(" ").lower())[:5]
            ):
                yield i, tok

    spark.udtf.register("first_tokens", FirstTokens)
    load_table(spark, sf_dir, "documents", rebalance=True).createOrReplaceTempView(
        "__docs_udtf"
    )
    return spark.sql(
        "SELECT doc_id, t.token_idx, t.token "
        "FROM __docs_udtf, LATERAL first_tokens(text) t"
    )


@query(
    "agg_time_bucket",
    oracle=f"""
    SELECT CAST(epoch_us(ts) - epoch_us(ts) % 21600000000 AS BIGINT) AS bucket_us,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum({MONEY_MICROS_SQL("value")}) AS BIGINT) AS sum_value_micros
    FROM events
    GROUP BY bucket_us, event_type
    """,
)
def agg_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: arbitrary-width time
    buckets (6 h here) from integer epoch arithmetic — the batch twin of
    stream_window_tumbling for widths date_trunc can't express. One
    partial-aggregated shuffle on (bucket, type); at 100 TB this is the
    query a downsampling materialization job runs per chunk, and bucket
    arithmetic on epoch micros is engine-portable (no calendar logic)."""
    width_us = 21_600_000_000  # 6 h
    e = load_table(spark, sf_dir, "events")
    bucket = (epoch_us("ts") - epoch_us("ts") % width_us).alias("bucket_us")
    return e.groupBy(bucket, "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(money_micros(F.col("value"))).alias("sum_value_micros"),
    )


@query(
    "join_fuzzy_levenshtein",
    oracle="""
    SELECT a.s_suppkey AS supp_a, b.s_suppkey AS supp_b,
           CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS edit_dist
    FROM supplier a JOIN supplier b
      ON a.s_nationkey = b.s_nationkey
     AND a.s_suppkey < b.s_suppkey
     AND abs(len(a.s_name) - len(b.s_name)) <= 1
    WHERE levenshtein(a.s_name, b.s_name) <= 1
    """,
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy self-join: supplier-name pairs within edit distance 1,
    equi-blocked on nationkey with a length pre-filter (|len(a)−len(b)| ≤ d
    is necessary for distance ≤ d, and it prunes before the O(len²) DP
    runs). The blocked equi-join is the 100 TB shape — never an unblocked
    theta-join; at scale the block key would be a char-ngram signature
    (cf. operators/dedup.py prefix filtering) rather than a dimension
    column. Both engines implement classic Levenshtein, so the distance and
    the ≤1 frontier are engine-portable."""
    s = load_table(spark, sf_dir, "supplier")
    a = s.select(
        F.col("s_suppkey").alias("supp_a"),
        F.col("s_name").alias("name_a"),
        F.col("s_nationkey").alias("nk_a"),
    )
    b = s.select(
        F.col("s_suppkey").alias("supp_b"),
        F.col("s_name").alias("name_b"),
        F.col("s_nationkey").alias("nk_b"),
    )
    return (
        a.join(
            b,
            (F.col("nk_a") == F.col("nk_b"))
            & (F.col("supp_a") < F.col("supp_b"))
            & (F.abs(F.length("name_a") - F.length("name_b")) <= 1),
        )
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("edit_dist") <= 1)
        .select("supp_a", "supp_b", "edit_dist")
    )


@query(
    "agg_quantiles_approx",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS exact_p25,
           round(quantile_cont(value, 0.5),  6) AS exact_p50,
           round(quantile_cont(value, 0.95), 6) AS exact_p95,
           TRUE AS p25_within_tol,
           TRUE AS p50_within_tol,
           TRUE AS p95_within_tol
    FROM events GROUP BY event_type
    """,
)
def agg_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles — the 100 TB budget twin of agg_quantiles,
    completing the sketch family (HLL distincts ≙ agg_approx_distinct,
    quantile summaries here). approx_percentile keeps a bounded
    Greenwald-Khanna summary per group (accuracy 1/ε = 10000 → 0.01% rank
    error) instead of shuffling full value lists. Like the HLL query, the
    sketch value itself is engine-specific, so the driver-checkable
    contract is the accuracy bound: emit exact percentiles plus a
    within-5%-of-exact boolean per estimate; the oracle asserts the
    booleans against DuckDB's exact quantile_cont. A 0.01% rank error on
    the fixtures' smooth value distribution is orders of magnitude inside
    the 5% value tolerance."""
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    exact = F.percentile("value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.95)))
    approx = F.percentile_approx(
        "value", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.95)), F.lit(10_000)
    )
    agged = e.groupBy("event_type").agg(exact.alias("_ex"), approx.alias("_ap"))
    within = lambda i: (  # noqa: E731
        F.abs(F.col("_ap")[i] - F.col("_ex")[i]) <= 0.05 * F.abs(F.col("_ex")[i])
    )
    return agged.select(
        "event_type",
        F.round(F.col("_ex")[0], 6).alias("exact_p25"),
        F.round(F.col("_ex")[1], 6).alias("exact_p50"),
        F.round(F.col("_ex")[2], 6).alias("exact_p95"),
        within(0).alias("p25_within_tol"),
        within(1).alias("p50_within_tol"),
        within(2).alias("p95_within_tol"),
    )


@query(
    "join_interval_overlap",
    oracle="""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
           CAST(epoch_us(least(v.ts + INTERVAL 45 MINUTE, p.ts + INTERVAL 45 MINUTE))
                - epoch_us(greatest(v.ts, p.ts)) AS BIGINT) AS overlap_us
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND v.ts <= p.ts + INTERVAL 45 MINUTE
     AND p.ts <= v.ts + INTERVAL 45 MINUTE
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval OVERLAP join — two-sided sibling of join_interval_bucketed:
    each view and purchase carries a 45-minute activity interval; pairs of
    the same user whose intervals intersect are joined, with the overlap
    duration emitted. operators/interval_join.py:interval_overlap_join runs
    it as a grid-cell equi-join with reference-point dedup (each pair
    evaluated exactly once, no distinct pass) — the 1-D distributed
    spatial-join shape that survives 100 TB."""
    from kafka_stream_sorter_spark.operators.interval_join import interval_overlap_join

    events = load_table(spark, sf_dir, "events")
    width = F.expr("INTERVAL 45 MINUTES")
    views = events.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_start"),
        (F.col("ts") + width).alias("v_end"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_start"),
        (F.col("ts") + width).alias("p_end"),
    )
    joined = interval_overlap_join(
        views, purchases, keys=["user_id"],
        left_start="v_start", left_end="v_end",
        right_start="p_start", right_end="p_end",
        bucket_seconds=3600,
    )
    return joined.select(
        "view_id",
        "purchase_id",
        "user_id",
        (
            F.least(epoch_us("v_end"), epoch_us("p_end"))
            - F.greatest(epoch_us("v_start"), epoch_us("p_start"))
        ).alias("overlap_us"),
    )
