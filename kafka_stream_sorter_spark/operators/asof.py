"""As-of join — an operator Spark lacks built-in, composed from existing
DataFrame ops (union + partitioned window), per the custom-operator ladder:
composition first, Pandas UDF only if semantics demand it (they don't here).

Semantics: for every left row, attach the payload of the most recent right
row with the same key and a strictly earlier (ts, tiebreak) position —
"backward" as-of with a deterministic total order, so results are
oracle-exact even when timestamps tie.

Scale: one shuffle on the join key, then a per-partition ordered scan (the
window). No per-row probe, no range explosion; this is the sort-merge
formulation every large-scale as-of implementation reduces to. Compare a
naive theta-join (`l.ts >= r.ts`) which Spark would plan as a broadcast
nested loop — quadratic per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    ts: str,
    tiebreak: str,
    payload: str,
    payload_alias: str | None = None,
) -> DataFrame:
    """Backward as-of join. Both inputs must share the ``by`` + ``ts`` +
    ``tiebreak`` columns; ``(ts, tiebreak)`` must be unique across the union
    (e.g. a globally unique event id). Returns all left rows with
    ``payload_alias`` (the as-of matched right payload, null when no earlier
    right row exists)."""
    out_name = payload_alias or f"asof_{payload}"
    left_cols = [c for c in left.columns]
    probe = left.select(*left_cols).withColumn("_asof_payload", F.lit(None).cast(
        dict(right.dtypes)[payload]
    ))
    build = right.select(
        *by,
        ts,
        tiebreak,
        F.col(payload).alias("_asof_payload"),
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left_cols
            if c not in {*by, ts, tiebreak}
        ],
    ).select(*probe.columns)
    tagged = probe.withColumn("_is_probe", F.lit(True)).unionByName(
        build.withColumn("_is_probe", F.lit(False))
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(ts).asc(), F.col(tiebreak).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    matched: Column = F.last(
        F.when(~F.col("_is_probe"), F.col("_asof_payload")), ignorenulls=True
    ).over(w)
    return (
        tagged.withColumn(out_name, matched)
        .filter(F.col("_is_probe"))
        .select(*left_cols, out_name)
    )
