"""CSV/JSONL source round-trip: exact losslessness at row level (the
registered queries check aggregates; these check the raw frames)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_stream_sorter_spark.sources import files
from kafka_stream_sorter_spark.sources.parquet import load_table


def _roundtrip_exact(spark, sf_dir, tmp_path, fmt):
    orig = load_table(spark, sf_dir, "events")
    path = str(tmp_path / fmt)
    if fmt == "csv":
        files.write_table_csv(orig, path)
        back = files.read_table_csv(spark, path, "events")
    else:
        files.write_table_jsonl(orig, path)
        back = files.read_table_jsonl(spark, path, "events")
    assert [f.dataType.simpleString() for f in back.schema.fields] == [
        f.dataType.simpleString() for f in orig.schema.fields
    ]
    # exact multiset equality both directions
    assert orig.exceptAll(back).count() == 0
    assert back.exceptAll(orig).count() == 0


def test_csv_roundtrip_exact(spark, sf_dir, tmp_path):
    _roundtrip_exact(spark, sf_dir, tmp_path, "csv")


def test_jsonl_roundtrip_exact(spark, sf_dir, tmp_path):
    _roundtrip_exact(spark, sf_dir, tmp_path, "jsonl")


def test_csv_handles_embedded_delimiters(spark, tmp_path):
    """Strings containing commas, quotes, and newlines must survive CSV."""
    rows = [
        (1, 'a,b', ), (2, 'say "hi"', ), (3, 'line1\nline2', ), (4, '', ),
    ]
    df = spark.createDataFrame(rows, ["id", "s"])
    path = str(tmp_path / "tricky")
    files.write_table_csv(df, path)
    # read back with the same options but an ad-hoc schema
    back = (
        spark.read.schema("id long, s string")
        .options(**files._CSV_OPTIONS)
        .csv(path)
        .withColumn("s", F.coalesce(F.col("s"), F.lit("")))
    )
    got = {(r.id, r.s) for r in back.collect()}
    assert got == set(rows)
