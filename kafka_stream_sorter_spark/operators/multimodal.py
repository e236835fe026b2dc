"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed by Arrow-batched ``mapInPandas`` (BASELINE.json north star).

The container has no image/audio codecs, so the *decode* step is a
clearly-marked deterministic stub (`_fake_decode_meta`) — but everything
Spark-side is real and tested: the binary column, the Arrow batch
iterator, the output schema, and the partitioning story (a pure map stage;
at 100 TB the only knob is ``spark.sql.files.maxPartitionBytes`` so each
task's batch of blobs fits in executor memory).

Swapping in a real decoder is a one-function change: replace
``_fake_decode_meta`` with PIL/ffmpeg calls — the plan does not change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, channels long, n_frames long"
)


def with_blob(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary payload column (here: UTF-8 bytes of the
    text, standing in for image/audio bytes)."""
    return docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("blob"))


def _fake_decode_meta(n_bytes: int) -> tuple[int, int, int, int]:
    """STUB decode — deterministic metadata derived from the byte length.

    A real implementation would parse the container header (PIL.Image.open /
    soundfile / pyav); neither library ships in this environment, so tests
    pin the plumbing with this arithmetic fake. NotImplementedError is NOT
    raised so the pipeline stays runnable end-to-end.
    """
    width = 16 + n_bytes % 624
    height = 16 + (n_bytes * 7) % 464
    channels = 1 + n_bytes % 3
    n_frames = 1 + n_bytes // 1024
    return width, height, channels, n_frames


def decode_metadata(docs: DataFrame) -> DataFrame:
    """binary blobs → typed metadata via mapInPandas (Arrow batches —
    the Pandas-UDF slow path, used only because decoding is imperative)."""

    # NOTE: the batch fn must be self-contained (no references to this
    # module) so cloudpickle ships it by value — Python workers do not have
    # the repo on sys.path unless the session was built by our get_spark.
    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def fake_decode(n_bytes: int) -> tuple[int, int, int, int]:
            # keep in sync with _fake_decode_meta above
            return (
                16 + n_bytes % 624,
                16 + (n_bytes * 7) % 464,
                1 + n_bytes % 3,
                1 + n_bytes // 1024,
            )

        for pdf in batches:
            n_bytes = pdf["blob"].map(len)
            meta = n_bytes.map(fake_decode)
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes,
                    "width": meta.map(lambda m: m[0]),
                    "height": meta.map(lambda m: m[1]),
                    "channels": meta.map(lambda m: m[2]),
                    "n_frames": meta.map(lambda m: m[3]),
                }
            )

    return with_blob(docs).mapInPandas(decode_batches, schema=DECODE_SCHEMA)


FEATURE_SCHEMA = "doc_id long, " + ", ".join(f"h{i} long" for i in range(8))


def byte_histogram_features(docs: DataFrame) -> DataFrame:
    """Feature extraction over the binary payload: an 8-bin byte-value
    histogram per blob (bin = byte >> 5) via Arrow-batched mapInPandas +
    numpy. Unlike the decode stub this is REAL computation on the bytes —
    the plumbing pattern for any per-blob featurizer (CLIP, mel spectrogram)
    whose library would replace the numpy body."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as _pd

        for pdf in batches:
            hists = np.stack(
                [
                    np.bincount(
                        np.frombuffer(blob, dtype=np.uint8) >> 5, minlength=8
                    )[:8]
                    for blob in pdf["blob"]
                ]
            )
            out = {"doc_id": pdf["doc_id"].to_numpy()}
            for i in range(8):
                out[f"h{i}"] = hists[:, i].astype("int64")
            yield _pd.DataFrame(out)

    return with_blob(docs).mapInPandas(featurize, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id long, thumb_w long, thumb_h long, thumb_bytes long, thumb_checksum long"


def resize_thumbnail(docs: DataFrame, w: int = 16, h: int = 16, channels: int = 3) -> DataFrame:
    """Resize step, stubbed at the pixel level: a real resize needs a codec
    (PIL/opencv — not in this container), so the "thumbnail" is the leading
    w*h*channels byte slice of the blob; its length and integer checksum are
    what tests and the oracle pin. The Spark-side contract (Arrow batches,
    schema, one map stage, no shuffle) is exactly what a real resampler
    plugs into."""
    budget = w * h * channels

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as _pd

        for pdf in batches:
            sliced = [np.frombuffer(b, dtype=np.uint8)[:budget] for b in pdf["blob"]]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "thumb_w": np.int64(w),
                    "thumb_h": np.int64(h),
                    "thumb_bytes": np.array([len(s) for s in sliced], dtype="int64"),
                    "thumb_checksum": np.array(
                        [int(s.astype("int64").sum()) for s in sliced], dtype="int64"
                    ),
                }
            )

    return with_blob(docs).mapInPandas(resize, schema=RESIZE_SCHEMA)


def frame_sample_offsets(docs: DataFrame, frame_bytes: int = 1024) -> DataFrame:
    """"Video" frame sampling: one row per sampled frame offset — the
    explode-shaped half of multimodal processing, done with built-ins
    (no Python needed when the sampling rule is arithmetic)."""
    blobs = with_blob(docs)
    n_bytes = F.length("blob").cast("long")
    offsets = F.sequence(F.lit(0).cast("long"), n_bytes - 1, F.lit(frame_bytes).cast("long"))
    return blobs.select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        F.explode(offsets).alias("frame_offset"),
    )
