"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed by Arrow-batched ``mapInPandas`` (BASELINE.json north star).

The image path is REAL end to end: a pure-stdlib (zlib + struct) PNG
codec — :func:`png_codec` — encodes deterministic per-document RGB images
into the binary column and decodes them back, scanline filters, chunk
CRCs and all. No arithmetic fakes remain; the decode step parses actual
container bytes the way PIL would, so the oracle checks real
width/height/pixel statistics. Everything Spark-side is likewise real:
the binary column, the Arrow batch iterator, the output schema, and the
partitioning story (a pure map stage; at 100 TB the only knob is
``spark.sql.files.maxPartitionBytes`` so each task's batch of blobs fits
in executor memory). Heavier codecs (JPEG/ffmpeg) slot into the same
plumbing by swapping the codec closure.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, width long, height long, channels long, bit_depth long, "
    "pixel_sum long"
)

# Deterministic per-document image rule — duplicated in SQL by the oracle
# fragments (queries/llm.py multimodal_* oracles), so DuckDB independently
# predicts what a CORRECT PNG encode→decode round-trip must yield. Both
# are tiny expressions on doc_id; every pixel in row y of doc d has value
# (doc_id + y) % 256 in all three channels — the oracles inline that rule,
# and tests/test_png_codec.py pins SQL and Python agreement.
SQL_IMG_W = "(8 + doc_id % 9)"
SQL_IMG_H = "(8 + (doc_id * 3) % 9)"


def png_codec():
    """Pure-stdlib 8-bit RGB PNG encoder + decoder, returned as CLOSURES.

    Closures (not module-level functions) because cloudpickle ships
    dynamically created functions BY VALUE into the mapInPandas workers —
    a module-level function pickles by reference, and vanilla-session
    Python workers (the round driver's) cannot import this repo.

    Encoder: color type 2 (truecolor RGB), bit depth 8, one IDAT, filter
    cycling None/Sub/Up per scanline so decoders must actually unfilter.
    Decoder: full spec surface for this profile — signature check, chunk
    CRC verification, and all five filter types (None/Sub/Up/Average/
    Paeth), numpy-vectorized on the hot paths. Raises ValueError on
    malformed bytes; never guesses.
    """
    import struct
    import zlib

    import numpy as np

    SIG = b"\x89PNG\r\n\x1a\n"

    def _chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    def encode(pixels: "np.ndarray") -> bytes:
        """(h, w, 3) uint8 array → PNG bytes."""
        h, w, c = pixels.shape
        if c != 3 or pixels.dtype != np.uint8:
            raise ValueError("encoder takes (h, w, 3) uint8 RGB")
        rows = pixels.reshape(h, w * 3).astype(np.int16)
        filtered = np.empty((h, 1 + w * 3), dtype=np.uint8)
        for y in range(h):
            f = y % 3  # cycle None/Sub/Up
            filtered[y, 0] = f
            if f == 0:
                filtered[y, 1:] = rows[y]
            elif f == 1:  # Sub: minus the pixel 3 bytes left
                d = rows[y].copy()
                d[3:] -= rows[y][:-3]
                filtered[y, 1:] = d & 0xFF
            else:  # Up: minus the same byte one scanline up
                filtered[y, 1:] = (rows[y] - rows[y - 1]) & 0xFF
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(filtered.tobytes(), 6))
            + _chunk(b"IEND", b"")
        )

    def decode(blob: bytes):
        """PNG bytes → (width, height, channels, bit_depth, (h, w, 3)
        uint8 pixel array). Verifies signature and every chunk CRC."""
        if bytes(blob[:8]) != SIG:
            raise ValueError("bad PNG signature")
        pos, width, height, bit_depth, idat = 8, None, None, None, bytearray()
        while pos + 12 <= len(blob):
            (ln,) = struct.unpack(">I", blob[pos : pos + 4])
            if pos + 12 + ln > len(blob):
                raise ValueError("truncated chunk")
            tag = bytes(blob[pos + 4 : pos + 8])
            data = bytes(blob[pos + 8 : pos + 8 + ln])
            (crc,) = struct.unpack(">I", blob[pos + 8 + ln : pos + 12 + ln])
            if crc != zlib.crc32(tag + data):
                raise ValueError(f"CRC mismatch in {tag!r} chunk")
            if tag == b"IHDR":
                width, height, bit_depth, color_type = struct.unpack(
                    ">IIBB", data[:10]
                )
                if bit_depth != 8 or color_type != 2:
                    raise ValueError("decoder supports 8-bit truecolor only")
            elif tag == b"IDAT":
                idat += data
            elif tag == b"IEND":
                break
            pos += 12 + ln
        if width is None or not idat:
            raise ValueError("missing IHDR/IDAT")
        stride = width * 3
        raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
        raw = raw.reshape(height, 1 + stride)
        out = np.empty((height, stride), dtype=np.int64)
        for y in range(height):
            f, row = raw[y, 0], raw[y, 1:].astype(np.int64)
            if f == 0:
                out[y] = row
            elif f == 1:  # Sub: per-channel prefix sum along the scanline
                out[y] = (
                    np.cumsum(row.reshape(width, 3), axis=0).reshape(stride)
                ) & 0xFF
            elif f == 2:  # Up (prior scanline is all-zero for the first row)
                out[y] = (row + (out[y - 1] if y else 0)) & 0xFF
            elif f in (3, 4):  # Average / Paeth: left-recurrence, loop px
                prev = out[y - 1] if y else np.zeros(stride, dtype=np.int64)
                cur = np.zeros(stride, dtype=np.int64)
                for x in range(width):
                    i = x * 3
                    a = cur[i - 3 : i] if x else np.zeros(3, dtype=np.int64)
                    b = prev[i : i + 3]
                    if f == 3:
                        pred = (a + b) >> 1
                    else:
                        c = prev[i - 3 : i] if x else np.zeros(3, dtype=np.int64)
                        p = a + b - c
                        pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                        pred = np.where(
                            (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                        )
                    cur[i : i + 3] = (row[i : i + 3] + pred) & 0xFF
                out[y] = cur
            else:
                raise ValueError(f"unknown PNG filter {f}")
        return width, height, 3, 8, out.astype(np.uint8).reshape(height, width, 3)

    return encode, decode


def image_rule():
    """The deterministic image-content rule as closures (cloudpickle
    by-value, same reason as :func:`png_codec`). Must stay in lockstep
    with ``SQL_IMG_W`` / ``SQL_IMG_H`` and the inline ``(doc_id + y) % 256``
    row-value rule in the ``multimodal_*`` oracles."""

    def dims(doc_id: int) -> tuple[int, int]:
        return 8 + doc_id % 9, 8 + (doc_id * 3) % 9

    def pixels(doc_id: int):
        import numpy as np

        w, h = dims(doc_id)
        rowvals = (doc_id + np.arange(h, dtype=np.int64)) % 256
        return np.repeat(rowvals, w * 3).reshape(h, w, 3).astype(np.uint8)

    return dims, pixels


def with_blob(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary payload column (here: UTF-8 bytes of the
    text, standing in for arbitrary modality bytes — used by the
    featurizer and frame-sampler, whose math is content-agnostic)."""
    return docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("blob"))


def with_png_blob(docs: DataFrame) -> DataFrame:
    """Attach a REAL PNG binary payload per document: deterministic RGB
    pixels (:func:`image_rule`) encoded by :func:`png_codec`. A separate
    Arrow stage from the decode, so blobs demonstrably round-trip through
    Spark's binary column, not just a Python variable."""
    enc, _ = png_codec()
    _, make_pixels = image_rule()

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "blob": [enc(make_pixels(int(d))) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(synth, schema="doc_id long, blob binary")


def decode_metadata(docs: DataFrame) -> DataFrame:
    """PNG blobs → typed metadata + pixel statistics via mapInPandas
    (Arrow batches — the Pandas-UDF slow path, used only because codec
    work is imperative). Every output column is independently predicted
    by the oracle from the image rule; a decoder bug (wrong unfilter,
    wrong stride, skipped CRC) cannot match."""
    _, dec = png_codec()

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                w, h, c, depth, px = dec(blob)
                rows.append((doc_id, w, h, c, depth, int(px.sum())))
            yield _pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "channels",
                    "bit_depth",
                    "pixel_sum",
                ],
            )

    return with_png_blob(docs).mapInPandas(decode_batches, schema=DECODE_SCHEMA)


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


def resize_thumbnail(docs: DataFrame, w: int = 4, h: int = 4) -> DataFrame:
    """REAL pixel resampling: decode each PNG blob, nearest-neighbor
    downsample to ``w``×``h`` (source index = floor(out_idx·src/out), the
    classic integer mapping), re-checksum the sampled pixels. One Arrow
    map stage, no shuffle — the contract any heavier resampler (box, CLIP
    preprocessor) plugs into. The oracle predicts the checksum from the
    image rule + the same index mapping, so sampling off by one row
    anywhere mismatches."""
    _, dec = png_codec()

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        import pandas as _pd

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["blob"]):
                src_w, src_h, _c, _depth, px = dec(blob)
                ys = (np.arange(h, dtype=np.int64) * src_h) // h
                xs = (np.arange(w, dtype=np.int64) * src_w) // w
                thumb = px[np.ix_(ys, xs)]
                rows.append((doc_id, w, h, int(thumb.size), int(thumb.sum())))
            yield _pd.DataFrame(
                rows,
                columns=["doc_id", "thumb_w", "thumb_h", "thumb_bytes", "thumb_checksum"],
            )

    return with_png_blob(docs).mapInPandas(resize, schema=RESIZE_SCHEMA)


def frame_sample_offsets(docs: DataFrame, frame_bytes: int = 1024) -> DataFrame:
    """"Video" frame sampling: one row per sampled frame offset — the
    explode-shaped half of multimodal processing, done with built-ins
    (no Python needed when the sampling rule is arithmetic)."""
    blobs = with_blob(docs)
    n_bytes = F.length("blob").cast("long")
    # empty-blob guard: sequence(0, -1, k) throws IllegalArgumentException,
    # and explode of the empty array drops the row — matching the oracle's
    # range(0, 0, k), which emits zero rows for an empty document.
    offsets = F.when(
        n_bytes > 0,
        F.sequence(F.lit(0).cast("long"), n_bytes - 1, F.lit(frame_bytes).cast("long")),
    ).otherwise(F.array().cast("array<long>"))
    return blobs.select(
        "doc_id",
        n_bytes.alias("n_bytes"),
        F.explode(offsets).alias("frame_offset"),
    )
