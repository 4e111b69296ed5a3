"""Multimodal columns: binary media + typed metadata over mapInPandas.

Images/audio/video ride as opaque ``binary`` columns next to typed
metadata (the same shape as ``pages.html``). The Spark-side plumbing —
schemas, batch iteration, partition sizing — is real and tested; the
codec step is STUBBED (this container has no image/audio libraries):
``decode_image`` parses our deterministic fake header and raises
``NotImplementedError`` for real formats, exactly where a PIL/ffmpeg
call would slot in.

Scale shape: ``mapInPandas`` streams Arrow batches, so one task never
materializes more than ``spark.sql.execution.arrow.maxRecordsPerBatch``
media blobs; repartition upstream by size so a partition's blobs fit in
executor memory (binary columns defeat row-count-based sizing).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("blob", T.BinaryType(), True),
        T.StructField("meta_w", T.IntegerType(), True),
        T.StructField("meta_h", T.IntegerType(), True),
    ]
)

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)

FAKE_MAGIC = b"FAKEIMG1"


def encode_fake_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic stand-in codec: header + seeded uint8 pixel payload."""
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, width * height, dtype=np.uint8).tobytes()
    return FAKE_MAGIC + width.to_bytes(4, "big") + height.to_bytes(4, "big") + payload


def _try_import_pil():
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


_PIL = _try_import_pil()


def decode_image(blob: bytes) -> np.ndarray:
    """Codec seam: fake format always decodes; real formats decode to
    8-bit grayscale via PIL when it is importable, else raise — the
    feature extractors downstream turn that into an error row (C7), never
    a task failure."""
    if blob is None:
        raise ValueError("null blob")
    if blob[:8] == FAKE_MAGIC:
        w = int.from_bytes(blob[8:12], "big")
        h = int.from_bytes(blob[12:16], "big")
        return np.frombuffer(blob[16 : 16 + w * h], dtype=np.uint8).reshape(h, w)
    if _PIL is not None:
        import io

        try:
            with _PIL.open(io.BytesIO(blob)) as img:
                return np.asarray(img.convert("L"), dtype=np.uint8)
        except Exception as e:  # corrupt bytes → per-item error row
            raise ValueError(f"undecodable image: {type(e).__name__}") from e
    raise NotImplementedError(
        "real image codecs unavailable (PIL not importable); fake format only"
    )


def _phash(img: np.ndarray, grid: int = 8) -> int:
    """Average-hash over a grid×grid downsample (deterministic, no deps)."""
    h, w = img.shape
    ys = (np.arange(grid) * h) // grid
    xs = (np.arange(grid) * w) // grid
    small = img[np.ix_(ys, xs)].astype(np.float64)
    bits = (small > small.mean()).flatten()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    # Two's-complement reinterpretation to signed int64 (subtract 2^64,
    # NOT 2^63 — the latter would clear the sign bit instead of
    # sign-extending, colliding pairs that differ only in bit 63).
    return out - (1 << 64) if out >= (1 << 63) else out


def image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract images via mapInPandas (C7-style per-item
    error isolation: decode failures become rows, not task failures)."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                row = {"media_id": mid, "width": None, "height": None,
                       "mean_luma": None, "phash": None, "decode_error": None}
                try:
                    img = decode_image(blob)
                    row.update(
                        width=img.shape[1], height=img.shape[0],
                        mean_luma=round(float(img.mean()), 4), phash=_phash(img),
                    )
                except (NotImplementedError, ValueError, IndexError) as e:
                    row["decode_error"] = type(e).__name__
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES.fields])

    return media.filter("kind = 'image'").select("media_id", "blob").mapInPandas(
        _batches, schema=IMAGE_FEATURES
    )


def resize_stub(media: DataFrame, target: int = 64) -> DataFrame:
    """Resize plumbing: same batch shape as :func:`image_features`; the
    interpolation kernel is the stubbed seam (nearest-neighbor on the fake
    codec, NotImplementedError on real formats)."""

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("blob", T.BinaryType(), True),
            T.StructField("meta_w", T.IntegerType(), True),
            T.StructField("meta_h", T.IntegerType(), True),
        ]
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                try:
                    img = decode_image(blob)
                    ys = (np.arange(target) * img.shape[0]) // target
                    xs = (np.arange(target) * img.shape[1]) // target
                    small = img[np.ix_(ys, xs)]
                    payload = (
                        FAKE_MAGIC
                        + target.to_bytes(4, "big")
                        + target.to_bytes(4, "big")
                        + small.astype(np.uint8).tobytes()
                    )
                    rows.append({"media_id": mid, "blob": payload,
                                 "meta_w": target, "meta_h": target})
                except (NotImplementedError, ValueError):
                    rows.append({"media_id": mid, "blob": None,
                                 "meta_w": None, "meta_h": None})
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return media.filter("kind = 'image'").select("media_id", "blob").mapInPandas(
        _batches, schema=out_schema
    )


def image_near_pairs(
    media: DataFrame, bits: int = 64, bands: int = 8, max_hamming: int = 6
) -> DataFrame:
    """Image near-duplicate pairs by perceptual-hash Hamming distance —
    the multimodal twin of text SimHash dedup. Banded pigeonhole join on
    phash slices (any pair within max_hamming < bands shares a band), then
    exact bit_count verify; no cross join, scales like the text path."""
    from pyspark.sql import functions as F

    feats = image_features(media).filter(F.col("phash").isNotNull())
    width = bits // bands
    # Logical (unsigned) shifts, NOT div/%: phash is a signed 64-bit value
    # and truncate-toward-zero division would break the pigeonhole
    # guarantee for negative hashes (identical slice must give identical
    # band key regardless of the sign bit).
    mask = (1 << width) - 1
    band_expr = (
        f"transform(sequence(0, {bands - 1}), b -> named_struct('band', b, "
        f"'key', shiftrightunsigned(phash, b * {width}) & {mask}))"
    )
    banded = feats.select(
        "media_id", "phash", F.explode(F.expr(band_expr)).alias("bk")
    ).select("media_id", "phash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, on=["band", "key"])
        .filter(F.col("a.media_id") < F.col("b.media_id"))
        .select(
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
