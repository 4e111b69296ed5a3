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

from ..functions.jpeg import JPEG_SOI, UnsupportedJpegError, decode_jpeg_gray
from ..functions.png import PNG_SIGNATURE, png_to_gray

def _rows_to_pdf(rows: list[dict], schema: T.StructType) -> pd.DataFrame:
    """List-of-dict rows → pandas frame for an Arrow batch, with integer
    columns materialized as pandas nullable Int32/Int64 — NEVER float64.
    ``pd.DataFrame(rows)`` coerces an int column containing a ``None``
    (e.g. a decode-pending row next to decoded ones) to float64, which
    silently rounds magnitudes above 2^53: a 64-bit phash came back off
    by up to 128 whenever its batch also held an error row."""
    data = {}
    for f in schema.fields:
        vals = [r[f.name] for r in rows]
        if isinstance(f.dataType, T.LongType):
            data[f.name] = pd.array(vals, dtype="Int64")
        elif isinstance(f.dataType, T.IntegerType):
            data[f.name] = pd.array(vals, dtype="Int32")
        else:
            data[f.name] = vals
    return pd.DataFrame(data, columns=[f.name for f in schema.fields])


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
    """Codec seam: the fake format always decodes; PNG decodes via the
    pure-Python stdlib decoder (``functions.png`` — environment-
    independent, bit-identical to PIL's convert("L") on the same bytes,
    parity skip-tested); baseline JPEG decodes via the pure-Python codec
    (``functions.jpeg`` — luma plane, tolerance-parity with PIL since
    JPEG is lossy and convert("L") round-trips through RGB), with
    non-baseline variants (progressive) falling through to PIL when
    importable; other real formats decode to 8-bit grayscale via PIL
    when importable, else raise — the feature extractors downstream turn
    that into an error row (C7), never a task failure."""
    if blob is None:
        raise ValueError("null blob")
    if blob[:8] == FAKE_MAGIC:
        w = int.from_bytes(blob[8:12], "big")
        h = int.from_bytes(blob[12:16], "big")
        return np.frombuffer(blob[16 : 16 + w * h], dtype=np.uint8).reshape(h, w)
    if blob[:8] == PNG_SIGNATURE:
        return png_to_gray(blob)
    jpeg_seam = None
    if blob[:2] == JPEG_SOI:
        try:
            return decode_jpeg_gray(blob)
        except UnsupportedJpegError as e:
            if _PIL is None:
                raise
            jpeg_seam = e  # PIL may decode progressive; if not, re-raise
        except ValueError:
            if _PIL is None:
                raise
            # corrupt baseline JPEG: let PIL try below
    if _PIL is not None:
        import io

        try:
            with _PIL.open(io.BytesIO(blob)) as img:
                return np.asarray(img.convert("L"), dtype=np.uint8)
        except Exception as e:  # corrupt bytes → per-item error row
            if jpeg_seam is not None:
                # PIL can't decode it either (arithmetic/lossless):
                # surface the seam error so the dimension index still
                # fires in PIL-present deployments
                raise jpeg_seam from e
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
    error isolation: decode failures become rows, not task failures).
    When full decode raises toward the PIL/libwebp seam, the image still
    gets its HEADER INDEX parsed where the format allows it: a WebP's
    RIFF + VP8/VP8L/VP8X headers (``functions/webp.py``) and a
    non-baseline JPEG's SOFn frame header (``functions/jpeg.py
    parse_jpeg_dims`` — progressive/arithmetic/lossless raise
    ``UnsupportedJpegError`` at the codec seam, but dimensions live in
    the marker stream) both yield real width/height with
    ``decode_error = 'decode_pending'``, so resolution-class curation
    filters run before any codec is paid for (the image-side analog of
    the mp4/ogg index rows)."""
    from ..functions.avif import is_avif, parse_avif_dims
    from ..functions.jpeg import UnsupportedJpegError, parse_jpeg_dims
    from ..functions.webp import is_webp, parse_webp_dims

    def _header_dims(blob, exc):
        """Format-specific dimension index for a seam-limited decode, or
        None when the failure isn't a known codec-seam case. The
        webp/avif sniff fires on NotImplementedError (no PIL at all)
        AND on the PIL-wrapped ValueError (PIL importable but without
        webp/avif support — the common deployment): either way the
        container header still indexes. A corrupt blob fails its own
        parse below and stays an error row."""
        if isinstance(exc, UnsupportedJpegError):
            return parse_jpeg_dims(bytes(blob))
        if isinstance(exc, (NotImplementedError, ValueError)):
            # sniffs read only the leading container header (a real ftyp
            # box tops out well under 256 bytes), not the whole blob
            head = bytes(blob[:256])
            if is_webp(head):
                return parse_webp_dims(bytes(blob))
            if is_avif(head):
                return parse_avif_dims(bytes(blob))
        return None

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
                    try:
                        dims = None if blob is None else _header_dims(blob, e)
                        if dims is not None:
                            row.update(width=dims["width"],
                                       height=dims["height"],
                                       decode_error=DECODE_PENDING)
                        else:
                            row["decode_error"] = type(e).__name__
                    except (ValueError, NotImplementedError) as e2:
                        row["decode_error"] = type(e2).__name__
                rows.append(row)
            yield _rows_to_pdf(rows, IMAGE_FEATURES)

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
            yield _rows_to_pdf(rows, out_schema)

    return media.filter("kind = 'image'").select("media_id", "blob").mapInPandas(
        _batches, schema=out_schema
    )


FAKE_VIDEO_MAGIC = b"FAKEVID1"
FAKE_AUDIO_MAGIC = b"FAKEAUD1"


def encode_fake_video(width: int, height: int, n_frames: int, seed: int) -> bytes:
    """Deterministic stand-in video: header + n_frames seeded grayscale
    frames (one rng stream, frames differ)."""
    rng = np.random.default_rng(seed)
    payload = rng.integers(0, 256, width * height * n_frames, dtype=np.uint8).tobytes()
    return (
        FAKE_VIDEO_MAGIC + width.to_bytes(4, "big") + height.to_bytes(4, "big")
        + n_frames.to_bytes(4, "big") + payload
    )


def decode_video(blob: bytes) -> np.ndarray:
    """Video codec seam → (frames, h, w) uint8. Animated GIF decodes via
    the pure-Python ``functions.gif`` codec (frames composited with
    sub-rectangles/transparency/disposal, converted to luma); true video
    containers (mp4/webm) raise where ffmpeg/pyav would slot in."""
    from ..functions.gif import GIF_MAGICS, decode_gif_frames

    if blob is None:
        raise ValueError("null blob")
    if blob[:8] == FAKE_VIDEO_MAGIC:
        w = int.from_bytes(blob[8:12], "big")
        h = int.from_bytes(blob[12:16], "big")
        n = int.from_bytes(blob[16:20], "big")
        return np.frombuffer(blob[20 : 20 + w * h * n], dtype=np.uint8).reshape(n, h, w)
    if blob[:6] in GIF_MAGICS:
        return decode_gif_frames(blob)
    # mp4 and webm: the CONTAINER is parsed (functions/mp4.py keyframe
    # index, functions/webm.py cue index — used by video_frame_sample
    # for index-only rows); the pixel decode itself is the ffmpeg/pyav
    # seam, as is every container with no in-repo index (FLV, AVI, ...)
    raise NotImplementedError(
        "real video codecs unavailable; plug ffmpeg/pyav here"
    )


def encode_fake_audio(n_samples: int, sample_rate: int, seed: int) -> bytes:
    """Deterministic stand-in audio: header + seeded int16 PCM samples."""
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-(2**15), 2**15, n_samples, dtype=np.int16).tobytes()
    return (
        FAKE_AUDIO_MAGIC + n_samples.to_bytes(4, "big")
        + sample_rate.to_bytes(4, "big") + pcm
    )


def decode_audio(blob: bytes) -> tuple[np.ndarray, int]:
    """Audio codec seam → (int16 samples, sample_rate). WAV (RIFF PCM —
    8/16/24/32-bit int and float32, any channel count, mixed to mono)
    decodes via the pure-Python ``functions.wav`` codec; lossy formats
    raise where soundfile/ffmpeg would slot in (mp3 and ogg get
    CONTAINER-INDEX rows upstream in :func:`audio_features`; PCM
    decode itself is the seam)."""
    from ..functions.wav import WAV_RIFF, decode_wav

    if blob is None:
        raise ValueError("null blob")
    if blob[:8] == FAKE_AUDIO_MAGIC:
        n = int.from_bytes(blob[8:12], "big")
        sr = int.from_bytes(blob[12:16], "big")
        if sr <= 0:
            raise ValueError("invalid sample_rate")
        pcm = np.frombuffer(blob[16 : 16 + 2 * n], dtype=np.int16)
        if len(pcm) == 0:
            raise ValueError("empty pcm")
        return pcm, sr
    if blob[:4] == WAV_RIFF:
        return decode_wav(blob)
    # mp3: the FRAME INDEX is parsed (functions/mp3.py, used by
    # audio_features for duration/sample-rate rows); PCM decode itself
    # is the soundfile/ffmpeg seam
    raise NotImplementedError(
        "lossy audio codecs unavailable; plug soundfile/ffmpeg here"
    )


VIDEO_FRAMES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("frame_blob", T.BinaryType(), True),  # fake-image format
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("time_sec", T.DoubleType(), True),  # mp4/webm index rows
        T.StructField("byte_offset", T.LongType(), True),  # mp4/webm index rows
        T.StructField("decode_error", T.StringType(), True),
    ]
)

#: marker for container-index rows (mp4 keyframes, webm cues, mp3
#: frames) whose metadata parsed but whose pixels/PCM wait on the
#: ffmpeg/soundfile seam — distinct from hard decode errors
DECODE_PENDING = "decode_pending"


def video_frame_sample(media: DataFrame, every: int = 2) -> DataFrame:
    """Frame sampling over binary video columns: mapInPandas explodes each
    video into every ``every``-th frame, re-encoded in the fake-image
    format so the frames feed straight into :func:`image_features` /
    :func:`image_near_pairs` (dedup across videos = image near-dup over
    sampled frames). For mp4 AND webm the container index IS parsed
    (``functions/mp4.py`` sample tables, ``functions/webm.py`` cues):
    every ``every``-th KEYFRAME becomes an index-only row
    (``decode_error = 'decode_pending'``; frame_idx = sample number for
    mp4, cue ordinal for webm; n_frames = total samples for mp4, null
    for webm where counting needs a cluster walk) — the ranged-read
    recipe a C codec consumes at scale. A valid but Cues-less webm
    raises toward the seam (NotImplementedError row), like FLV/AVI.
    One Arrow batch of videos in memory at a time; output rows are
    frames, so repartition upstream for very long videos."""
    from ..functions.mp4 import is_mp4, parse_mp4_index
    from ..functions.webm import is_webm, parse_webm_index

    def _pending_row(mid, n_frames=None, frame_idx=None, time_sec=None,
                     byte_offset=None):
        return {
            "media_id": mid, "frame_idx": frame_idx, "n_frames": n_frames,
            "frame_blob": None, "mean_luma": None,
            "time_sec": time_sec, "byte_offset": byte_offset,
            "decode_error": DECODE_PENDING,
        }

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                try:
                    if blob is not None and is_webm(bytes(blob[:4])):
                        # Matroska cue index: one row per every-th cue
                        # point (keyframe-bearing cluster); total frame
                        # count is unknown without a cluster walk, so
                        # n_frames stays null
                        widx = parse_webm_index(bytes(blob))
                        wkeys = widx["keyframes"][::every]
                        if not wkeys:
                            rows.append(_pending_row(mid))
                            continue
                        for k, kf in enumerate(wkeys):
                            rows.append(_pending_row(
                                mid, frame_idx=k * every,
                                time_sec=kf["time_sec"],
                                byte_offset=kf["byte_offset"],
                            ))
                        continue
                    if blob is not None and is_mp4(blob):
                        idx_info = parse_mp4_index(blob)
                        keys = idx_info["keyframes"][::every]
                        if not keys:
                            # zero sync samples (legal empty stss): keep
                            # the media accounted with one index-less
                            # pending row instead of silently vanishing
                            rows.append(_pending_row(
                                mid, n_frames=idx_info["n_samples"],
                            ))
                            continue
                        for kf in keys:
                            rows.append(_pending_row(
                                mid, n_frames=idx_info["n_samples"],
                                frame_idx=kf["sample"],
                                time_sec=kf["time_sec"],
                                byte_offset=kf["byte_offset"],
                            ))
                        continue
                    frames = decode_video(blob)
                    n = frames.shape[0]
                    for idx in range(0, n, every):
                        fr = frames[idx]
                        fr_blob = (
                            FAKE_MAGIC
                            + fr.shape[1].to_bytes(4, "big")
                            + fr.shape[0].to_bytes(4, "big")
                            + fr.tobytes()
                        )
                        rows.append({
                            "media_id": mid, "frame_idx": idx, "n_frames": n,
                            "frame_blob": fr_blob,
                            "mean_luma": round(float(fr.mean()), 4),
                            "time_sec": None, "byte_offset": None,
                            "decode_error": None,
                        })
                except (NotImplementedError, ValueError, IndexError) as e:
                    rows.append({
                        "media_id": mid, "frame_idx": None, "n_frames": None,
                        "frame_blob": None, "mean_luma": None,
                        "time_sec": None, "byte_offset": None,
                        "decode_error": type(e).__name__,
                    })
            yield _rows_to_pdf(rows, VIDEO_FRAMES)

    return media.filter("kind = 'video'").select("media_id", "blob").mapInPandas(
        _batches, schema=VIDEO_FRAMES
    )


AUDIO_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_sec", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("zero_crossings", T.LongType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """Audio feature extraction over binary audio columns (duration, RMS,
    zero-crossing count — the cheap curation features), same per-item
    error isolation as :func:`image_features`. For mp3, ogg AND flac
    the CONTAINER INDEX is parsed (``functions/mp3.py`` frame headers,
    ``functions/ogg.py`` page granules, ``functions/flac.py``
    STREAMINFO): sample rate, sample count and duration come from the
    metadata walk with ``decode_error = 'decode_pending'`` — what a
    curation filter needs, ahead of the soundfile/ffmpeg seam. For ogg,
    ``sample_rate`` is the granule clock (48 kHz for Opus regardless of
    input rate); a valid ogg holding a codec outside Opus/Vorbis, or a
    flac with unknown total_samples, raises toward the seam
    (NotImplementedError row), like a Cues-less webm."""
    from ..functions.flac import FLAC_MAGIC, parse_flac_index
    from ..functions.mp3 import is_mp3, parse_mp3_index
    from ..functions.ogg import OGG_MAGIC, parse_ogg_index

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                row = {"media_id": mid, "n_samples": None, "sample_rate": None,
                       "duration_sec": None, "rms": None, "zero_crossings": None,
                       "decode_error": None}
                try:
                    # sniff on the first 4 bytes only — bytes(blob) of a
                    # multi-MB item would be a per-row O(blob) copy
                    head = b"" if blob is None else bytes(blob[:4])
                    if head == OGG_MAGIC:
                        indexer = parse_ogg_index
                    elif head == FLAC_MAGIC:
                        indexer = parse_flac_index
                    elif (blob is not None
                          and head != FAKE_AUDIO_MAGIC[:4]
                          and is_mp3(head)):
                        indexer = parse_mp3_index
                    else:
                        indexer = None
                    if indexer is not None:
                        idx = indexer(bytes(blob))
                        row.update(
                            n_samples=idx["n_samples"],
                            sample_rate=idx["sample_rate"],
                            duration_sec=idx["duration_sec"],
                            decode_error=DECODE_PENDING,
                        )
                        rows.append(row)
                        continue
                    pcm, sr = decode_audio(blob)
                    x = pcm.astype(np.float64)
                    row.update(
                        n_samples=len(pcm), sample_rate=sr,
                        duration_sec=round(len(pcm) / sr, 6),
                        rms=round(float(np.sqrt(np.mean(x * x))), 4),
                        zero_crossings=int(((pcm[:-1] < 0) != (pcm[1:] < 0)).sum()),
                    )
                except (NotImplementedError, ValueError, IndexError,
                        ZeroDivisionError) as e:
                    row["decode_error"] = type(e).__name__
                rows.append(row)
            yield _rows_to_pdf(rows, AUDIO_FEATURES)

    return media.filter("kind = 'audio'").select("media_id", "blob").mapInPandas(
        _batches, schema=AUDIO_FEATURES
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


PDF_TEXT = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_pages", T.IntegerType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("has_type0_fonts", T.BooleanType(), True),
        T.StructField("pdf_error", T.StringType(), True),
    ]
)


def pdf_text(docs: DataFrame) -> DataFrame:
    """Extract page text from binary PDF blobs via mapInPandas
    (``functions/pdf.py`` — stdlib object scan + Flate/ASCII filters +
    text-operator interpretation). Pages join with a blank line.
    C7 error isolation: malformed PDFs become ``pdf_error='ValueError'``
    rows; encrypted files and unsupported stream filters become
    ``pdf_error='NotImplementedError'`` rows (the decryption/LZW seam) —
    never task failures. ``has_type0_fonts=True`` flags composite-font
    pages whose CMap-less text is approximate (the declared-metadata
    honesty pattern, like the FLAC index).

    Scale shape: each PDF parses entirely inside its executor task —
    zero exchanges; repartition upstream by blob size so a partition's
    PDFs fit executor memory."""
    from ..functions.pdf import extract_pdf_text

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in it:
            rows = []
            for did, blob in zip(pdf_batch["doc_id"], pdf_batch["blob"]):
                row = {"doc_id": did, "n_pages": None, "text": None,
                       "has_type0_fonts": None, "pdf_error": None}
                try:
                    if blob is None:
                        raise ValueError("null blob")
                    r = extract_pdf_text(bytes(blob))
                    row.update(
                        n_pages=r["n_pages"],
                        text="\n\n".join(r["pages"]),
                        has_type0_fonts=r["has_type0_fonts"],
                    )
                except (ValueError, NotImplementedError) as e:
                    row["pdf_error"] = type(e).__name__
                rows.append(row)
            yield _rows_to_pdf(rows, PDF_TEXT)

    return docs.select("doc_id", "blob").mapInPandas(_batches, schema=PDF_TEXT)


DOCX_TEXT = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_paragraphs", T.IntegerType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("has_fields", T.BooleanType(), True),
        T.StructField("docx_error", T.StringType(), True),
    ]
)


def docx_text(docs: DataFrame) -> DataFrame:
    """Extract paragraph text from binary DOCX blobs via mapInPandas
    (``functions/docx.py`` — stdlib zipfile + WordprocessingML walk).
    C7 error isolation: malformed packages become
    ``docx_error='ValueError'`` rows; OLE2 containers (legacy .doc,
    encrypted OOXML) become ``docx_error='NotImplementedError'`` rows
    (the antiword/msoffcrypto seam) — never task failures.
    ``has_fields=True`` flags cached field results (page numbers, TOC)
    whose text may be stale — the declared-metadata honesty pattern.

    Scale shape: each document parses entirely inside its executor
    task — zero exchanges; repartition upstream by blob size so a
    partition's documents fit executor memory."""
    from ..functions.docx import extract_docx_text

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_batch in it:
            rows = []
            for did, blob in zip(pdf_batch["doc_id"], pdf_batch["blob"]):
                row = {"doc_id": did, "n_paragraphs": None, "text": None,
                       "has_fields": None, "docx_error": None}
                try:
                    if blob is None:
                        raise ValueError("null blob")
                    r = extract_docx_text(bytes(blob))
                    row.update(
                        n_paragraphs=r["n_paragraphs"],
                        text=r["text"],
                        has_fields=r["has_fields"],
                    )
                except (ValueError, NotImplementedError) as e:
                    row["docx_error"] = type(e).__name__
                rows.append(row)
            yield _rows_to_pdf(rows, DOCX_TEXT)

    return docs.select("doc_id", "blob").mapInPandas(_batches, schema=DOCX_TEXT)
