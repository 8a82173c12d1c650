"""Multimodal column plumbing — image/audio/video as opaque binary.

Design: media lives in a `binary` column with a typed metadata
struct beside it. All Spark-side plumbing (schema, partition sizing,
Arrow batch shape, UDF signatures) is real; the codec calls are
stubbed (`decode_stub`) because media libraries are not available in
this environment — swap `_decode_image_bytes` for a real decoder
(PIL/ffmpeg) without touching the pipeline.

Scale notes: media rows are orders of magnitude wider than tabular
rows, so the operators run through `mapInPandas` (streamed Arrow
batches — bounded memory, no collect), and repartitioning targets
bytes per task, not rows (`target_mb`).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType)

#: canonical media-column schema: content + typed metadata
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),      # image | audio | video
    StructField("format", StringType()),    # png, wav, mp4, ...
    StructField("content", BinaryType()),
    StructField("n_bytes", LongType()),
])


def documents_as_media(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Deterministic fake media table from any text table — the test
    harness for the plumbing (content = utf8 bytes, kind=image)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("png").alias("format"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.length(F.col(text_col)).cast("long").alias("n_bytes"))


def _image_codec():
    """The PIL Image module when importable, else None — the feature
    gate deciding whether decode/resize run a real codec or the
    deterministic stubs. Resolved at call time (not import time) so
    installing Pillow upgrades the pipeline without code changes."""
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


def _fake_decode(buf: bytes) -> dict:
    """Deterministic fake decode: stable pseudo-dimensions derived
    from the content, so downstream plumbing (schema, grouping,
    joins, the media_meta oracle) is fully exercisable without
    codecs."""
    n = len(buf)
    return {"width": (n % 640) + 1, "height": ((n * 7) % 480) + 1,
            "channels": 3}


def _decode_image_bytes(buf: bytes) -> dict:
    """Real decode via PIL when available, deterministic fake
    otherwise. Content that is not a decodable image (e.g. the
    documents_as_media harness, whose 'images' are utf-8 bytes) also
    falls back to the fake, so results are stable whether or not a
    codec is installed."""
    Image = _image_codec()
    if Image is not None:
        import io
        try:
            with Image.open(io.BytesIO(buf)) as im:
                return {"width": im.width, "height": im.height,
                        "channels": len(im.getbands())}
        except Exception:
            pass
    return _fake_decode(buf)


def extract_features(df: DataFrame, batch_size: int = 256) -> DataFrame:
    """media table → per-item feature row via mapInPandas.

    Output: media_id, n_bytes, width, height, channels, byte_entropy.
    The entropy is a real computation (numpy histogram over bytes) to
    prove the Arrow round-trip carries binary intact."""
    schema = ("media_id long, n_bytes long, width int, height int, "
              "channels int, byte_entropy double")

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import math

        import numpy as np
        import pandas as pd
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf.media_id, pdf.content):
                buf = bytes(content)
                meta = _decode_image_bytes(buf)
                if buf:
                    counts = np.bincount(
                        np.frombuffer(buf, dtype=np.uint8), minlength=256)
                    p = counts[counts > 0] / len(buf)
                    ent = float(-(p * np.log2(p)).sum())
                else:
                    ent = 0.0
                rows.append((mid, len(buf), meta["width"], meta["height"],
                             meta["channels"], ent))
            yield pd.DataFrame(rows, columns=["media_id", "n_bytes", "width",
                                              "height", "channels",
                                              "byte_entropy"])

    return df.select("media_id", "content").mapInPandas(gen, schema)


def resize(df: DataFrame, width: int, height: int,
           out_format: str = "png") -> DataFrame:
    """Resize every image to (width, height), re-encoding as
    `out_format` — mapInPandas over MEDIA_SCHEMA, same contract as
    extract_features. Requires a real codec: raises
    NotImplementedError when PIL is not importable (the graceful
    stub regime this container runs in); un-decodable items pass
    through unchanged rather than poisoning the batch."""
    Image = _image_codec()
    if Image is None:
        raise NotImplementedError(
            "media resize requires an image codec (Pillow not "
            "importable here); the pipeline contract is "
            "extract_features-style mapInPandas over MEDIA_SCHEMA")
    schema = ("media_id long, kind string, format string, "
              "content binary, n_bytes long")

    def gen(batches):
        import io

        import pandas as pd
        for pdf in batches:
            rows = []
            for mid, kind, content in zip(pdf.media_id, pdf.kind,
                                          pdf.content):
                buf = bytes(content)
                try:
                    with Image.open(io.BytesIO(buf)) as im:
                        out = io.BytesIO()
                        im.resize((width, height)).save(out,
                                                        format=out_format)
                        buf = out.getvalue()
                        fmt = out_format
                except Exception:
                    fmt = None   # pass through un-decodable content
                rows.append((mid, kind, fmt or "unknown", buf, len(buf)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "format",
                                              "content", "n_bytes"])

    return (df.select("media_id", "kind", "content")
              .mapInPandas(gen, schema))


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Back-compat name for resize(); same codec gate."""
    return resize(df, width, height)


def repartition_by_bytes(df: DataFrame, target_mb: int = 128,
                         bytes_col: str = "n_bytes") -> DataFrame:
    """Repartition a media table so each task sees ~target_mb of
    payload — rows are a meaningless unit when items range from 10 KB
    thumbnails to 4 GB videos."""
    row = df.agg(F.sum(bytes_col).alias("b")).first()
    total = row["b"] or 0
    nparts = max(1, int(total / (target_mb << 20)) + 1)
    return df.repartition(nparts)


def frame_sample(df: DataFrame, every_n: int = 30,
                 max_frames: int = 8) -> DataFrame:
    """Video → sampled frame rows via mapInPandas (one input item
    fans out to up to `max_frames` output rows — the schema,
    ordering, and Arrow batch shape are the real contract; the frame
    decode is a deterministic STUB because no video codec ships in
    this container; swap `_fake_frames` for ffmpeg/pyav without
    touching the pipeline).

    Output: media_id, frame_idx (source frame number, every_n
    apart), frame (binary — stub: a content-derived slice standing in
    for encoded pixels), n_bytes.

    Scale note: fan-out happens INSIDE the batch iterator, so a
    4 GB video never materializes more than one Arrow batch of
    frames at a time; pair with repartition_by_bytes so tasks are
    payload-balanced before decode."""
    schema = "media_id long, frame_idx int, frame binary, n_bytes long"

    def _fake_frames(buf: bytes, n: int):
        # deterministic stand-in: n slices of the source bytes
        step = max(1, len(buf) // max(n, 1))
        for i in range(n):
            yield buf[i * step:(i + 1) * step] or b"\x00"

    def gen(batches):
        import pandas as pd
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf.media_id, pdf.content):
                buf = bytes(content)
                # stub "frame count": one frame per byte-block, as if
                # the container reported len/every_n frames
                total = max(1, len(buf) // every_n)
                n = min(max_frames, total)
                for idx, frame in enumerate(_fake_frames(buf, n)):
                    rows.append((mid, idx * every_n, frame, len(frame)))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx",
                                              "frame", "n_bytes"])

    return df.select("media_id", "content").mapInPandas(gen, schema)
