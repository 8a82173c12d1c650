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


def _parse_image_header(buf: bytes) -> dict | None:
    """Dependency-free width/height/channels from PNG IHDR or JPEG
    SOF headers — pure stdlib struct reads, so media METADATA is real
    for real files even when no codec (Pillow) is importable; full
    pixel decode still requires the codec.

    PNG (ISO/IEC 15948 §5.2, §11.2.2): 8-byte signature, then the
    IHDR chunk — width/height big-endian u32 at offsets 16/20, colour
    type at 25 (0 grey=1ch, 2 rgb=3, 3 palette=1, 4 grey+a=2,
    6 rgba=4).

    JPEG (ITU T.81 §B.2.2): scan markers for a start-of-frame
    SOFn (0xC0-0xCF minus DHT 0xC4 / JPG 0xC8 / DAC 0xCC); the frame
    header carries height/width as big-endian u16 and the component
    count (1 grey, 3 YCbCr)."""
    import struct
    if buf[:8] == b"\x89PNG\r\n\x1a\n":
        if len(buf) >= 26 and buf[12:16] == b"IHDR":
            w, h = struct.unpack(">II", buf[16:24])
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(buf[25])
            if channels and 0 < w and 0 < h:
                return {"width": w, "height": h, "channels": channels}
        return None
    if buf[:2] == b"\xff\xd8":
        i = 2
        while i + 9 < len(buf):
            if buf[i] != 0xFF:
                i += 1
                continue
            marker = buf[i + 1]
            if marker in (0xFF, 0x01) or 0xD0 <= marker <= 0xD9:
                i += 2          # standalone marker, no length field
                continue
            (seglen,) = struct.unpack(">H", buf[i + 2:i + 4])
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8,
                                                         0xCC):
                h, w = struct.unpack(">HH", buf[i + 5:i + 9])
                ncomp = buf[i + 9]
                if 0 < w and 0 < h and 0 < ncomp <= 4:
                    return {"width": w, "height": h, "channels": ncomp}
                return None
            i += 2 + seglen
        return None
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
    """Real metadata whenever possible, deterministic fake otherwise:
    PIL decode when importable, else a dependency-free PNG/JPEG
    header parse (_parse_image_header) — so width/height/channels are
    REAL for real image files even in codec-less environments.
    Content that is neither (e.g. the documents_as_media harness,
    whose 'images' are utf-8 bytes) falls back to the fake, so
    results are stable whether or not a codec is installed."""
    Image = _image_codec()
    if Image is not None:
        import io
        try:
            with Image.open(io.BytesIO(buf)) as im:
                return {"width": im.width, "height": im.height,
                        "channels": len(im.getbands())}
        except Exception:
            pass
    try:
        meta = _parse_image_header(buf)
        if meta is not None:
            return meta
    except Exception:
        pass    # truncated/corrupt header — fall through to the fake
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
            for mid, kind, fmt0, content in zip(pdf.media_id, pdf.kind,
                                                pdf["format"], pdf.content):
                buf = bytes(content)
                try:
                    with Image.open(io.BytesIO(buf)) as im:
                        out = io.BytesIO()
                        im.resize((width, height)).save(out,
                                                        format=out_format)
                        buf = out.getvalue()
                        fmt = out_format
                except Exception:
                    # pass through un-decodable content UNCHANGED,
                    # original format label included
                    fmt = fmt0
                rows.append((mid, kind, fmt, buf, len(buf)))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "format",
                                              "content", "n_bytes"])

    return (df.select("media_id", "kind", "format", "content")
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


#: extension -> (kind, format) for directory ingestion
_EXT_KINDS = {
    "png": ("image", "png"), "jpg": ("image", "jpeg"),
    "jpeg": ("image", "jpeg"), "gif": ("image", "gif"),
    "webp": ("image", "webp"), "bmp": ("image", "bmp"),
    "wav": ("audio", "wav"), "mp3": ("audio", "mp3"),
    "flac": ("audio", "flac"), "ogg": ("audio", "ogg"),
    "mp4": ("video", "mp4"), "mkv": ("video", "mkv"),
    "webm": ("video", "webm"), "avi": ("video", "avi"),
}


def read_media_dir(spark, path: str,
                   pattern: str | None = None) -> DataFrame:
    """Ingest a directory of media files into MEDIA_SCHEMA (+ a
    `path` column for provenance) via Spark's binaryFile source —
    the on-ramp from raw object-store files to the typed media
    column every multimodal operator consumes. kind/format derive
    from the file extension (unknown extensions keep kind='binary'
    so nothing is silently dropped); media_id is xxhash64(path) —
    stable across re-ingestion, collision odds |files|/2⁶⁴.

    Scale: binaryFile is a real DataSource — file listing
    parallelizes, `pathGlobFilter` prunes at the listing, and each
    file is one row read on an executor (no driver-side IO); cap
    per-task memory with spark.sql.files.maxPartitionBytes. Follow
    with repartition_by_bytes before wide shuffles."""
    reader = spark.read.format("binaryFile")
    if pattern:
        reader = reader.option("pathGlobFilter", pattern)
    return media_projection(reader.load(path))


def media_projection(raw: DataFrame) -> DataFrame:
    """binaryFile rows -> MEDIA_SCHEMA (+ path): shared by the batch
    and streaming ingestion fronts. The extension comes from the
    BASENAME (an extension-less file under a dotted directory like
    /data/v1.2/readme must not yield a path fragment as its format);
    a basename with no dot falls back to format='bin'."""
    base = F.element_at(F.split(F.col("path"), "/"), -1)
    parts = F.split(base, r"\.")
    ext = F.when(F.size(parts) > 1,
                 F.lower(F.element_at(parts, -1))).otherwise(F.lit("bin"))
    kind = F.lit("binary")
    fmt = ext
    for e, (k, fm) in _EXT_KINDS.items():
        kind = F.when(ext == e, F.lit(k)).otherwise(kind)
        fmt = F.when(ext == e, F.lit(fm)).otherwise(fmt)
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        kind.alias("kind"),
        fmt.alias("format"),
        F.col("content"),
        F.col("length").alias("n_bytes"),
        F.col("path"))
