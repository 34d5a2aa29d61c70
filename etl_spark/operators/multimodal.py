"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

Design (task spec): media travels as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas functions over ``mapInPandas``. The image/audio
libraries are NOT in this container, so the actual byte decoding is
stubbed: ``decode_stub='fake'`` produces deterministic fake features (so
the distributed plumbing — schema, batch shape, partition behavior — is
real and tested), ``decode_stub='raise'`` raises NotImplementedError the
way the real kernel would surface a missing codec.

Scale notes: media rows are large and skewed — the module exposes
``repartition_by_bytes`` so a stage's input partitions target a byte
budget (the reference's batch-budget idea, batch_budget.rs:22-70, applied
to partition planning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried beside every media blob.
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),       # png|jpeg|wav|mp4...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("content_hash", T.StringType(), True),
        # double, not float: the fake features are 6-decimal fractions and
        # float32 storage would perturb them past exact-compare tolerance
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real image/audio feature extractor:
    byte-histogram moments. Replaces the codec call, keeps the data flow
    honest (bytes in → fixed-dim float vector out)."""
    if payload is None:
        return None
    buckets = [0] * dim
    for i, b in enumerate(payload):
        buckets[b % dim] += 1
    total = max(len(payload), 1)
    return [round(c / total, 6) for c in buckets]


def extract_features(
    media: DataFrame, decode_stub: str = "fake", batch_dim: int = 8
) -> DataFrame:
    """Decode + feature-extract media blobs via ``mapInPandas``.

    Real deployments swap ``_fake_features`` for PIL/librosa/ffmpeg calls —
    the Spark-side contract (Arrow batches of binary in, fixed-dim vectors
    out, schema declared up front) is exactly what a production kernel
    needs. ``decode_stub='raise'`` marks the unimplemented codec path.
    """
    if decode_stub not in ("fake", "raise"):
        raise ValueError("decode_stub must be 'fake' or 'raise'")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "media codecs (PIL/librosa/ffmpeg) not available in this "
                    "container; use decode_stub='fake' for plumbing tests"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda p: len(p) if p is not None else None),
                    "content_hash": payloads.map(
                        lambda p: hashlib.md5(p).hexdigest() if p is not None else None
                    ),
                    "features": payloads.map(lambda p: _fake_features(p, batch_dim)),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(
    media: DataFrame, width: int, height: int, decode_stub: str = "fake"
) -> DataFrame:
    """Resize image payloads via ``mapInPandas`` (stubbed codec).

    Real deployments decode with PIL, resize, re-encode; the stub
    deterministically truncates/pads the payload to ``width*height`` bytes
    so batch shape, output schema, and metadata rewriting are exercised
    end-to-end. ``decode_stub='raise'`` marks the missing-codec path.
    """
    if decode_stub not in ("fake", "raise"):
        raise ValueError("decode_stub must be 'fake' or 'raise'")
    out_len = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "image codecs (PIL) not available in this container; "
                    "use decode_stub='fake' for plumbing tests"
                )
            def fake_resize(p):
                if p is None:
                    return None
                return (p * (out_len // max(len(p), 1) + 1))[:out_len]

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(fake_resize),
                    "width": width,
                    "height": height,
                }
            )

    return media.filter(F.col("meta.media_type") == "image").mapInPandas(
        run,
        schema="media_id long, payload binary, width int, height int",
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Plan video frame sampling: one output row per (media_id, frame_ts).

    The frame *extraction* is a stubbed codec call; the *plan* — exploding
    each video into its sample timestamps, which is what drives downstream
    partitioning — is real DataFrame algebra.
    """
    n_frames = (F.col("meta.duration_ms") / every_ms).cast("int")
    return (
        media.filter(F.col("meta.media_type") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))))
        .withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
        .select("media_id", "frame_idx", "frame_ts_ms")
    )


def repartition_by_bytes(
    media: DataFrame, target_partition_bytes: int = 128 * 1024 * 1024, avg_row_bytes: int | None = None
) -> DataFrame:
    """Repartition a media table so each partition holds roughly
    ``target_partition_bytes`` of payload — the batch-budget idea
    (batch_budget.rs:22-70) applied to partition planning.

    Uses sampled average row size when not provided. One count + one
    shuffle; worth it before an expensive decode stage.
    """
    if avg_row_bytes is None:
        sample = media.select(F.avg(F.length("payload")).alias("b")).collect()[0]["b"] or 1024
        avg_row_bytes = int(sample)
    n_rows = media.count()
    parts = max(1, int(n_rows * avg_row_bytes / target_partition_bytes))
    return media.repartition(parts)


def audio_frame_energies(media: DataFrame, frame_chars: int = 20) -> DataFrame:
    """Per-frame "energy" of audio payloads (Arrow-batched mapInPandas —
    the decode stage of a VAD pipeline). The codec is the documented
    deterministic stand-in (no audio libs in this environment): payload
    bytes decode to text and a frame's energy is the codepoint sum of its
    ``frame_chars``-char window (``np.add.reduceat`` — one vectorized
    pass per payload, no per-frame Python loop). A real decoder slots in
    by replacing the energy kernel; the Spark-side plumbing — audio-type
    pruning before the Python stage, Arrow batch shape, frame fan-out —
    is the part that carries to 100 TB.

    Returns ``(media_id, frame_idx, energy, flen)``.
    """
    import numpy as np

    out_schema = "media_id long, frame_idx int, energy long, flen int"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, fidx, energies, flens = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                txt = bytes(payload).decode("utf-8")
                n = len(txt)
                if n == 0:
                    continue
                codes = np.fromiter((ord(c) for c in txt), dtype="int64", count=n)
                starts = np.arange(0, n, frame_chars)
                sums = np.add.reduceat(codes, starts)
                lens = np.minimum(starts + frame_chars, n) - starts
                mids.extend([mid] * len(starts))
                fidx.extend(range(len(starts)))
                energies.extend(sums.tolist())
                flens.extend(lens.tolist())
            yield pd.DataFrame(
                {"media_id": mids, "frame_idx": fidx,
                 "energy": energies, "flen": flens}
            )

    return media.select("media_id", "payload").mapInPandas(gen, out_schema)


def image_tile_stats(
    media: DataFrame, grid: int = 40, tile: int = 10
) -> DataFrame:
    """Per-tile luma statistics of image payloads (Arrow-batched
    mapInPandas — the decode + 2D-reshape stage of an image-quality
    pipeline). The codec is the documented deterministic stand-in (no
    image libs in this environment): the payload's text cycles to a
    ``grid``×``grid`` codepoint raster and each ``tile``×``tile`` block
    reduces to integer sum / sum-of-squares via one numpy reshape — no
    per-pixel Python. A real decoder (PIL) slots in by replacing the
    raster construction; the Spark-side plumbing — image-type pruning
    before the Python stage, the Arrow batch shape, the 2D block
    reduction — is what carries to 100 TB.

    Returns ``(media_id, tile_r, tile_c, s, s2, n_px)`` with exact
    integer sums; derive mean/variance JVM-side.
    """
    import numpy as np

    t_per = grid // tile
    out_schema = "media_id long, tile_r int, tile_c int, s long, s2 long, n_px int"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, trs, tcs, ss, s2s = [], [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                txt = bytes(payload).decode("utf-8")
                n = len(txt)
                if n == 0:
                    continue
                codes = np.fromiter(
                    (ord(c) for c in txt), dtype="int64", count=n
                )
                raster = codes[np.arange(grid * grid) % n].reshape(grid, grid)
                blocks = raster.reshape(t_per, tile, t_per, tile)
                s = blocks.sum(axis=(1, 3))
                s2 = (blocks * blocks).sum(axis=(1, 3))
                for r in range(t_per):
                    for c in range(t_per):
                        mids.append(mid)
                        trs.append(r)
                        tcs.append(c)
                        ss.append(int(s[r, c]))
                        s2s.append(int(s2[r, c]))
            yield pd.DataFrame(
                {"media_id": mids, "tile_r": trs, "tile_c": tcs,
                 "s": ss, "s2": s2s,
                 "n_px": [tile * tile] * len(mids)}
            )

    return media.select("media_id", "payload").mapInPandas(gen, out_schema)
