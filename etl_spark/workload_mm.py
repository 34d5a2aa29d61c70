"""Multimodal workload entries: binary media columns + typed metadata.

The container has no image/audio codecs, so media is synthesized from the
``documents`` table (text bytes = the opaque payload — the plumbing is the
point: binary columns, metadata structs, Arrow-batched ``mapInPandas``
feature extraction, frame-sampling plans). See
:mod:`etl_spark.operators.multimodal` for the operator layer and the stub
boundary where PIL/librosa/ffmpeg would slot in.

The documents text is ASCII in this dataset, so byte == char and the
DuckDB oracle can mirror the byte-histogram features exactly with
``ord(substr(...))`` list comprehensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.io import read_table
from etl_spark.operators import multimodal

#: feature dimension for the fake extractor (bytes → byte-histogram moments)
FEATURE_DIM = 8


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize the media table: documents → (media_id, payload, meta).

    media_type cycles image/audio/video by id; duration = 10 ms per char.
    Spread to cluster width before the per-row-heavy decode stage (same
    rationale as workload_text._docs).
    """
    docs = read_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    mtype = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    meta = F.struct(
        mtype.alias("media_type"),
        F.lit("raw").alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.col("n_chars").cast("long") * 10).alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        meta.alias("meta"),
    )


def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads (Arrow-batched mapInPandas):
    byte count, content hash, and the 8-bucket byte-histogram feature
    vector (flattened to columns so the oracle hash covers every value)."""
    feats = multimodal.extract_features(media_table(spark, sf_dir), batch_dim=FEATURE_DIM)
    return feats.select(
        "media_id",
        "n_bytes",
        "content_hash",
        *[F.col("features").getItem(i).alias(f"f{i}") for i in range(FEATURE_DIM)],
    )


def mm_frame_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts) at 1 Hz
    — the explode that drives downstream decode partitioning."""
    return multimodal.frame_sample_plan(media_table(spark, sf_dir), every_ms=1000)


def mm_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over the opaque BINARY payload column — content hash of
    the raw bytes (the first pass every multimodal ingest runs before any
    decode). One map-combined shuffle on the 16-byte digest, never the
    payload; at 100 TB the shuffle carries hashes, not media."""
    media = media_table(spark, sf_dir)
    return (
        media.groupBy(F.md5("payload").alias("content_hash"))
        .agg(F.count("*").alias("n_copies"), F.min("media_id").alias("keeper_id"))
    )


def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize plumbing end-to-end (stubbed codec): filter to image
    media, fake-resize every payload to 64×64 bytes in an Arrow-batched
    ``mapInPandas``, and report the digest + dimensions of each output.

    The stub deterministically tiles the payload to width*height bytes —
    the REAL parts exercised at scale are the media-type partition
    pruning, the Arrow batch shape through Python, and the metadata
    rewrite; PIL slots into :func:`multimodal.resize_images` behind
    ``decode_stub``. Output carries md5(payload), not the payload: the
    gate (and any 100 TB audit) compares digests, never ships media."""
    media = media_table(spark, sf_dir)
    out = multimodal.resize_images(media, width=64, height=64)
    return out.select(
        "media_id",
        F.md5("payload").alias("payload_md5"),
        F.length("payload").cast("int").alias("n_bytes"),
        "width",
        "height",
    )


def mm_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity segmentation over audio payloads (X108): the
    Arrow-batched frame-energy decode
    (:func:`etl_spark.operators.multimodal.audio_frame_energies`) feeds a
    gaps-and-islands segmentation — consecutive ACTIVE frames (mean
    codepoint ≥ 97 per frame, an integer comparison) group into segments
    via the frame_idx − row_number trick, entirely in JVM window
    functions. Output: one row per voice segment with frame bounds,
    frame count, energy sum, and start offset at 200 ms/frame.

    Scale shape: media-type pruning happens BEFORE the Python stage; the
    per-payload kernel is one vectorized reduceat; segmentation shuffles
    once on media_id.
    """
    from pyspark.sql import Window

    audio = media_table(spark, sf_dir).filter(
        F.col("meta.media_type") == "audio"
    )
    frames = multimodal.audio_frame_energies(audio, frame_chars=20)
    active = frames.filter(F.col("energy") >= 97 * F.col("flen"))
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    segs = active.withColumn(
        "g", F.col("frame_idx") - F.row_number().over(w)
    )
    return (
        segs.groupBy("media_id", "g")
        .agg(
            F.min("frame_idx").alias("start_frame"),
            F.max("frame_idx").alias("end_frame"),
            F.count("*").alias("n_frames"),
            F.sum("energy").alias("sum_energy"),
        )
        .select(
            "media_id",
            "start_frame",
            "end_frame",
            "n_frames",
            "sum_energy",
            (F.col("start_frame").cast("long") * 200).alias("start_ms"),
        )
    )


def mm_image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tile image statistics (X142): each image payload rasters to a
    40×40 codepoint grid (deterministic stub codec — cycle the text),
    every 10×10 tile reduces to mean / variance / a flat-tile flag — the
    low-information-region detector an image-dedup or quality pipeline
    runs before embedding. Image-type pruning happens BEFORE the Python
    stage; the kernel is one numpy reshape per payload (integer sums out,
    mean/variance assembled JVM-side from exact ints).
    """
    media = media_table(spark, sf_dir).filter(
        (F.col("meta.media_type") == "image") & (F.length("payload") > 0)
    )
    tiles = multimodal.image_tile_stats(media, grid=40, tile=10)
    mean = F.col("s") / F.col("n_px").cast("double")
    var = F.col("s2") / F.col("n_px").cast("double") - mean * mean
    return tiles.select(
        "media_id",
        "tile_r",
        "tile_c",
        F.round(mean, 6).alias("mean_luma"),
        F.round(var, 6).alias("var_luma"),
        (var < 1.0).alias("is_flat"),
    )


def mm_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over video payloads (X143): per-frame mean
    "luma" (the generic Arrow frame-energy kernel at 40 chars/frame —
    a real frame decoder slots into the same batch shape), a cut
    wherever the mean jumps ≥ 2.0 vs the previous frame, scenes by
    cumulative cut count — completing the modality triple (audio VAD,
    image tiles, video cuts) with a real kernel each.

    Scale shape: video-type pruning before the Python stage; the cut
    logic is two JVM windows keyed on media_id (lag + running sum);
    frame means are ratios of exact integers, so the cut boundary is
    engine-deterministic.
    """
    from pyspark.sql import Window

    video = media_table(spark, sf_dir).filter(
        (F.col("meta.media_type") == "video") & (F.length("payload") > 0)
    )
    frames = multimodal.audio_frame_energies(video, frame_chars=40)
    mean = F.col("energy") / F.col("flen").cast("double")
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    cur = frames.select(
        "media_id", "frame_idx", "energy", "flen", mean.alias("m")
    ).withColumn("prev_m", F.lag("m").over(w))
    cut = F.when(
        F.col("prev_m").isNotNull() & (F.abs(F.col("m") - F.col("prev_m")) >= 2.0),
        1,
    ).otherwise(0)
    scenes = cur.withColumn(
        "scene_id",
        F.sum(cut).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        scenes.groupBy("media_id", "scene_id")
        .agg(
            F.min("frame_idx").alias("start_frame"),
            F.max("frame_idx").alias("end_frame"),
            F.count("*").alias("n_frames"),
            F.round(
                F.sum("energy") / F.sum("flen").cast("double"), 6
            ).alias("mean_energy"),
        )
        .select(
            "media_id",
            F.col("scene_id").cast("int").alias("scene_id"),
            "start_frame",
            "end_frame",
            "n_frames",
            "mean_energy",
        )
    )
