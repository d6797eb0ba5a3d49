"""Multimodal columns: binary payloads + typed metadata, Arrow-batched ops.

The pattern for image/audio/video at 100 TB (SURVEY.md §2.8): media rides as
an opaque ``BINARY`` column with a typed metadata struct beside it; decode /
feature-extract / resize / frame-sample run as ``mapInPandas`` Pandas UDFs —
Arrow moves the bytes in columnar batches, Python touches each batch once,
and the surrounding plan (scan pruning, partitioning, joins on media_id)
stays pure Catalyst.

This container has no image/audio codecs, so the codec call itself is
STUBBED behind ``try``-imports (``_HAVE_PIL``): with a real codec installed
the same batch plumbing runs it; without one, decode raises
``NotImplementedError`` unless the caller opts into the deterministic fake
(used by the fixtures here). Everything around the codec — schemas, batch
iteration, binary handling, byte-level features, frame-index math — is real
and oracle-tested: ``media_byte_histograms`` must match DuckDB computing the
same histogram in SQL over the source text, which proves the Python/Arrow
binary path is byte-exact.

Fixture media derive deterministically from ``documents``: payload =
utf-8 bytes of text, kind cycles image/audio/video by doc_id, meta fields
are arithmetic on doc_id — so every derived result has a SQL twin.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_streaming_twitter_spark.catalog import table, widen
from spark_streaming_twitter_spark.registry import query

try:  # pragma: no cover - codec not in this container
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, fmt:string>"
)
_KINDS = ("image", "audio", "video")
N_HIST_BUCKETS = 16
FRAME_STRIDE = 7  # sample every 7th fake frame


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media fixtures from ``documents`` (see module doc)."""
    docs = widen(table(spark, sf_dir, "documents").select("doc_id", "text"), spark)
    meta = F.struct(
        (F.col("doc_id") % 640 + 64).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 48).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.col("doc_id") % 90 + 10).cast("int").alias("n_frames"),
        F.element_at(F.array(F.lit("png"), F.lit("wav"), F.lit("mp4")),
                     (F.col("doc_id") % 3 + 1).cast("int")).alias("fmt"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
        ).alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        meta.alias("meta"),
    )


def decode_media(df: DataFrame, allow_fake: bool = False) -> DataFrame:
    """Decode payloads to (media_id, width, height, n_bytes).

    With a real codec present this opens each payload (PIL for images);
    without one it raises unless ``allow_fake`` — the fake "decode" reads
    the dimensions from meta and the byte count from the payload, keeping
    the batch plumbing exercised end to end.
    """
    if not _HAVE_PIL and not allow_fake:
        raise NotImplementedError(
            "no image codec in this environment; pass allow_fake=True for the "
            "deterministic fixture decode"
        )

    use_real = _HAVE_PIL

    def decode(batches: Iterator) -> Iterator:
        import io

        import pandas as pd

        for pdf in batches:
            if use_real:  # pragma: no cover - codec not in this container
                dims = [Image.open(io.BytesIO(p)).size for p in pdf["payload"]]
                widths = [w for w, _ in dims]
                heights = [h for _, h in dims]
            else:
                widths = [m["width"] for m in pdf["meta"]]
                heights = [m["height"] for m in pdf["meta"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": widths,
                    "height": heights,
                    "n_bytes": [len(p) for p in pdf["payload"]],
                }
            )

    return df.mapInPandas(
        decode, "media_id long, width int, height int, n_bytes long"
    )


def byte_histograms(df: DataFrame) -> DataFrame:
    """16-bucket byte-value histogram per payload via numpy over Arrow batches.

    Codec-free and REAL: works on any binary column. Emits only non-empty
    buckets; frac = count/len is a single int/int IEEE division.
    """

    def hist(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "bucket": [], "frac": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = np.frombuffer(payload, dtype=np.uint8)
                if len(b) == 0:
                    continue
                counts = np.bincount(b >> 4, minlength=N_HIST_BUCKETS)
                for bucket in np.nonzero(counts)[0]:
                    out["media_id"].append(mid)
                    out["bucket"].append(int(bucket))
                    out["frac"].append(float(counts[bucket]) / len(b))
            yield pd.DataFrame(out)

    return df.mapInPandas(hist, "media_id long, bucket int, frac double")


def sample_frames(df: DataFrame) -> DataFrame:
    """Frame sampling for video payloads: every FRAME_STRIDE-th frame.

    The index math (which frames, byte offsets) is the real operator; the
    "frame" is a deterministic byte slice standing in for a decoded frame.
    One output row per sampled frame, exploded Arrow-side.
    """

    def sample(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [],
                "frame_idx": [],
                "frame_bytes": [],
            }
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                n = meta["n_frames"]
                size = max(len(payload) // max(n, 1), 1)
                for i in range(0, n, FRAME_STRIDE):
                    chunk = payload[i * size : (i + 1) * size]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame_bytes"].append(len(chunk))
            yield pd.DataFrame(out)

    return df.mapInPandas(
        sample, "media_id long, frame_idx int, frame_bytes long"
    )


@query(
    "media_byte_histograms",
    oracle=f"""
WITH bytes AS (
  SELECT doc_id AS media_id,
         ord(unnest(string_split(text, ''))) // 16 AS bucket,
         len(text) AS n
  FROM documents
)
SELECT media_id, CAST(bucket AS INT) AS bucket,
       CAST(count(*) AS DOUBLE) / any_value(n) AS frac
FROM bytes
GROUP BY media_id, bucket
""",
    doc="Multimodal binary-path proof: numpy byte histogram over Arrow "
    "batches of the BINARY payload must equal DuckDB's SQL histogram over "
    "the source text (fixtures are ASCII, so byte == codepoint). Pins the "
    "whole mapInPandas plumbing — batch iteration, binary transfer, "
    "int/int division — byte-exact.",
    bench=True,
)
def media_byte_histograms(spark: SparkSession, sf_dir: str) -> DataFrame:
    return byte_histograms(media_table(spark, sf_dir))


@query(
    "media_meta_stats",
    oracle="""
SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       ELSE 'video' END AS kind,
       count(*) AS n_media,
       CAST(sum(doc_id % 640 + 64) AS BIGINT) AS total_width,
       CAST(max(doc_id % 90 + 10) AS INT) AS max_frames,
       CAST(sum(len(text)) AS BIGINT) AS total_bytes
FROM documents
GROUP BY 1
""",
    doc="Typed-metadata aggregation over the media table: plain Catalyst "
    "agg on the meta struct + octet_length of the payload — the metadata "
    "side of multimodal stays fully relational (prunable, codegen'd).",
)
def media_meta_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.col("meta.width").cast("bigint")).alias("total_width"),
        F.max("meta.n_frames").alias("max_frames"),
        F.sum(F.octet_length("payload").cast("bigint")).alias("total_bytes"),
    )


@query(
    "media_frame_samples",
    oracle="""
WITH frames AS (
  SELECT doc_id AS media_id,
         unnest(generate_series(0, doc_id % 90 + 9, 7)) AS frame_idx,
         len(text) AS pl, doc_id % 90 + 10 AS nf
  FROM documents
  WHERE doc_id % 3 = 2
)
SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(CASE
         WHEN (frame_idx + 1) * greatest(pl // nf, 1) <= pl
           THEN greatest(pl // nf, 1)
         ELSE greatest(pl - frame_idx * greatest(pl // nf, 1), 0)
       END AS BIGINT) AS frame_bytes
FROM frames
""",
    doc="Video frame sampling (every 7th frame index) through mapInPandas "
    "byte-slicing; the oracle recomputes the offset arithmetic in SQL. "
    "Filter to kind='video' happens BEFORE the Python stage — Catalyst "
    "prunes the other two thirds of the payload bytes off the Arrow path.",
)
def media_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir).where(F.col("kind") == "video")
    return sample_frames(media)
