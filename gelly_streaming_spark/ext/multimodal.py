"""Multimodal (image/audio/video) column plumbing (north-star extension).

Media payloads are opaque ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so payload bytes never round-trip through the
driver and batches stay columnar end-to-end.

The decode kernels themselves are STUBBED — the image/audio libraries are
not available in this environment. ``decoder=None`` selects a
deterministic fake decoder (parses dimensions out of the payload header
bytes) so the Spark-side plumbing — schema, batching, partitioning, UDF
signatures — is real and testable; pass a real decoder callable in
production or get ``NotImplementedError`` from ``strict_decoder``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType()),
                    T.StructField("mime", T.StringType()),
                    T.StructField("bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def strict_decoder(payload: bytes, kind: str):
    raise NotImplementedError(
        "real media decoding requires image/audio libraries not present in "
        "this environment; inject a decoder callable"
    )


def fake_decoder(payload: bytes, kind: str):
    """Deterministic stand-in decoder: derives (width, height, n_frames)
    and an 8-dim feature from payload byte statistics. Keeps every
    schema/batch contract of a real decoder."""
    n = len(payload)
    w = 16 + (sum(payload[:16]) % 1024) if n else 0
    h = 16 + (sum(payload[16:32]) % 1024) if n > 16 else 0
    nf = 1 + (n % 64)
    body = payload[:256]
    feat = [float(sum(body[i::8]) % 997) for i in range(8)]
    return int(w), int(h), int(nf), feat


def synthetic_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Build a deterministic media table from the documents table (test
    harness for the plumbing; payload = utf-8 text bytes)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.lit("application/x-fake").alias("mime"),
            F.length(F.col("text").cast("binary")).cast("long").alias("bytes"),
        ).alias("meta"),
    )


def extract_features(
    media: DataFrame, decoder: Callable | None = None, batch_hint: int | None = None
) -> DataFrame:
    """Decode + feature-extract each media row via Arrow-batched
    mapInPandas. Partitioning: payloads stay where they were scanned —
    no shuffle; each task streams batches through the decoder."""
    decode = decoder or fake_decoder

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "kind": [], "width": [], "height": [],
                "n_frames": [], "feature": [],
            }
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                w, h, nf, feat = decode(bytes(payload), kind)
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["feature"].append(feat)
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plan: explode sampled frame indices per video
    (metadata-only — the per-frame decode is the stubbed kernel)."""
    feats = extract_features(media)
    return feats.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))).alias("frame_idx"),
    )
