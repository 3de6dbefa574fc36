"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; decode /
feature-extract / resize / frame-sample are Arrow-batched ``mapInPandas``
stages. The Spark-side plumbing (schemas, partitioning, UDF signatures, batch
shapes) is real and tested; the actual codec step is STUBBED behind
``decoder=`` because no image/audio library exists in this container --
``fake_decoder`` is the deterministic stand-in, and passing
``strict_decoder()`` raises NotImplementedError where a real codec would go.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def fake_decoder(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for a real codec: 'decodes' the payload into
    (width, height, n_frames, feature[16]) derived purely from the bytes.
    Same bytes -> same output, so tests are stable."""
    if payload is None:
        payload = b""
    arr = np.frombuffer(payload[:4096], dtype=np.uint8)
    if arr.size == 0:
        arr = np.zeros(1, dtype=np.uint8)
    width = int(64 + (int(arr[: min(4, arr.size)].sum()) % 512))
    height = int(64 + (int(arr[-min(4, arr.size):].sum()) % 512))
    n_frames = 1 if kind == "image" else int(1 + (arr.size % 32))
    # 16-dim "feature": histogram of byte values bucketed into 16 bins, L1-normed
    hist, _ = np.histogram(arr, bins=16, range=(0, 256))
    feat = (hist / max(1, hist.sum())).astype(np.float32)
    return {"width": width, "height": height, "n_frames": n_frames, "feature": feat.tolist()}


def strict_decoder() -> Callable[[bytes, str], dict]:
    def _raise(payload: bytes, kind: str) -> dict:
        raise NotImplementedError(
            "real media codecs (PIL/ffmpeg/torchaudio) are not available in "
            "this container; inject one here on a real cluster"
        )
    return _raise


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], dict] = fake_decoder,
    batch_size_hint: int = 256,
) -> DataFrame:
    """media table -> feature table via Arrow-batched mapInPandas. The decode
    loop is per-row inside a batch (codecs are per-payload by nature), but
    batches amortize serialization and the stage is embarrassingly parallel --
    repartition upstream if payload sizes are skewed."""
    cols = ["media_id", "kind", "payload"]
    field_names = [f.name for f in FEATURE_SCHEMA.fields]

    def _map_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf[cols].to_dict("records"):
                d = decoder(row["payload"], row["kind"])
                out.append(
                    {
                        "media_id": row["media_id"],
                        "kind": row["kind"],
                        "width": d["width"],
                        "height": d["height"],
                        "n_frames": d["n_frames"],
                        "feature": d["feature"],
                    }
                )
            yield pd.DataFrame(out, columns=field_names)

    return media.select(*cols).mapInPandas(_map_batches, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 8,
                  decoder: Callable[[bytes, str], dict] = fake_decoder) -> DataFrame:
    """Video frame sampling plumbing: one row per sampled frame index. The
    frame *content* extraction is the stubbed decode; the fan-out shape
    (1 video -> ceil(n_frames / every_n) rows) is the real contract."""
    feats = extract_features(media.filter(F.col("kind") == "video"), decoder=decoder)
    return feats.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))).alias("frame_idx"),
    )


def synthetic_media(spark, n: int = 32, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests/benches."""
    import random

    rng = random.Random(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(rng.randrange(64, 2048)))
        rows.append(
            {
                "media_id": f"m{i}",
                "kind": kind,
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "payload": payload,
                "meta": {"source": f"cam{i % 4}"},
            }
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
