"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; decode / feature-extraction / resize /
frame-sampling run as Arrow-batched ``mapInPandas`` stages. The Spark
side (schema, partitioning, batch shape, UDF signatures) is real and
tested; the codec calls themselves are stubbed behind
:data:`DECODERS` because media libraries aren't in this environment —
swap in PIL/libav implementations by registering a decoder.

Scale notes: payload columns are the widest thing in the pipeline, so
every transform here projects metadata-only where it can (decode is the
ONLY stage that touches bytes), and batches flow through Arrow without
row-at-a-time pickling. Partition sizing: keep
``spark.sql.files.maxPartitionBytes`` small enough that a batch of
payloads fits executor memory (binary columns defeat parquet column
pruning savings when selected).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id long, modality string, mime string, width int, height int, "
    "duration_ms int, payload binary"
)

FEATURE_SCHEMA = "media_id long, modality string, n_bytes int, feature array<float>, digest string"


class DecoderNotAvailable(NotImplementedError):
    pass


def _stub_decode(payload: bytes, mime: str) -> dict:
    """Deterministic fake decode: byte-histogram 'features'. Stands in
    for PIL/libav so the distributed plumbing is fully exercisable."""
    hist = [0] * 16
    for b in payload[:4096]:
        hist[b >> 4] += 1
    total = max(sum(hist), 1)
    return {
        "feature": [h / total for h in hist],
        "digest": hashlib.md5(payload).hexdigest(),
    }


#: modality → decoder(payload, mime) -> {"feature": [...], "digest": str}
DECODERS: dict[str, Callable[[bytes, str], dict]] = {
    "image": _stub_decode,
    "audio": _stub_decode,
    "video": _stub_decode,
}


def register_decoder(modality: str, fn: Callable[[bytes, str], dict]) -> None:
    DECODERS[modality] = fn


def extract_features(df: DataFrame, batch_hint: int | None = None) -> DataFrame:
    """binary payloads → feature vectors via Arrow-batched mapInPandas.

    Input needs MEDIA_META_SCHEMA columns. Unknown modalities raise
    DecoderNotAvailable — silent skips would corrupt training sets.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, digests, sizes = [], [], []
            for payload, modality, mime in zip(
                pdf["payload"], pdf["modality"], pdf["mime"]
            ):
                decoder = DECODERS.get(modality)
                if decoder is None:
                    raise DecoderNotAvailable(
                        f"no decoder registered for modality={modality!r}"
                    )
                out = decoder(bytes(payload), mime)
                feats.append(out["feature"])
                digests.append(out["digest"])
                sizes.append(len(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pd.array(sizes, dtype="int32"),
                    "feature": feats,
                    "digest": digests,
                }
            )

    return df.select(
        "media_id", "modality", "mime", "payload"
    ).mapInPandas(run, schema=FEATURE_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only aggregation — never touches payload bytes, so the
    parquet scan prunes the binary column entirely."""
    return df.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.length("payload")).alias("total_bytes"),  # length is cheap; see note
        F.avg("width").alias("avg_width"),
        F.avg("height").alias("avg_height"),
    )


def resize_images(
    df: DataFrame, target_width: int, target_height: int
) -> DataFrame:
    """Image resize plan: payload → resized payload + updated metadata.

    The pixel work is behind :data:`DECODERS`-style stubbing (this
    environment has no imaging libs): the stub passes bytes through and
    rewrites the metadata, keeping the distributed plumbing (schema,
    Arrow batching, partition preservation) real. Swap ``_resize`` for a
    PIL implementation in production."""

    def _resize(payload: bytes, w: int, h: int) -> bytes:
        # STUB: real implementation decodes + resamples; deterministic
        # pass-through keeps tests meaningful without imaging libs
        return payload

    def run(batches):
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                _resize(bytes(p), target_width, target_height)
                for p in out["payload"]
            ]
            out["width"] = target_width
            out["height"] = target_height
            yield out

    images = df.filter(F.col("modality") == "image")
    return images.mapInPandas(run, schema=df.schema)


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: explodes sample timestamps
    JVM-side; the (stubbed) per-frame decode happens only downstream."""
    return (
        df.filter(F.col("modality") == "video")
        .withColumn(
            "frame_ms",
            F.explode(
                F.sequence(
                    F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
                )
            ),
        )
        .select("media_id", "mime", "frame_ms", "payload")
    )
