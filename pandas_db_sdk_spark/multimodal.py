"""Multimodal columns — SURVEY §2 D7 (north-star).

Model: media are opaque `binary` payload columns traveling next to typed
metadata (a struct of modality/byte-size/checksum). Parquet stores binary
natively, partition pruning and column projection still work, and payloads
only flow through stages that touch them (column pruning drops them
elsewhere — the key to 100 TB pipelines with heavy media columns).

Decode / feature-extraction run as Arrow-batched `mapInPandas` over the
binary column. The actual image/audio codecs are NOT in this container, so
`decode_features` ships a deterministic fake decoder and `decode_real` is an
explicitly marked stub (`NotImplementedError`) documenting the intended
signature — the Spark-side plumbing (schema, batching, partition shape) is
real and tested either way.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Manufacture a binary payload column (+ typed metadata struct) from a
    text column — the test-fixture analogue of real image/audio bytes."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("text/plain").alias("modality"),
            F.octet_length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ),
    )


def decode_features(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Fake 'decode + featurize' over binary payloads via mapInPandas.

    Deterministic stand-in for an image/audio decoder: features are simple
    byte statistics, so tests can assert exact values. Batch shape, Arrow
    transfer, and output schema are identical to what a real decoder needs.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for blob in pdf[payload_col]:
                # FEATURE_DIM bucketed byte-mean "embedding" — deterministic
                # fake; bucket sums run in numpy, not a per-byte Python loop,
                # so the measured mapInPandas plumbing cost is honest.
                a = np.frombuffer(bytes(blob), dtype=np.uint8)
                n = a.size
                step = max(n // FEATURE_DIM, 1)
                bound = (min(n, step * FEATURE_DIM) // step) * step
                vec = a[:bound].reshape(-1, step).mean(axis=1, dtype=np.float64)
                out = np.zeros(FEATURE_DIM)
                out[: vec.size] = vec[:FEATURE_DIM]
                feats.append(out.tolist())
            yield pd.DataFrame({"doc_id": pdf[id_col], "n_bytes": pdf[payload_col].map(len), "features": feats})

    return df.mapInPandas(decode, f"doc_id long, n_bytes long, features array<double>")


def decode_real(df: DataFrame, payload_col: str = "payload"):
    """STUB — real media decode (PIL/librosa/av are not installed here).

    Intended contract: mapInPandas over `payload_col`, yielding
    (id, width/height or sample_rate/duration, features array<float>) with
    the same batch shape as :func:`decode_features`.
    """
    raise NotImplementedError(
        "media codecs unavailable in this environment; use decode_features "
        "(deterministic fake) — the Spark plumbing is identical"
    )


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-frame-sampling plumbing: given (doc_id, payload) pretend each
    payload is a container of frames; emit one row per sampled frame index.
    The index arithmetic is real; the frame extraction would live in the
    decoder stub."""
    n_frames = (F.octet_length("payload") / 16).cast("int")  # fake: 16 bytes/frame
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return df.select("doc_id", F.explode(idx).alias("frame_idx"))
