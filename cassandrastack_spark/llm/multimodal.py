"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features, clearly marked) — but everything Spark-side
is real and tested: the schema (``schemas.MEDIA``), the Arrow batch
shape, the ``mapInPandas`` iterator contract, partitioning by media kind,
and the feature schema. Swapping the stub for PIL/librosa changes one
function body, no plan changes.

Scale notes: binary payloads ride in Parquet as BYTE_ARRAY; partition the
table by ``kind`` and size ``maxPartitionBytes`` down (payloads are
fat rows — fewer rows per task). ``mapInPandas`` streams Arrow batches,
so executor memory is bounded by batch size, not partition size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, sha256 string, "
    "feat_mean double, feat_dim int, frames_sampled int"
)


def _fake_decode_features(payload: bytes, kind: str) -> tuple[float, int, int]:
    """STUB for the real decoder (no PIL/torchvision/librosa in this
    container). Deterministic fake: 'features' derived from the payload
    digest. Replace with a real decode → resize → embed pipeline; the
    function signature and batch shape are the contract.
    """
    if payload is None:
        return 0.0, 0, 0
    digest = hashlib.sha256(payload).digest()
    feat_mean = int.from_bytes(digest[:4], "big") / 2**32
    feat_dim = {"image": 512, "audio": 128, "video": 768}.get(kind, 64)
    frames = 1 if kind == "image" else max(1, len(payload) // 1024)
    return feat_mean, feat_dim, frames


def extract_features(media: DataFrame) -> DataFrame:
    """Decode/feature-extract media rows via Arrow-batched mapInPandas.

    One pass over binary payloads; output is a narrow typed feature
    table (drop the payload as early as possible — never shuffle blobs).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode_features(p, k)
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "sha256": [
                        "" if p is None else hashlib.sha256(p).hexdigest()
                        for p in pdf["payload"]
                    ],
                    "feat_mean": [f[0] for f in feats],
                    "feat_dim": [f[1] for f in feats],
                    "frames_sampled": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)
