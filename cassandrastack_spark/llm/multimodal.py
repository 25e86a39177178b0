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


RESIZED_SCHEMA = (
    "media_id long, kind string, width int, height int, payload binary"
)

FRAME_SCHEMA = (
    "media_id long, frame_idx int, ts_ms long, payload binary"
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """STUB for decode -> resize -> re-encode (no codecs here).
    Deterministic fake sized like a real RGB bitmap (w*h*3 bytes tiled
    from the payload digest) so partition/file sizing behaves like the
    real thing."""
    if payload is None:
        return b""
    digest = hashlib.sha256(payload).digest()
    need = width * height * 3
    return (digest * (need // len(digest) + 1))[:need]


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Resize image payloads via Arrow-batched mapInPandas.

    Real Spark surface (schema, batch iterator, binary out); the pixel
    work is the stub above. Non-image rows pass through untouched so the
    op composes over mixed-media tables without a pre-filter scan.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                _fake_resize(p, width, height) if k == "image" else p
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [width if k == "image" else 0 for k in pdf["kind"]],
                    "height": [height if k == "image" else 0 for k in pdf["kind"]],
                    "payload": out,
                }
            )

    return media.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Sample frames from video payloads: one OUTPUT ROW PER FRAME (the
    flatMap shape — mapInPandas may yield more rows than it consumes).

    Frame count is derived from payload size (1 KiB ≈ 1 frame in the
    stub); each frame payload is a deterministic digest-derived slice.
    Real decoder contract: replace ``_fake_frame`` with an ffmpeg/pyav
    seek+decode at ``ts_ms`` — the schema and row shape don't change.
    """

    def _fake_frame(payload: bytes, idx: int) -> bytes:
        # digest over payload + ascii index: stays recomputable by any
        # engine whose sha256 takes a string (the oracle's does)
        return hashlib.sha256(payload + str(idx).encode()).digest()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, outs = [], [], [], []
            for mid, kind, p in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if kind != "video" or p is None:
                    continue
                n_frames = max(1, len(p) // 1024)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    outs.append(_fake_frame(p, i))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "ts_ms": pd.Series(tss, dtype="int64"),
                    "payload": outs,
                }
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
