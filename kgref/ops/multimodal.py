"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, decoded/feature-extracted in actor-pool
``map_batches`` stages.

The container has no image/audio codecs, so the DECODE step is stubbed
(clearly marked): real formats raise ``NotImplementedError``; a
deterministic fake codec ("KGF1" header + raw bytes) exercises the
Ray-side plumbing for real — schema, per-actor decoder state, batch
sizing for large binary payloads, and feature/frames output layout are
all live and tested.

Scale notes: binary payloads dominate block bytes, so these stages run
with a SMALL ``batch_size`` (``MEDIA_BATCH``) and rely on the streaming
executor to backpressure; features are emitted as fixed-width
``list<float>`` so downstream ANN (ops.similarity) consumes them
directly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("media_type", pa.string()),  # 'image' | 'audio' | 'video'
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)

FEATURES = pa.schema(
    [
        ("doc_id", pa.int64()),
        ("media_type", pa.string()),
        ("media_bytes", pa.int64()),
        ("n_frames", pa.int32()),
        ("features", pa.list_(pa.float32(), 16)),  # byte histogram, 16 bins
    ]
)

MAGIC = b"KGF1"
FRAME_BYTES = 64
MEDIA_BATCH = 64  # small: payload bytes, not row count, bound the block


def attach_fake_media(ds):
    """Deterministically synthesize a binary media column from text
    (sha256-expanded bytes) — stands in for reading a real blob column."""

    def attach(batch: pa.Table) -> pa.Table:
        payloads, mtypes, ws, hs = [], [], [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            seed = hashlib.sha256(text.encode()).digest()
            body = (seed * ((did % 7 + 2) * 8))[: (did % 7 + 2) * 256]
            payloads.append(MAGIC + body)
            mtypes.append(("image", "audio", "video")[did % 3])
            ws.append(16 + did % 16)
            hs.append(16 + did % 8)
        return pa.Table.from_arrays(
            [batch.column("doc_id"), pa.array(mtypes, pa.string()),
             pa.array(payloads, pa.binary()),
             pa.array(ws, pa.int32()), pa.array(hs, pa.int32())],
            schema=MEDIA,
        )

    return ds.map_batches(attach, batch_format="pyarrow",
                          batch_size=MEDIA_BATCH)


class MediaFeatures:
    """Actor-pool decode + feature-extract stage.

    Real decoders would be loaded once here (``__init__`` = model/codec
    load, the reference pattern for stateful stages); the fake codec
    validates the MAGIC header and treats the body as raw samples.
    """

    def __init__(self):
        # STUB: real codec handles would be opened here (PIL/ffmpeg/...).
        self._bins = np.linspace(0, 256, 17)

    def _decode(self, payload: bytes) -> np.ndarray:
        if not payload.startswith(MAGIC):
            raise NotImplementedError(
                "real image/audio codecs are unavailable in this container; "
                "only the deterministic KGF1 fake codec is implemented"
            )
        return np.frombuffer(payload[len(MAGIC):], dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, mtypes, nbytes, nframes, feats = [], [], [], [], []
        for did, mt, payload in zip(batch.column("doc_id").to_pylist(),
                                    batch.column("media_type").to_pylist(),
                                    batch.column("payload").to_pylist()):
            body = self._decode(payload)
            hist, _ = np.histogram(body, bins=self._bins)
            total = max(1, hist.sum())
            doc_ids.append(did)
            mtypes.append(mt)
            nbytes.append(len(payload))
            # frame-sample stub: every FRAME_BYTES block is one "frame"
            nframes.append(max(1, len(body) // FRAME_BYTES) if mt == "video"
                           else 1)
            feats.append((hist / total).astype(np.float32))
        return pa.Table.from_arrays(
            [pa.array(doc_ids, pa.int64()), pa.array(mtypes, pa.string()),
             pa.array(nbytes, pa.int64()), pa.array(nframes, pa.int32()),
             pa.array(np.stack(feats).tolist() if feats else [],
                      pa.list_(pa.float32(), 16))],
            schema=FEATURES,
        )


def media_features(sf_dir: str):
    """rows-only query: documents → fake media → actor-pool features."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    media = attach_fake_media(ds)
    return media.map_batches(MediaFeatures, batch_format="pyarrow",
                             batch_size=MEDIA_BATCH, concurrency=2)


def register(q: dict, o: dict | None = None) -> None:
    q["media_features"] = media_features
