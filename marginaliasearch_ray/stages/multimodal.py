"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
``media_type`` metadata column.  Decode / feature-extraction are
actor-pool ``map_batches`` stages whose Ray-side plumbing (schema, batch
sizing for large payloads, actor signature, output layout) is real and
tested; the actual codec calls are STUBBED — the image/audio libraries
are not available in this environment.  ``DecodeStage(real_decode=True)``
raises ``NotImplementedError`` at the decode callsite; the default
deterministic fake derives features from the raw bytes so pipelines are
end-to-end verifiable.
"""

from __future__ import annotations



import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("media_type", pa.string()),  # e.g. image/png, audio/wav
        ("payload", pa.binary()),
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
    ]
)


class DecodeStage:
    """Actor-pool stage: decode binary payloads and emit fixed-size features.

    Use small ``batch_size`` (payloads are large) and
    ``concurrency=N, num_cpus=c`` sized to the node; the per-actor
    ``__init__`` is where a real codec/model would be loaded once.
    """

    def __init__(self, real_decode: bool = False, feature_dim: int = 4):
        self.real_decode = real_decode
        self.feature_dim = feature_dim  # md5 fake supports up to 4
        # real implementation would load codecs/models here, once per actor

    def _decode(self, payload: bytes, media_type: str) -> np.ndarray:
        if self.real_decode:
            raise NotImplementedError(
                "real image/audio decoding requires codec libraries not "
                "present in this environment; run with real_decode=False "
                "for the deterministic fake"
            )
        # deterministic fake: feature vector from the md5 of the bytes —
        # md5 specifically so a DuckDB oracle can recompute the features
        # (f_j = little-endian uint32 j of the digest, scaled to [0,1))
        from hashlib import md5

        h = md5(payload or b"").digest()
        return (
            np.frombuffer(h, dtype="<u4")[: self.feature_dim].astype(np.float64)
            / np.float64(2**32)
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        types = batch.column("media_type").to_pylist()
        n_bytes = np.array([len(p or b"") for p in payloads], dtype=np.int64)
        feats = np.stack(
            [self._decode(p, t) for p, t in zip(payloads, types)]
        )
        out = batch.drop_columns(["payload"])  # payload consumed; don't re-ship
        out = out.append_column("n_bytes", pa.array(n_bytes, pa.int64()))
        out = out.append_column(
            "features",
            pa.array([row.tolist() for row in feats], pa.list_(pa.float64())),
        )
        return out


def decode_media(
    media: rd.Dataset,
    concurrency: int = 2,
    batch_size: int = 64,
    real_decode: bool = False,
) -> rd.Dataset:
    """The standard multimodal decode pipeline shape."""
    return media.map_batches(
        DecodeStage,
        fn_constructor_kwargs={"real_decode": real_decode},
        batch_format="pyarrow",
        batch_size=batch_size,  # small: payloads are large binaries
        concurrency=concurrency,
        num_cpus=1,
    )


def documents_as_media(docs: rd.Dataset) -> rd.Dataset:
    """Adapter used by tests/bench: wrap the documents table's text bytes
    as a fake binary media column with the standard schema."""

    def wrap(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        payloads = [(t or "").encode("utf-8") for t in texts]
        return pa.table(
            {
                "media_id": batch.column("doc_id"),
                "media_type": pa.array(["text/plain"] * len(texts), pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "meta_width": pa.array([0] * len(texts), pa.int32()),
                "meta_height": pa.array([0] * len(texts), pa.int32()),
            }
        )

    return docs.map_batches(wrap, batch_format="pyarrow")
