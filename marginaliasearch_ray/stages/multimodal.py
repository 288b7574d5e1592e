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


def _bytes_hash64(b: bytes) -> int:
    """md5_number_lower of raw bytes (unsigned, the repo's shared hash
    convention) — compared directly against DuckDB's UBIGINT."""
    from marginaliasearch_ray.stages.textstats import md5_number_lower

    return md5_number_lower(b)


class ResizeStage:
    """Actor-pool resize/transcode stage: shrink each payload to at most
    ``max_bytes`` and emit size metadata + a content hash of the result.

    Plumbing is real (actor pool, small batches, payload replaced not
    duplicated); the actual pixel-aware resample is STUBBED like
    ``DecodeStage`` — ``real_resize=True`` raises at the callsite, the
    deterministic fake truncates the byte stream (prefix bytes), which a
    DuckDB oracle recomputes exactly for text-backed payloads."""

    def __init__(self, max_bytes: int = 64, real_resize: bool = False):
        self.max_bytes = max_bytes
        self.real_resize = real_resize
        # a real implementation would initialize the codec context here

    def _resize(self, payload: bytes) -> bytes:
        if self.real_resize:
            raise NotImplementedError(
                "pixel-aware resampling requires image libraries not "
                "present in this environment; run with real_resize=False"
            )
        return (payload or b"")[: self.max_bytes]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from hashlib import md5

        payloads = batch.column("payload").to_pylist()
        resized = [self._resize(p) for p in payloads]
        out = batch.drop_columns(["payload"])
        out = out.append_column(
            "n_bytes_in",
            pa.array([len(p or b"") for p in payloads], pa.int64()),
        )
        out = out.append_column(
            "n_bytes_out", pa.array([len(r) for r in resized], pa.int64())
        )
        # content hash in the repo's md5_number_lower convention so the
        # oracle can recompute it from the source column
        out = out.append_column(
            "payload_hash",
            pa.array([_bytes_hash64(r) for r in resized], pa.uint64()),
        )
        out = out.append_column("payload", pa.array(resized, pa.binary()))
        return out


def resize_media(
    media: rd.Dataset,
    max_bytes: int = 64,
    concurrency: int = 2,
    batch_size: int = 64,
) -> rd.Dataset:
    return media.map_batches(
        ResizeStage,
        fn_constructor_kwargs={"max_bytes": max_bytes},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def frame_sample(
    media: rd.Dataset,
    frame_bytes: int = 32,
    every_n: int = 3,
    concurrency: int = 2,
    batch_size: int = 64,
) -> rd.Dataset:
    """Frame-sampling stage (the video path's explode shape): treat each
    payload as consecutive ``frame_bytes``-sized frames, keep every
    ``every_n``-th frame (0, n, 2n, ...), one OUTPUT ROW PER KEPT FRAME
    -> (media_id, frame_index, frame_len, frame_hash).

    The row explosion happens inside the batch (flat_map shape) so block
    sizes stay bounded by ``batch_size x frames/payload``; a real
    container demuxer would replace the fixed-size chunking in
    ``__init__``-held codec state, same output layout."""

    def explode(batch: pa.Table) -> pa.Table:
        ids, idxs, lens, hashes = [], [], [], []
        for mid, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            p = payload or b""
            n_frames = (len(p) + frame_bytes - 1) // frame_bytes
            for fi in range(0, n_frames, every_n):
                chunk = p[fi * frame_bytes:(fi + 1) * frame_bytes]
                ids.append(mid)
                idxs.append(fi)
                lens.append(len(chunk))
                hashes.append(_bytes_hash64(chunk))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_index": pa.array(idxs, pa.int64()),
                "frame_len": pa.array(lens, pa.int64()),
                "frame_hash": pa.array(hashes, pa.uint64()),
            }
        )

    return media.map_batches(
        explode,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
