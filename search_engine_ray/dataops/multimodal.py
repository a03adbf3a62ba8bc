"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The container has no image/audio libraries, so the DECODE step is stubbed
behind an import-try (PIL/soundfile if ever present, else a clearly-marked
deterministic fake or NotImplementedError in strict mode).  Everything
Ray-side is real and tested: schemas, actor-pool signatures, batch sizing
for large binary payloads, and output layout.

Scale notes: binary payloads dominate block size — callers should lower
``batch_size`` (default 64 here) and keep ``batch_format="pyarrow"`` so
payload buffers stay zero-copy in the object store until the decode kernel
touches them.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("source_doc", pa.int64()),
    ]
)

IMAGE_FEATURES_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("embedding", pa.list_(pa.float32())),
        ("decoder", pa.string()),
    ]
)

AUDIO_FEATURES_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int64()),
        ("n_frames_sampled", pa.int32()),
        ("frame_energy", pa.list_(pa.float32())),
        ("decoder", pa.string()),
    ]
)


def synthesize_media(doc_ids: list[int], texts: list[str], kind: str = "image") -> pa.Table:
    """Deterministic fake media payloads derived from documents — lets the
    Ray-side plumbing be exercised without real codecs."""
    payloads, mimes = [], []
    for t in texts:
        seed = hashlib.sha256((t or "").encode()).digest()
        payloads.append(seed * 32)  # 1 KiB deterministic blob
        mimes.append({"image": "image/x-fake", "audio": "audio/x-fake", "video": "video/x-fake"}[kind])
    return pa.table(
        {
            "media_id": pa.array(list(range(len(doc_ids))), pa.int64()),
            "kind": pa.array([kind] * len(doc_ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
            "source_doc": pa.array(doc_ids, pa.int64()),
        },
        schema=MEDIA_SCHEMA,
    )


class ImageDecoder:
    """Actor-pool stage: decode + resize + feature-extract images.

    Real decode requires PIL (absent in this container): with
    ``strict=True`` the stage raises NotImplementedError at first batch;
    the default fake decoder derives deterministic metadata/embeddings from
    the payload bytes so downstream stages (dedup-by-embedding, ANN) run.
    """

    def __init__(self, embedding_dim: int = 16, strict: bool = False):
        self.embedding_dim = embedding_dim
        self.strict = strict
        try:
            from PIL import Image  # noqa: F401  (not installed here)

            self.backend = "pillow"
        except ImportError:
            self.backend = "fake"

    def _decode_fake(self, payload: bytes) -> tuple[int, int, int, np.ndarray]:
        h = hashlib.sha256(payload).digest()
        width = 64 + h[0] % 192
        height = 64 + h[1] % 192
        rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
        emb = rng.standard_normal(self.embedding_dim).astype(np.float32)
        return width, height, 3, emb

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.backend == "fake" and self.strict:
            raise NotImplementedError(
                "image decode requires PIL, which is not available in this "
                "environment; run with strict=False for the deterministic fake"
            )
        payloads = batch["payload"].to_pylist()
        rows = {"media_id": batch["media_id"], "width": [], "height": [],
                "channels": [], "embedding": [], "decoder": []}
        for p in payloads:
            w, hgt, c, emb = self._decode_fake(p or b"")
            rows["width"].append(w)
            rows["height"].append(hgt)
            rows["channels"].append(c)
            rows["embedding"].append(emb.tolist())
            rows["decoder"].append(self.backend)
        return pa.table(
            {
                "media_id": rows["media_id"],
                "width": pa.array(rows["width"], pa.int32()),
                "height": pa.array(rows["height"], pa.int32()),
                "channels": pa.array(rows["channels"], pa.int32()),
                "embedding": pa.array(rows["embedding"], pa.list_(pa.float32())),
                "decoder": pa.array(rows["decoder"], pa.string()),
            },
            schema=IMAGE_FEATURES_SCHEMA,
        )


class AudioFrameSampler:
    """Actor-pool stage: decode audio + sample fixed frames (stubbed decode)."""

    def __init__(self, n_frames: int = 8, strict: bool = False):
        self.n_frames = n_frames
        self.strict = strict
        try:
            import soundfile  # noqa: F401

            self.backend = "soundfile"
        except ImportError:
            self.backend = "fake"

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.backend == "fake" and self.strict:
            raise NotImplementedError("audio decode requires soundfile (absent)")
        payloads = batch["payload"].to_pylist()
        rates, samples, nf, energies, decs = [], [], [], [], []
        for p in payloads:
            h = hashlib.sha256(p or b"").digest()
            rng = np.random.default_rng(int.from_bytes(h[8:16], "little"))
            rates.append(16000)
            samples.append(16000 + int.from_bytes(h[:3], "little"))
            nf.append(self.n_frames)
            energies.append(np.abs(rng.standard_normal(self.n_frames)).astype(np.float32).tolist())
            decs.append(self.backend)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "sample_rate": pa.array(rates, pa.int32()),
                "n_samples": pa.array(samples, pa.int64()),
                "n_frames_sampled": pa.array(nf, pa.int32()),
                "frame_energy": pa.array(energies, pa.list_(pa.float32())),
                "decoder": pa.array(decs, pa.string()),
            },
            schema=AUDIO_FEATURES_SCHEMA,
        )


def decode_images(ds: ray.data.Dataset, strict: bool = False, concurrency=(1, 4)) -> ray.data.Dataset:
    return ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs=dict(strict=strict),
        batch_format="pyarrow",
        batch_size=64,  # binary payloads: keep batch x concurrency in heap
        concurrency=concurrency,
    )


def sample_audio_frames(ds: ray.data.Dataset, strict: bool = False, concurrency=(1, 4)) -> ray.data.Dataset:
    return ds.map_batches(
        AudioFrameSampler,
        fn_constructor_kwargs=dict(strict=strict),
        batch_format="pyarrow",
        batch_size=64,
        concurrency=concurrency,
    )
