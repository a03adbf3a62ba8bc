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

    Per-payload dispatch (round-2 fix — round 1 called the fake decoder
    unconditionally):

    - binary PPM (``P6`` magic): REAL decode, pure numpy header+raster
      parse — no external deps needed.
    - anything else: PIL when importable (absent in this container), else
      the deterministic fake; ``strict=True`` raises NotImplementedError
      instead of faking.

    The embedding is a mean-pooled grayscale grid (sqrt(dim) x sqrt(dim))
    for real decodes — enough for downstream dedup/ANN plumbing tests.
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

    def _grid_embedding(self, gray: np.ndarray) -> np.ndarray:
        """Mean-pool a (h, w) grayscale image onto a fixed grid."""
        g = max(1, int(np.sqrt(self.embedding_dim)))
        h, w = gray.shape
        ys = np.linspace(0, h, g + 1).astype(np.int64)
        xs = np.linspace(0, w, g + 1).astype(np.int64)
        out = np.zeros(self.embedding_dim, dtype=np.float32)
        k = 0
        for i in range(g):
            for j in range(g):
                cell = gray[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)]
                out[k] = float(cell.mean()) / 255.0
                k += 1
        return out

    def _decode_ppm(self, payload: bytes) -> tuple[int, int, int, np.ndarray]:
        """Binary PPM (P6): ASCII header (w h maxval, # comments allowed),
        single whitespace, then h*w*3 raw bytes."""
        pos = 2  # past b"P6"
        fields: list[int] = []
        n = len(payload)
        while len(fields) < 3:
            while pos < n and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                while pos < n and payload[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < n and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # exactly one whitespace byte after maxval
        w, h, maxval = fields
        if maxval > 255:
            raise ValueError("16-bit PPM not supported")
        raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        rgb = raster.reshape(h, w, 3).astype(np.float32)
        gray = rgb.mean(axis=2)
        return w, h, 3, self._grid_embedding(gray)

    def _decode_pillow(self, payload: bytes) -> tuple[int, int, int, np.ndarray]:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(payload)).convert("RGB")
        arr = np.asarray(img, dtype=np.float32)
        return img.width, img.height, 3, self._grid_embedding(arr.mean(axis=2))

    def _decode_one(self, payload: bytes) -> tuple[int, int, int, np.ndarray, str]:
        if payload[:2] == b"P6":
            try:
                return (*self._decode_ppm(payload), "ppm")
            except Exception:
                # malformed header / truncated raster with a P6 magic: fall
                # through to pillow/fake like the WAV path does, so one bad
                # payload cannot fail the whole batch task (strict still
                # raises below when no real decoder applies)
                pass
        if self.backend == "pillow":
            return (*self._decode_pillow(payload), "pillow")
        if self.strict:
            raise NotImplementedError(
                "no real decoder for this payload (PIL absent, not PPM); "
                "run with strict=False for the deterministic fake"
            )
        return (*self._decode_fake(payload), "fake")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        rows = {"media_id": batch["media_id"], "width": [], "height": [],
                "channels": [], "embedding": [], "decoder": []}
        for p in payloads:
            w, hgt, c, emb, dec = self._decode_one(p or b"")
            rows["width"].append(w)
            rows["height"].append(hgt)
            rows["channels"].append(c)
            rows["embedding"].append(emb.tolist())
            rows["decoder"].append(dec)
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
    """Actor-pool stage: decode audio + sample fixed frames.

    Per-payload dispatch: PCM16 WAV (RIFF/WAVE magic) gets a REAL pure-numpy
    decode (RIFF chunk walk -> fmt + data -> int16 samples -> per-frame RMS
    energy); other formats use soundfile when importable (absent here), else
    the deterministic fake; ``strict=True`` raises instead of faking."""

    def __init__(self, n_frames: int = 8, strict: bool = False):
        self.n_frames = n_frames
        self.strict = strict
        try:
            import soundfile  # noqa: F401

            self.backend = "soundfile"
        except ImportError:
            self.backend = "fake"

    def _decode_wav(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        """(sample_rate, n_samples, frame_energy) for a PCM16 RIFF WAV."""
        import struct

        pos = 12  # past RIFF<size>WAVE
        rate, n_channels, bits = None, 1, 16
        data = None
        while pos + 8 <= len(payload):
            cid, csize = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
            body = pos + 8
            if cid == b"fmt ":
                fmt, n_channels, rate = struct.unpack_from("<HHI", payload, body)[:3]
                bits = struct.unpack_from("<H", payload, body + 14)[0]
                if fmt != 1 or bits != 16:
                    raise ValueError(f"only PCM16 WAV supported (fmt={fmt}, bits={bits})")
            elif cid == b"data":
                data = payload[body : body + csize]
            pos = body + csize + (csize & 1)  # chunks are word-aligned
        if rate is None or data is None:
            raise ValueError("WAV missing fmt/data chunk")
        samples = np.frombuffer(data, dtype=np.int16).astype(np.float32) / 32768.0
        if n_channels > 1:
            samples = samples.reshape(-1, n_channels).mean(axis=1)
        n = len(samples)
        bounds = np.linspace(0, n, self.n_frames + 1).astype(np.int64)
        energy = np.zeros(self.n_frames, dtype=np.float32)
        for i in range(self.n_frames):
            seg = samples[bounds[i] : bounds[i + 1]]
            if len(seg):
                energy[i] = float(np.sqrt(np.mean(seg * seg)))
        return int(rate), n, energy

    def _frame_energy(self, samples: np.ndarray) -> np.ndarray:
        """Per-frame RMS over n_frames equal slices (shared by both real
        decoders)."""
        n = len(samples)
        bounds = np.linspace(0, n, self.n_frames + 1).astype(np.int64)
        energy = np.zeros(self.n_frames, dtype=np.float32)
        for i in range(self.n_frames):
            seg = samples[bounds[i] : bounds[i + 1]]
            if len(seg):
                energy[i] = float(np.sqrt(np.mean(seg * seg)))
        return energy

    def _decode_soundfile(self, payload: bytes) -> tuple[int, int, np.ndarray]:
        import io

        import soundfile

        samples, rate = soundfile.read(io.BytesIO(payload), dtype="float32")
        if samples.ndim > 1:
            samples = samples.mean(axis=1)
        return int(rate), len(samples), self._frame_energy(samples)

    def _decode_one(self, p: bytes) -> tuple[int, int, np.ndarray, str]:
        if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            # non-PCM16 or malformed WAVs fall through to soundfile/fake
            # (strict still raises if nothing real can decode them)
            try:
                return (*self._decode_wav(p), "wav")
            except Exception:
                pass
        if self.backend == "soundfile":
            try:
                return (*self._decode_soundfile(p), "soundfile")
            except Exception:
                if self.strict:
                    raise
        elif self.strict:
            raise NotImplementedError(
                "no real decoder for this payload (soundfile absent, not "
                "PCM WAV); run with strict=False for the deterministic fake"
            )
        h = hashlib.sha256(p).digest()
        rng = np.random.default_rng(int.from_bytes(h[8:16], "little"))
        return (
            16000,
            16000 + int.from_bytes(h[:3], "little"),
            np.abs(rng.standard_normal(self.n_frames)).astype(np.float32),
            "fake",
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        rates, samples, nf, energies, decs = [], [], [], [], []
        for p in payloads:
            r, ns, en, dec = self._decode_one(p or b"")
            rates.append(r)
            samples.append(ns)
            nf.append(self.n_frames)
            energies.append(np.asarray(en, dtype=np.float32).tolist())
            decs.append(dec)
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


VIDEO_FEATURES_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames_total", pa.int32()),
        ("n_frames_sampled", pa.int32()),
        ("frame_luma", pa.list_(pa.float32())),  # mean Y per sampled frame
        ("embedding", pa.list_(pa.float32())),  # grid-pooled middle frame
        ("decoder", pa.string()),
    ]
)


def synthesize_y4m(
    doc_ids: list[int], texts: list[str], width: int = 16, height: int = 12, n_frames: int = 6
) -> pa.Table:
    """REAL tiny video clips in YUV4MPEG2 (.y4m) — the uncompressed public
    container (mjpegtools/ffmpeg interchange): ASCII stream header, then
    per-frame ``FRAME\\n`` markers + raw C420 planes.  Content is
    deterministic per document (seeded luma gradients), so decode results
    are test-pinnable without any codec library."""
    payloads, mimes = [], []
    fsz = width * height + 2 * ((width // 2) * (height // 2))
    for t in texts:
        seed = hashlib.sha256((t or "").encode()).digest()
        rng = np.random.default_rng(int.from_bytes(seed[:8], "little"))
        buf = [f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420\n".encode()]
        base = rng.integers(0, 200, dtype=np.int64)
        for f in range(n_frames):
            y = ((base + 7 * f + np.arange(width * height)) % 251).astype(np.uint8)
            uv = np.full(fsz - width * height, 128, dtype=np.uint8)
            buf.append(b"FRAME\n" + y.tobytes() + uv.tobytes())
        payloads.append(b"".join(buf))
        mimes.append("video/x-yuv4mpeg")
    return pa.table(
        {
            "media_id": pa.array(list(range(len(doc_ids))), pa.int64()),
            "kind": pa.array(["video"] * len(doc_ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mimes, pa.string()),
            "source_doc": pa.array(doc_ids, pa.int64()),
        },
        schema=MEDIA_SCHEMA,
    )


class VideoFrameSampler:
    """Actor-pool stage: parse + frame-sample + feature-extract video.

    Per-payload dispatch (the ImageDecoder convention):

    - YUV4MPEG2 (``YUV4MPEG2 `` magic): REAL parse — pure numpy header +
      raw-plane walk, no codec library; C420/C444/C422 chroma layouts.
    - anything else: the deterministic fake; ``strict=True`` raises
      NotImplementedError instead of faking (a real deployment would
      slot PyAV/ffmpeg here — same seam, same schema).

    Frame-sampling: ``n_sample`` frames at evenly spaced indices over the
    clip (the standard pretraining sampling), mean luma per sampled frame,
    plus a mean-pooled grayscale grid embedding of the middle sampled
    frame (the ImageDecoder embedding shape, so video rows flow into the
    same downstream dedup/ANN plumbing)."""

    _CHROMA_FRACTION = {"C420": 2, "C420jpeg": 2, "C420paldv": 2, "C422": 1, "C444": 0}

    def __init__(self, n_sample: int = 4, embedding_dim: int = 16, strict: bool = False):
        self.n_sample = n_sample
        self.embedding_dim = embedding_dim
        self.strict = strict

    def _decode_fake(self, payload: bytes):
        h = hashlib.sha256(payload).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
        w, hh = 16 + h[0] % 48, 16 + h[1] % 48
        total = 4 + h[2] % 60
        luma = rng.uniform(0, 255, self.n_sample).astype(np.float32)
        emb = rng.standard_normal(self.embedding_dim).astype(np.float32)
        return w, hh, total, luma, emb

    def _grid_embedding(self, y: np.ndarray) -> np.ndarray:
        g = int(np.sqrt(self.embedding_dim))
        hh, ww = y.shape
        rows = np.linspace(0, hh, g + 1).astype(np.int64)
        cols = np.linspace(0, ww, g + 1).astype(np.int64)
        out = np.zeros((g, g), dtype=np.float32)
        for i in range(g):
            for j in range(g):
                cell = y[rows[i] : max(rows[i + 1], rows[i] + 1),
                         cols[j] : max(cols[j + 1], cols[j] + 1)]
                out[i, j] = float(cell.mean()) if cell.size else 0.0
        return out.ravel()[: self.embedding_dim]

    def _decode_y4m(self, payload: bytes):
        nl = payload.index(b"\n")
        header = payload[:nl].decode("ascii", "strict")
        fields = header.split(" ")
        if fields[0] != "YUV4MPEG2":
            raise ValueError("not a YUV4MPEG2 stream")
        w = h = None
        chroma = "C420"
        for f in fields[1:]:
            if f.startswith("W"):
                w = int(f[1:])
            elif f.startswith("H"):
                h = int(f[1:])
            elif f.startswith("C"):
                chroma = f
        if not w or not h:
            raise ValueError("y4m header missing W/H")
        if chroma not in self._CHROMA_FRACTION:
            raise ValueError(f"unsupported y4m chroma {chroma!r}")
        shift = self._CHROMA_FRACTION[chroma]
        y_sz = w * h
        c_sz = (w * h) >> shift if shift else w * h
        fsz = y_sz + 2 * c_sz
        data = memoryview(payload)[nl + 1 :]
        frames = []
        pos = 0
        while pos < len(data):
            fnl = bytes(data[pos : pos + 80]).index(b"\n")
            if not bytes(data[pos : pos + 5]) == b"FRAME":
                raise ValueError("corrupt y4m: missing FRAME marker")
            pos += fnl + 1
            if pos + fsz > len(data):
                raise ValueError("corrupt y4m: truncated frame")
            frames.append(
                np.frombuffer(data[pos : pos + y_sz], dtype=np.uint8).reshape(h, w)
            )
            pos += fsz
        if not frames:
            raise ValueError("y4m stream has no frames")
        total = len(frames)
        idx = np.linspace(0, total - 1, min(self.n_sample, total)).astype(np.int64)
        luma = np.asarray(
            [float(frames[i].mean()) for i in idx], dtype=np.float32
        )
        emb = self._grid_embedding(frames[int(idx[len(idx) // 2])].astype(np.float32))
        return w, h, total, luma, emb

    def _decode_one(self, payload: bytes):
        if payload[:10] == b"YUV4MPEG2 ":
            return (*self._decode_y4m(payload), "y4m")
        if self.strict:
            raise NotImplementedError(
                "no video codec available for this payload in this container "
                "(strict=True; non-strict mode substitutes a deterministic fake)"
            )
        return (*self._decode_fake(payload), "fake")

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        ws, hs, totals, sampled, lumas, embs, decs = [], [], [], [], [], [], []
        for p in payloads:
            w, h, total, luma, emb, dec = self._decode_one(p or b"")
            ws.append(w)
            hs.append(h)
            totals.append(total)
            sampled.append(len(luma))
            lumas.append(np.asarray(luma, dtype=np.float32).tolist())
            embs.append(np.asarray(emb, dtype=np.float32).tolist())
            decs.append(dec)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "n_frames_total": pa.array(totals, pa.int32()),
                "n_frames_sampled": pa.array(sampled, pa.int32()),
                "frame_luma": pa.array(lumas, pa.list_(pa.float32())),
                "embedding": pa.array(embs, pa.list_(pa.float32())),
                "decoder": pa.array(decs, pa.string()),
            },
            schema=VIDEO_FEATURES_SCHEMA,
        )


def sample_video_frames(ds: ray.data.Dataset, strict: bool = False, concurrency=(1, 4)) -> ray.data.Dataset:
    return ds.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs=dict(strict=strict),
        batch_format="pyarrow",
        batch_size=16,  # video payloads are the largest: small batches
        concurrency=concurrency,
    )


RESIZED_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("payload", pa.binary()),  # resized image, PPM P6
        ("decoder", pa.string()),
    ]
)


def _parse_ppm(payload: bytes) -> tuple[int, int, np.ndarray]:
    """(w, h, float32 RGB array) for a binary P6 PPM (comments allowed)."""
    pos = 2
    fields: list[int] = []
    n = len(payload)
    while len(fields) < 3:
        while pos < n and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < n and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return w, h, raster.reshape(h, w, 3).astype(np.float32)


def _area_resize(rgb: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Area-average (box-filter) resize to (th, tw, 3) — the standard
    downscale kernel, fully vectorized: each target pixel averages its
    (possibly fractional-free) source box via two reduceat passes."""
    h, w, _ = rgb.shape
    row_b = np.linspace(0, h, th + 1).astype(np.int64)
    col_b = np.linspace(0, w, tw + 1).astype(np.int64)
    # guard degenerate boxes when upscaling past source resolution
    row_b = np.maximum(row_b, np.arange(th + 1))[: th + 1] if th > h else row_b
    col_b = np.maximum(col_b, np.arange(tw + 1))[: tw + 1] if tw > w else col_b
    rows = np.add.reduceat(rgb, row_b[:-1], axis=0)
    rcounts = np.maximum(np.diff(row_b), 1).astype(np.float32)
    rows /= rcounts[:, None, None]
    cols = np.add.reduceat(rows, col_b[:-1], axis=1)
    ccounts = np.maximum(np.diff(col_b), 1).astype(np.float32)
    cols /= ccounts[None, :, None]
    return cols


def _write_ppm(rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    header = f"P6\n{w} {h}\n255\n".encode()
    return header + np.clip(np.rint(rgb), 0, 255).astype(np.uint8).tobytes()


class ImageResizer:
    """Actor-pool stage: resize images to a target size (thumbnailing /
    model-input normalization) — the explicit resize step of the
    decode / feature-extract / resize / frame-sample quartet.

    PPM in -> area-average downscale -> PPM out, all numpy; Pillow when
    importable for other formats (absent in this container);
    ``strict=True`` raises on undecodable payloads, else a deterministic
    fake payload of the right dimensions is emitted so the plumbing
    stays exercised end-to-end."""

    def __init__(self, width: int = 32, height: int = 32, strict: bool = False):
        if width < 1 or height < 1:
            raise ValueError("target width/height must be >= 1")
        self.width = width
        self.height = height
        self.strict = strict

    def _resize_one(self, payload: bytes) -> tuple[bytes, str]:
        if payload[:2] == b"P6":
            _, _, rgb = _parse_ppm(payload)
            return _write_ppm(_area_resize(rgb, self.width, self.height)), "ppm"
        try:
            import io

            from PIL import Image

            img = Image.open(io.BytesIO(payload)).convert("RGB")
            arr = np.asarray(img, dtype=np.float32)
            return _write_ppm(_area_resize(arr, self.width, self.height)), "pillow"
        except ImportError:
            pass
        except Exception:
            if self.strict:
                raise
        if self.strict:
            raise NotImplementedError(
                "no image codec available for this payload in this container "
                "(strict=True; non-strict mode substitutes a deterministic fake)"
            )
        h = hashlib.sha256(payload).digest()
        rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
        fake = rng.integers(0, 256, (self.height, self.width, 3)).astype(np.float32)
        return _write_ppm(fake), "fake"

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        outs, decs = [], []
        for p in payloads:
            out, dec = self._resize_one(p or b"")
            outs.append(out)
            decs.append(dec)
        n = batch.num_rows
        return pa.table(
            {
                "media_id": batch["media_id"],
                "width": pa.array([self.width] * n, pa.int32()),
                "height": pa.array([self.height] * n, pa.int32()),
                "payload": pa.array(outs, pa.binary()),
                "decoder": pa.array(decs, pa.string()),
            },
            schema=RESIZED_SCHEMA,
        )


def resize_images(
    ds: ray.data.Dataset,
    width: int = 32,
    height: int = 32,
    strict: bool = False,
    concurrency=(1, 4),
) -> ray.data.Dataset:
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs=dict(width=width, height=height, strict=strict),
        batch_format="pyarrow",
        batch_size=32,
        concurrency=concurrency,
    )
