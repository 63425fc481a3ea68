"""Multimodal column plumbing (images / audio / video as opaque binary).

Codec-free formats decode FOR REAL with pure numpy: binary netpbm
images (P6 RGB / P5 gray) and RIFF/WAVE PCM16 audio — header parse,
pixel/sample statistics, histogram features. Formats that genuinely
need a codec (JPEG/PNG/MP3/MP4 — no codec libs in this container)
remain behind the documented stub: deterministic fake features so
downstream stages (similarity, dedup) stay exercisable end-to-end, or
``strict=True`` for the honest NotImplementedError.

Swap ``DecodeStub`` for a richer decoder (PIL / torchaudio / PyAV) by
overriding ``_decode`` only; `MEDIA_BATCH_SIZE` stays the knob that
keeps batch × concurrency within worker heap for multi-MB payloads.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.large_binary()),
        ("meta_width", pa.int32()),
        ("meta_height", pa.int32()),
        ("meta_duration_ms", pa.int32()),
    ]
)

# wide binary rows: keep batches small so batch × concurrency fits heap
MEDIA_BATCH_SIZE = 64


def synthesize_media_table(n: int = 64, seed: int = 42, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media rows for tests (no external data)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {
        "media_id": list(range(n)),
        "kind": [kinds[i % 3] for i in range(n)],
        "payload": [rng.bytes(payload_bytes) for _ in range(n)],
        "meta_width": [64 + (i % 8) * 16 for i in range(n)],
        "meta_height": [64 + (i % 5) * 16 for i in range(n)],
        "meta_duration_ms": [0 if i % 3 == 0 else 1000 + i for i in range(n)],
    }
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


def synthesize_decodable_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic REAL payloads (P6 gradients, P5 checkerboards, WAV
    sines) with closed-form statistics, so decode tests can assert exact
    pixel/sample values rather than plumbing shape alone."""
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        m = i % 3
        if m == 0:  # P6 RGB horizontal gradient
            w, h = 32 + (i % 4) * 16, 24 + (i % 3) * 8
            ramp = np.linspace(0, 255, w).astype(np.uint8)
            img = np.stack(
                [np.tile(ramp, (h, 1)),
                 np.tile(ramp[::-1], (h, 1)),
                 np.full((h, w), (i * 7) % 256, np.uint8)], axis=2
            )
            payload, kind, dur = encode_ppm(img), "image", 0
        elif m == 1:  # P5 gray checkerboard (mean exactly 127.5)
            w = h = 16 + (i % 5) * 8
            yy, xx = np.indices((h, w))
            img = np.where((yy + xx) % 2 == 0, 0, 255).astype(np.uint8)
            payload, kind, dur = encode_ppm(img), "image", 0
        else:  # WAV sine, amp 0.5, 440*k Hz
            rate = 8000
            dur_s = 0.25 + (i % 4) * 0.125
            t = np.arange(int(rate * dur_s)) / rate
            s = (0.5 * 32767 * np.sin(2 * np.pi * 440 * (1 + i % 3) * t))
            payload = encode_wav(s.astype(np.int16), rate)
            kind, dur, (w, h) = "audio", int(dur_s * 1000), (0, 0)
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["meta_width"].append(w)
        rows["meta_height"].append(h)
        rows["meta_duration_ms"].append(dur)
    return pa.Table.from_pydict(rows, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------- codecs
# Pure-numpy encode/decode for the two container formats that need no
# external codec: binary netpbm (P5/P6) and RIFF/WAVE PCM16.


def encode_ppm(arr: np.ndarray) -> bytes:
    """uint8 (h, w) → P5 gray; (h, w, 3) → P6 RGB."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        magic = b"P5"
    elif a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {a.shape}")
    h, w = a.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 → uint8 (h, w, 3); P5 → uint8 (h, w). Tolerates comment lines
    and arbitrary whitespace in the header per the netpbm spec."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm payload")
    # header = 3 whitespace-separated ints after the magic, '#' comments
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval, then raster
    w, h, maxval = vals
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    nch = 3 if magic == b"P6" else 1
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * nch, offset=pos)
    return raster.reshape((h, w, 3)) if nch == 3 else raster.reshape((h, w))


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 (n,) mono or (n, ch) → minimal RIFF/WAVE PCM16."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    ch = 1 if s.ndim == 1 else s.shape[1]
    data = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 → (int16 (n, ch) samples, sample_rate). Walks the
    chunk list, so extra chunks (LIST/fact) are skipped correctly."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, ch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            _, ch, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    if bits != 16:
        raise ValueError("only PCM16 supported")
    s = np.frombuffer(data, dtype="<i2")
    return s.reshape(-1, ch), int(rate)


_N_HIST = 16  # histogram bins in the feature layout below


def image_features(img: np.ndarray, dim: int) -> np.ndarray:
    """[tag=1, w, h, mean, std, min, max, 16-bin luma histogram, 0-pad]."""
    luma = img.astype(np.float32).mean(axis=2) if img.ndim == 3 else img.astype(np.float32)
    hist = np.histogram(luma, bins=_N_HIST, range=(0, 256))[0]
    v = np.zeros(max(dim, 7 + _N_HIST), dtype=np.float32)
    v[:7] = [1.0, img.shape[1], img.shape[0], luma.mean(), luma.std(),
             luma.min(), luma.max()]
    v[7 : 7 + _N_HIST] = hist / max(1, luma.size)
    return v[:dim]


def audio_features(samples: np.ndarray, rate: int, dim: int) -> np.ndarray:
    """[tag=2, rate, n, dur_s, rms, peak, zcr, 16-bin |amp| hist, 0-pad]."""
    x = samples.astype(np.float32).mean(axis=1) / 32768.0  # downmix
    n = len(x)
    zcr = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if n > 1 else 0.0
    hist = np.histogram(np.abs(x), bins=_N_HIST, range=(0, 1))[0]
    v = np.zeros(max(dim, 7 + _N_HIST), dtype=np.float32)
    v[:7] = [2.0, rate, n, n / rate, float(np.sqrt(np.mean(x**2))) if n else 0.0,
             float(np.abs(x).max()) if n else 0.0, zcr]
    v[7 : 7 + _N_HIST] = hist / max(1, n)
    return v[:dim]


class DecodeStub:
    """Actor-pool stage: binary payload → fixed-dim feature vector.

    Codec-free containers decode for real (netpbm P5/P6 → pixel stats,
    RIFF/WAVE PCM16 → sample stats, both pure numpy). Other payloads
    fall back to a deterministic fake feature so the pipeline shape
    stays testable — or raise honestly with ``strict=True``. A heavier
    decoder loads its codec/model in ``__init__`` (once per actor)."""

    def __init__(self, dim: int = 32, strict: bool = False):
        self.dim = dim
        self.strict = strict

    def _decode(self, payload: bytes, kind: str) -> np.ndarray:
        if payload[:2] in (b"P5", b"P6"):
            return image_features(decode_ppm(payload), self.dim)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return audio_features(*decode_wav(payload), self.dim)
        if self.strict:
            raise NotImplementedError(
                "payload is not a codec-free format (netpbm/WAV); decoding "
                "it requires an image/audio codec not present in this "
                "environment — subclass DecodeStub and override _decode"
            )
        seed = zlib.crc32(hashlib.md5(payload).digest())
        rng = np.random.RandomState(seed)
        v = rng.standard_normal(self.dim).astype(np.float32)
        return v / max(float(np.linalg.norm(v)), 1e-12)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        feats = np.stack(
            [self._decode(p, k) for p, k in zip(payloads, kinds)]
        ) if payloads else np.zeros((0, self.dim), dtype=np.float32)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), pa.float32()), self.dim
        )
        # drop the heavy payload on the way out — features flow onward,
        # bytes do not cross another stage boundary
        keep = batch.drop_columns(["payload"])
        return keep.append_column("feature", col)


def extract_features(ds, concurrency=(1, 4), dim: int = 32):
    """The canonical wide-row actor-pool stage: small batches, payload
    dropped at the stage boundary."""
    return ds.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=1,
    )


# ---------------------------------------------- real transform kernels

def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Exact nearest-neighbor resize (pure numpy index mapping) — the
    canonical pre-embedding image normalization step."""
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    yi = (np.arange(out_h) * h) // out_h
    xi = (np.arange(out_w) * w) // out_w
    return img[yi][:, xi]


def spectral_features(samples: np.ndarray, rate: int) -> dict:
    """FFT spectral shape of a PCM16 clip (downmixed): centroid,
    85%-energy rolloff, bandwidth — the audio-quality triage features.
    Pure numpy rfft; a pure sine's centroid/rolloff ≈ its frequency
    (closed-form-tested)."""
    x = samples.astype(np.float32)
    if x.ndim == 2:
        x = x.mean(axis=1)
    x = x / 32768.0
    n = len(x)
    if n == 0:
        return {"centroid_hz": 0.0, "rolloff_hz": 0.0, "bandwidth_hz": 0.0}
    mag = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    tot = float(mag.sum())
    if tot <= 0:
        return {"centroid_hz": 0.0, "rolloff_hz": 0.0, "bandwidth_hz": 0.0}
    centroid = float((freqs * mag).sum() / tot)
    cum = np.cumsum(mag)
    rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * tot))])
    bandwidth = float(np.sqrt(((freqs - centroid) ** 2 * mag).sum() / tot))
    return {"centroid_hz": centroid, "rolloff_hz": rolloff,
            "bandwidth_hz": bandwidth}


def encode_frames(frames: list[np.ndarray]) -> bytes:
    """Codec-free "video": back-to-back P6 frames in one payload."""
    return b"".join(encode_ppm(f) for f in frames)


def iter_frames(payload: bytes):
    """Walk a concatenated-netpbm payload frame by frame."""
    pos = 0
    while pos < len(payload):
        if payload[pos:pos + 2] not in (b"P5", b"P6"):
            raise ValueError(f"bad frame magic at {pos}")
        frame = decode_ppm(payload[pos:])
        nch = 3 if payload[pos:pos + 2] == b"P6" else 1
        # re-find the raster offset to advance (same header walk)
        p, vals = pos + 2, []
        while len(vals) < 3:
            while payload[p:p + 1].isspace():
                p += 1
            if payload[p:p + 1] == b"#":
                while payload[p] != 0x0A:
                    p += 1
                continue
            s = p
            while not payload[p:p + 1].isspace():
                p += 1
            vals.append(int(payload[s:p]))
        p += 1
        pos = p + vals[0] * vals[1] * nch
        yield frame


def sample_frames(payload: bytes, stride: int) -> list[np.ndarray]:
    """Every stride-th frame (frame 0 always included) — the
    frame-sampling step before per-frame embedding."""
    return [f for i, f in enumerate(iter_frames(payload))
            if i % stride == 0]


class TransformMedia:
    """Actor-pool stage: decode → REAL numpy transform → compact row.
    Images: nearest-neighbor resize to (out_h, out_w), re-encoded PPM
    size + resized luma mean. Audio: FFT spectral centroid/rolloff/
    bandwidth. Video (concatenated P6 frames): sample every
    ``frame_stride``-th frame, mean per-frame luma of the sample.
    Non-codec-free payloads follow DecodeStub's contract (deterministic
    fake row, or strict=True honest failure)."""

    def __init__(self, out_h: int = 16, out_w: int = 16,
                 frame_stride: int = 4, strict: bool = False):
        self.out_h, self.out_w = out_h, out_w
        self.stride = frame_stride
        self.strict = strict

    def _row(self, payload: bytes, kind: str) -> tuple:
        if kind == "video" and payload[:2] == b"P6":
            frames = sample_frames(payload, self.stride)
            luma = float(np.mean([f.mean() for f in frames]))
            return ("video", len(frames), 0.0, 0.0, round(luma, 4))
        if payload[:2] in (b"P5", b"P6"):
            img = resize_nearest(decode_ppm(payload), self.out_h, self.out_w)
            out = encode_ppm(img)
            return ("image", len(out), 0.0, 0.0,
                    round(float(img.astype(np.float64).mean()), 4))
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            sp = spectral_features(*decode_wav(payload))
            return ("audio", 0, round(sp["centroid_hz"], 2),
                    round(sp["rolloff_hz"], 2), 0.0)
        if self.strict:
            raise NotImplementedError(
                "payload needs a codec absent from this environment")
        seed = zlib.crc32(hashlib.md5(payload).digest())
        return ("opaque", int(seed % 1000), 0.0, 0.0, 0.0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [self._row(p, k) for p, k in
                zip(batch["payload"].to_pylist(), batch["kind"].to_pylist())]
        kinds = [r[0] for r in rows]
        return pa.table({
            "media_id": batch["media_id"],
            "kind": pa.array(kinds, pa.string()),
            "out_units": pa.array([r[1] for r in rows], pa.int64()),
            "centroid_hz": pa.array([r[2] for r in rows], pa.float64()),
            "rolloff_hz": pa.array([r[3] for r in rows], pa.float64()),
            "mean_luma": pa.array([r[4] for r in rows], pa.float64()),
        })


def transform_media(ds, out_h: int = 16, out_w: int = 16,
                    frame_stride: int = 4, concurrency=(1, 4)):
    """Resize / spectral / frame-sample over a media table — small
    batches, payload dropped at the stage boundary."""
    return ds.map_batches(
        TransformMedia,
        fn_constructor_kwargs={"out_h": out_h, "out_w": out_w,
                               "frame_stride": frame_stride},
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_SIZE,
        concurrency=concurrency,
        num_cpus=1,
    )


def synthesize_video_table(n: int = 16, seed: int = 7,
                           frames: int = 9, size: int = 24) -> pa.Table:
    """Deterministic codec-free 'videos': concatenated P6 frames."""
    rng = np.random.RandomState(seed)
    rows = {"media_id": [], "kind": [], "payload": [],
            "meta_width": [], "meta_height": [], "meta_duration_ms": []}
    for i in range(n):
        fs = [rng.randint(0, 256, (size, size, 3)).astype(np.uint8)
              for _ in range(frames)]
        rows["media_id"].append(i)
        rows["kind"].append("video")
        rows["payload"].append(encode_frames(fs))
        rows["meta_width"].append(size)
        rows["meta_height"].append(size)
        rows["meta_duration_ms"].append(frames * 40)
    return pa.table(rows, schema=MEDIA_SCHEMA)
