"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by actor-pool decode/feature stages.

Two decode paths:

- **Real kernel**: uncompressed WAV (RIFF/PCM-16) payloads are parsed
  with pure numpy (`MediaDecoder._decode_wav`) — header fields via
  struct, samples via a zero-copy `np.frombuffer` int16 view — and
  reduced to exact integer features (count / sum / sum-of-squares),
  which the DuckDB oracle recomputes independently (`media_wav_features`).
- **Stub**: compressed formats (JPEG/MP3/H.264) need codec libraries
  the container lacks; `decode_stub=True` (default) runs a
  deterministic fake decode, `decode_stub=False` raises
  NotImplementedError at the exact point a `PIL.Image.open` /
  `soundfile.read` call would go.

At 100 TB: binary payload rows are orders of magnitude wider than
text rows, so this stage uses small `batch_size` and relies on Arrow
binary buffers end to end (never pandas object dtype).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from lakecdc.qutil import read


def to_binary_payloads(sf_dir: str) -> rd.Dataset:
    """Adapter: treat each document's utf-8 bytes as an opaque media
    payload with typed metadata (media_type, n_bytes) — the schema a
    real image/audio table would have: (doc_id, payload: binary,
    media_type: string, n_bytes: int64)."""
    ds = read(sf_dir, "documents", ["doc_id", "text"])

    def f(t: pa.Table) -> pa.Table:
        payload = pc.cast(t["text"], pa.binary())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": payload,
                "media_type": pa.array(["application/octet-stream"] * t.num_rows),
                "n_bytes": pc.cast(pc.binary_length(payload), pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def synth_wav_payloads(sf_dir: str) -> rd.Dataset:
    """Deterministic PCM-16 WAV payloads derived from (doc_id,
    n_chars): sample[i] = ((doc_id*31 + i*7919) % 65536) - 32768 over
    n = (n_chars % 256) + 16 samples, wrapped in a canonical 44-byte
    RIFF header. The formula is plain integer arithmetic, so the
    DuckDB oracle regenerates the identical samples from the parquet
    columns alone — making the REAL decode kernel oracle-checkable
    with no media files in testdata."""
    ds = read(sf_dir, "documents", ["doc_id", "n_chars"])

    def f(t: pa.Table) -> pa.Table:
        payloads = []
        for doc_id, n_chars in zip(
            t["doc_id"].to_numpy(), t["n_chars"].to_numpy()
        ):
            n = int(n_chars) % 256 + 16
            i = np.arange(n, dtype=np.int64)
            smp = ((int(doc_id) * 31 + i * 7919) % 65536 - 32768).astype("<i2")
            data = smp.tobytes()
            hdr = struct.pack(
                "<4sI4s4sIHHIIHH4sI",
                b"RIFF", 36 + len(data), b"WAVE",
                b"fmt ", 16, 1, 1, 8000, 16000, 2, 16,
                b"data", len(data),
            )
            payloads.append(hdr + data)
        payload = pa.array(payloads, type=pa.binary())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": payload,
                "media_type": pa.array(["audio/wav"] * t.num_rows),
                "n_bytes": pc.cast(pc.binary_length(payload), pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


class MediaDecoder:
    """Actor-pool decode/feature stage. __init__ loads the codec once
    per actor; __call__ decodes a batch. WAV/PCM-16 payloads get the
    REAL pure-numpy kernel; other formats hit the stub (see module
    docstring)."""

    def __init__(self, decode_stub: bool = True):
        self.decode_stub = decode_stub
        # Codecs for COMPRESSED formats would load here, once per
        # actor: PIL.Image / soundfile / decord.VideoReader ...

    @staticmethod
    def _decode_wav(payload: bytes) -> dict:
        """Real kernel: canonical RIFF/PCM-16 mono parse, numpy only."""
        if payload[8:12] != b"WAVE" or payload[12:16] != b"fmt ":
            raise ValueError("not a canonical WAVE payload")
        audio_fmt, n_ch = struct.unpack_from("<HH", payload, 20)
        bits = struct.unpack_from("<H", payload, 34)[0]
        if (audio_fmt, n_ch, bits) != (1, 1, 16):
            raise ValueError(f"unsupported WAV layout {(audio_fmt, n_ch, bits)}")
        size = struct.unpack_from("<I", payload, 40)[0]
        smp = np.frombuffer(payload, dtype="<i2", offset=44, count=size // 2).astype(
            np.int64
        )
        return {
            "n_samples": int(smp.size),
            "sum_samples": int(smp.sum()),
            "sumsq_samples": int((smp * smp).sum()),
        }

    def _decode(self, payload: bytes) -> dict:
        if payload[:4] == b"RIFF":
            try:
                w = self._decode_wav(payload)
                return {"feat_len": w["n_samples"], "feat_sum": w["sum_samples"]}
            except (ValueError, struct.error):
                pass  # RIFF-looking but not canonical WAV: treat as opaque
        if not self.decode_stub:
            raise NotImplementedError(
                "compressed media decode requires PIL/soundfile, not in this container"
            )
        # Deterministic fake: 'decoded feature' = (length, head+tail sum)
        arr = np.frombuffer(payload, dtype=np.uint8)
        return {
            "feat_len": int(arr.size),
            "feat_sum": int(arr[:16].sum() + arr[-16:].sum()) if arr.size else 0,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode(p) for p in batch["payload"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_bytes": batch["n_bytes"],
                "feat_len": pa.array([f["feat_len"] for f in feats], type=pa.int64()),
                "feat_sum": pa.array([f["feat_sum"] for f in feats], type=pa.int64()),
            }
        )


def media_features(sf_dir: str, decode_stub: bool = True) -> pd.DataFrame:
    ds = to_binary_payloads(sf_dir)
    out = ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"decode_stub": decode_stub},
        batch_format="pyarrow",
        batch_size=256,  # small: binary rows are wide
        concurrency=2,
        num_cpus=1,
    )
    return out.to_pandas()


def synth_ppm_payloads(sf_dir: str) -> rd.Dataset:
    """Deterministic P6 PPM images derived from (doc_id, n_chars):
    w = (n_chars % 12 + 4) rounded to even, h = 8; pixel byte j (over
    the w*h*3 RGB bytes) = (doc_id * 37 + j * 101) % 256. Same
    SQL-recomputable-formula trick as synth_wav_payloads."""
    ds = read(sf_dir, "documents", ["doc_id", "n_chars"])

    def f(t: pa.Table) -> pa.Table:
        payloads = []
        for doc_id, n_chars in zip(t["doc_id"].to_numpy(), t["n_chars"].to_numpy()):
            w = ((int(n_chars) % 12) + 4) // 2 * 2
            h = 8
            j = np.arange(w * h * 3, dtype=np.int64)
            px = ((int(doc_id) * 37 + j * 101) % 256).astype(np.uint8)
            payloads.append(b"P6\n%d %d\n255\n" % (w, h) + px.tobytes())
        payload = pa.array(payloads, type=pa.binary())
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": payload,
                "media_type": pa.array(["image/x-portable-pixmap"] * t.num_rows),
                "n_bytes": pc.cast(pc.binary_length(payload), pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _parse_ppm(payload: bytes) -> np.ndarray:
    """Real kernel: binary P6 parse, numpy only -> (h, w, 3) uint8."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header: magic, whitespace-separated w h maxval, single whitespace
    parts = payload.split(maxsplit=4)
    w, h, maxval = int(parts[1]), int(parts[2]), int(parts[3])
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    off = len(payload) - w * h * 3
    return np.frombuffer(payload, dtype=np.uint8, offset=off).reshape(h, w, 3)


class PpmFeatures:
    """Actor-pool image stage: real P6 decode -> exact integer
    features + a 2x2 box-downsample (the resize step), reported as the
    downsampled image's pixel sum so the whole decode->resize path is
    value-checked."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {k: [] for k in ("width", "height", "sum_pixels", "resized_sum")}
        for p in batch["payload"].to_pylist():
            img = _parse_ppm(p).astype(np.int64)
            h, w, _ = img.shape
            small = (
                img.reshape(h // 2, 2, w // 2, 2, 3).sum(axis=(1, 3)) // 4
            )  # 2x2 box mean, floor
            rows["width"].append(w)
            rows["height"].append(h)
            rows["sum_pixels"].append(int(img.sum()))
            rows["resized_sum"].append(int(small.sum()))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                **{k: pa.array(v, type=pa.int64()) for k, v in rows.items()},
            }
        )


def media_image_features(sf_dir: str) -> pd.DataFrame:
    """Synthesize PPM payloads -> REAL numpy decode -> 2x2 box resize
    -> exact features; decode features oracle-checked (SQL regenerates
    pixels from (doc_id, n_chars)); the resize sum is checked by
    pytest against a numpy reference."""
    ds = synth_ppm_payloads(sf_dir)
    out = ds.map_batches(
        PpmFeatures,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=2,
        num_cpus=1,
    )
    return out.to_pandas()


class FrameSampler:
    """Video plumbing: payload = concatenated raw RGB frames (the
    decoded representation a real decoder would emit). The stage
    samples every k-th frame and emits per-sampled-frame features —
    the frame-sample pattern for video corpora. Pure numpy."""

    def __init__(self, frame_w: int, frame_h: int, every: int = 2):
        self.frame_bytes = frame_w * frame_h * 3
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, frame_idx, frame_sums = [], [], []
        for doc_id, p in zip(
            batch["doc_id"].to_pylist(), batch["payload"].to_pylist()
        ):
            arr = np.frombuffer(p, dtype=np.uint8)
            n_frames = arr.size // self.frame_bytes
            frames = arr[: n_frames * self.frame_bytes].reshape(
                n_frames, self.frame_bytes
            )
            sel = np.arange(0, n_frames, self.every)
            sums = frames[sel].sum(axis=1, dtype=np.int64)
            doc_ids.extend([doc_id] * len(sel))
            frame_idx.extend(sel.tolist())
            frame_sums.extend(sums.tolist())
        return pa.table(
            {
                "doc_id": pa.array(doc_ids),
                "frame": pa.array(frame_idx, type=pa.int64()),
                "frame_sum": pa.array(frame_sums, type=pa.int64()),
            }
        )


class WavFeatures(MediaDecoder):
    """Real-kernel feature stage: WAV parse -> exact integer features."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [self._decode_wav(p) for p in batch["payload"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_samples": pa.array(
                    [f["n_samples"] for f in feats], type=pa.int64()
                ),
                "sum_samples": pa.array(
                    [f["sum_samples"] for f in feats], type=pa.int64()
                ),
                "sumsq_samples": pa.array(
                    [f["sumsq_samples"] for f in feats], type=pa.int64()
                ),
            }
        )


def media_wav_features(sf_dir: str) -> pd.DataFrame:
    """Synthesize WAV payloads -> REAL numpy decode -> exact features;
    oracle-checked (the SQL regenerates the samples from (doc_id,
    n_chars) with the same integer formula)."""
    ds = synth_wav_payloads(sf_dir)
    out = ds.map_batches(
        WavFeatures,
        batch_format="pyarrow",
        batch_size=256,  # small: binary rows are wide
        concurrency=2,
        num_cpus=1,
    )
    return out.to_pandas()
