"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed by actor-pool decode/feature stages.

The container has no image/audio libraries, so the DECODE KERNEL is
stubbed: `decode_stub=True` (default) runs a deterministic fake decode
(byte length + first/last byte checksum); `decode_stub=False` raises
NotImplementedError at the exact point a real `PIL.Image.open` /
`soundfile.read` call would go. Everything Ray-side — binary column
schema, small batch sizes for heavy rows, actor signature, output
layout — is real and tested.

At 100 TB: binary payload rows are orders of magnitude wider than
text rows, so this stage uses small `batch_size` and relies on Arrow
binary buffers end to end (never pandas object dtype).
"""

from __future__ import annotations

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


class MediaDecoder:
    """Actor-pool decode/feature stage. __init__ loads the (stubbed)
    codec once per actor; __call__ decodes a batch. Real plumbing,
    fake kernel (see module docstring)."""

    def __init__(self, decode_stub: bool = True):
        self.decode_stub = decode_stub
        # Real version would load codecs/models here, once per actor:
        # self.codec = PIL.Image / soundfile / decord.VideoReader ...

    def _decode(self, payload: bytes) -> dict:
        if not self.decode_stub:
            raise NotImplementedError(
                "real media decode requires PIL/soundfile, not in this container"
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
