"""Multimodal-column plumbing (decode/feature stages over opaque binary).

Real image/audio decoders are not available in this container, so the
decode kernel is STUBBED (SURVEY-mandated): ``DecodeStub`` either raises
``NotImplementedError`` (``real=True``) or produces a deterministic fake
decode. Everything Ray-side — the binary column, the actor-pool stage
signature, small batch sizing for large payloads, the typed metadata output
schema — is real and tested.

The synthetic binary column is derived from ``documents.text`` (UTF-8
bytes) since the driver tables carry no media; a production pipeline would
``read_parquet`` a table with a real ``payload: binary`` column unchanged.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("payload", pa.binary()),
        pa.field("media_type", pa.string()),
    ]
)


def media_dataset(sf_dir: str):
    """documents → (doc_id, payload: binary, media_type) dataset."""
    import ray.data as rd

    from ..runtime import tune_data_context

    tune_data_context()

    ds = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])

    def to_binary(batch: pa.Table) -> pa.Table:
        payload = pa.array([t.encode() for t in batch["text"].to_pylist()], pa.binary())
        kinds = pa.array(["image" if int(d) % 2 == 0 else "audio" for d in batch["doc_id"].to_pylist()])
        return pa.Table.from_arrays([batch["doc_id"], payload, kinds], schema=MEDIA_SCHEMA)

    return ds.map_batches(to_binary, batch_format="pyarrow")


class DecodeStub:
    """Actor-pool decode stage.

    ``real=True`` is the production signature (would hold the codec handle
    loaded once per actor); here it raises ``NotImplementedError`` because
    media codecs are not installed. ``real=False`` emits a deterministic
    fake decode so the downstream plumbing is exercised end-to-end.
    """

    def __init__(self, real: bool = False):
        self.real = real

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if self.real:
            raise NotImplementedError("media codecs are not available in this environment")
        rows = []
        for doc_id, payload, kind in zip(batch["doc_id"], batch["payload"], batch["media_type"]):
            digest = hashlib.md5(payload).digest()
            rows.append(
                {
                    "doc_id": int(doc_id),
                    "media_type": kind,
                    "n_bytes": len(payload),
                    "sha_prefix": digest[:8].hex(),
                    # fake decoded dimensions / duration, digest-derived
                    "width": 64 + digest[0] % 192,
                    "height": 64 + digest[1] % 192,
                    "duration_ms": int.from_bytes(digest[2:4], "little") if kind == "audio" else 0,
                }
            )
        return pd.DataFrame(rows)


def media_features(sf_dir: str):
    """decode(stub) → per-item typed metadata. Small batches on purpose:
    payload bytes x batch_size x concurrency must fit the worker heap."""
    ds = media_dataset(sf_dir)
    return ds.map_batches(
        DecodeStub, batch_format="pandas", batch_size=256, concurrency=(1, 4)
    ).sort("doc_id")
