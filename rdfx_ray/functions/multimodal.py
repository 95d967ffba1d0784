"""Multimodal span processing: decode / feature-extract stages.

Media payloads are opaque binary referenced by ``media_ref`` in the
interleaved corpus (BASELINE.json input_hint). The image/audio/video
decode libraries are NOT installed in this container, so the decode
kernel is STUBBED (clearly-marked NotImplementedError) behind a
deterministic fake used by tests — while all the Ray-side plumbing
(schema, actor-pool signature, batch sizing for wide binary rows,
output layout) is real and tested, per the round brief.
"""

from __future__ import annotations

import hashlib
from typing import Dict, Optional

import numpy as np
import pyarrow as pa

MEDIA_FEATURES_SCHEMA = pa.schema([
    pa.field("media_ref", pa.string()),
    pa.field("kind", pa.string()),
    pa.field("width", pa.int32()),
    pa.field("height", pa.int32()),
    pa.field("duration_ms", pa.int32()),
    pa.field("feature", pa.list_(pa.float32(), 8)),
])


def fetch_media_bytes(media_ref: str) -> bytes:
    """Resolve a media_ref to payload bytes. In this sandbox there is
    no media store; the deterministic fake payload is the ref's md5
    stream — swap for an object-store / Arrow-FS read in production."""
    h = hashlib.md5(media_ref.encode("utf-8")).digest()
    return h * 4  # 64 fake bytes


class MediaDecode:
    """Actor-pool decode stage for media spans.

    ``concurrency × num_cpus`` sizes the pool; ``batch_size`` must stay
    SMALL for real payloads (wide binary rows — see ray_guide
    'Memory-aware'). ``fake=True`` (default in this container) derives
    deterministic pseudo-features from the payload hash; ``fake=False``
    raises NotImplementedError at the decode call, marking exactly
    where a real decoder (PIL / torchaudio / pyav) plugs in.
    """

    def __init__(self, fake: bool = True):
        self.fake = fake

    def _decode(self, kind: str, payload: bytes) -> Dict[str, object]:
        if not self.fake:
            raise NotImplementedError(
                "Real media decoding requires an image/audio library that "
                "is not installed in this environment; run with fake=True "
                "or plug a decoder in here."
            )
        h = np.frombuffer(hashlib.md5(payload).digest(), dtype=np.uint8)
        feature = (h[:8].astype(np.float32) / 255.0).tolist()
        return {
            "width": int(64 + h[0] % 192) if kind in ("image", "video") else 0,
            "height": int(64 + h[1] % 192) if kind in ("image", "video") else 0,
            "duration_ms": int(h[2]) * 100 if kind in ("audio", "video") else 0,
            "feature": feature,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        kinds = batch.column("kind").to_pylist()
        rows = {k: [] for k in ("media_ref", "kind", "width", "height",
                                "duration_ms", "feature")}
        for ref, kind in zip(refs, kinds):
            payload = fetch_media_bytes(ref)
            d = self._decode(kind, payload)
            rows["media_ref"].append(ref)
            rows["kind"].append(kind)
            rows["width"].append(d["width"])
            rows["height"].append(d["height"])
            rows["duration_ms"].append(d["duration_ms"])
            rows["feature"].append(d["feature"])
        return pa.Table.from_pydict(rows, schema=MEDIA_FEATURES_SCHEMA)


def media_features(input_uri: str, concurrency: int = 2,
                   batch_size: int = 256):
    """Extract features for every media span of an interleaved corpus:
    read → project media spans (vectorized flatten) → decode actor
    pool. Returns a Dataset with MEDIA_FEATURES_SCHEMA."""
    import pyarrow.compute as pc
    import ray.data as rd

    from ..store.lance_shim import LanceShim

    def project_media(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans").combine_chunks()
        flat = spans.flatten()
        media_ref = flat.field("media_ref")
        kind = flat.field("kind")
        mask = pc.not_equal(media_ref, "")
        return pa.table({
            "media_ref": pc.filter(media_ref, mask),
            "kind": pc.filter(kind, mask),
        })

    ds = rd.read_parquet(LanceShim(input_uri).fragment_paths(),
                         columns=["spans"])
    media = ds.map_batches(project_media, batch_format="pyarrow",
                           batch_size=2048)
    return media.map_batches(MediaDecode, batch_format="pyarrow",
                             batch_size=batch_size, concurrency=concurrency)
