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


THUMBNAIL_SCHEMA = pa.schema([
    pa.field("media_ref", pa.string()),
    pa.field("width", pa.int32()),
    pa.field("height", pa.int32()),
    pa.field("thumbnail", pa.binary()),
])


class MediaResize:
    """Actor-pool resize stage: image/video spans → fixed-size
    thumbnail bytes. The pixel resample itself is stubbed like decode
    (``fake=False`` raises NotImplementedError where PIL/pyav plugs
    in); with the deterministic fake, the output is a real
    ``width×height×3``-byte RGB buffer derived from the payload hash —
    so the binary-column plumbing, row widths, and batch sizing are
    exactly what a real resize produces. Keep ``batch_size`` small:
    output rows are wide (w·h·3 bytes each)."""

    def __init__(self, width: int = 16, height: int = 16,
                 fake: bool = True):
        self.width = width
        self.height = height
        self.fake = fake

    def _resize(self, payload: bytes) -> bytes:
        if not self.fake:
            raise NotImplementedError(
                "Real resampling requires an image library not installed "
                "in this environment; run with fake=True or plug PIL in "
                "here.")
        n = self.width * self.height * 3
        seed = hashlib.md5(payload).digest()
        reps = (n + len(seed) - 1) // len(seed)
        return (seed * reps)[:n]

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        kinds = batch.column("kind").to_pylist()
        out = {"media_ref": [], "width": [], "height": [], "thumbnail": []}
        for ref, kind in zip(refs, kinds):
            if kind not in ("image", "video"):
                continue
            out["media_ref"].append(ref)
            out["width"].append(self.width)
            out["height"].append(self.height)
            out["thumbnail"].append(self._resize(fetch_media_bytes(ref)))
        return pa.Table.from_pydict(out, schema=THUMBNAIL_SCHEMA)


FRAME_SAMPLE_SCHEMA = pa.schema([
    pa.field("media_ref", pa.string()),
    pa.field("frame_idx", pa.int32()),
    pa.field("t_ms", pa.int32()),
    pa.field("frame_feature", pa.list_(pa.float32(), 8)),
])


class FrameSampler:
    """Actor-pool frame-sampling stage: one VIDEO span row → one
    output row per sampled frame (every ``every_ms``, capped at
    ``max_frames``) — the 1→N expansion a video pipeline needs, done
    inside map_batches so block sizes stay bounded by
    batch_size × max_frames. Frame decode is the same declared stub;
    the fake derives a deterministic per-frame feature from
    (payload, frame_idx)."""

    def __init__(self, every_ms: int = 1000, max_frames: int = 16,
                 fake: bool = True):
        self.every_ms = every_ms
        self.max_frames = max_frames
        self.fake = fake
        self.decoder = MediaDecode(fake=fake)

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        kinds = batch.column("kind").to_pylist()
        out = {"media_ref": [], "frame_idx": [], "t_ms": [],
               "frame_feature": []}
        for ref, kind in zip(refs, kinds):
            if kind != "video":
                continue
            payload = fetch_media_bytes(ref)
            meta = self.decoder._decode(kind, payload)
            n = min(self.max_frames,
                    max(1, meta["duration_ms"] // self.every_ms + 1))
            for i in range(n):
                fh = np.frombuffer(
                    hashlib.md5(payload + i.to_bytes(4, "little")).digest(),
                    dtype=np.uint8)
                out["media_ref"].append(ref)
                out["frame_idx"].append(i)
                out["t_ms"].append(i * self.every_ms)
                out["frame_feature"].append(
                    (fh[:8].astype(np.float32) / 255.0).tolist())
        return pa.Table.from_pydict(out, schema=FRAME_SAMPLE_SCHEMA)


def _media_spans(input_uri: str):
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

    return rd.read_parquet(LanceShim(input_uri).fragment_paths(),
                           columns=["spans"]) \
        .map_batches(project_media, batch_format="pyarrow", batch_size=2048)


def media_thumbnails(input_uri: str, width: int = 16, height: int = 16,
                     concurrency: int = 2, batch_size: int = 128):
    """Thumbnails for every image/video span (decode+resize actor
    pool; small batches — wide binary output rows)."""
    return _media_spans(input_uri).map_batches(
        MediaResize, fn_constructor_kwargs={"width": width,
                                            "height": height},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)


def media_frame_samples(input_uri: str, every_ms: int = 1000,
                        concurrency: int = 2, batch_size: int = 128):
    """Sampled frames for every video span (1→N expansion inside the
    actor pool)."""
    return _media_spans(input_uri).map_batches(
        FrameSampler, fn_constructor_kwargs={"every_ms": every_ms},
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
