"""Multimodal asset columns: image/audio/video as opaque ``binary`` with
typed metadata, processed by Arrow-batched ``mapInPandas``.

Not a reference capability (the reference is serde-generic over opaque
values — ``LeftJoinOnTimeoutBuilder.java:19``, its closest analog); this
is a driver-mandated pipeline extension. Design:

* **Schema convention** — an asset row is
  ``(asset_id BIGINT, media_type STRING, content BINARY, meta STRING)``
  where ``meta`` is a JSON string (O13 discipline: schema travels with
  the engine, payloads stay engine-opaque).
* **The Spark plumbing is real** — partitioned binary columns, Arrow
  batch transfer, ``mapInPandas`` with bounded batch sizes, pure
  byte-level feature extraction (length, digest, container sniffing,
  fixed-stride frame sampling) that runs identically at any scale.
* **Codec decode is stubbed** — this container has no image/audio
  libraries, so :func:`decode_image` raises ``NotImplementedError``
  unless Pillow is importable, and tests use the deterministic
  :func:`fake_decode`. The UDF signatures, schemas and batch shapes are
  what a real decoder would drop into.

Scale notes (100 TB): content bytes never pass through the driver; each
``mapInPandas`` batch holds ``maxRecordsPerBatch`` rows (Arrow default
10k — lower it for large assets via
``spark.sql.execution.arrow.maxRecordsPerBatch``). Feature extraction is
a narrow map — no shuffle; downstream joins carry digests/metadata, not
bytes (same shuffle discipline as ``operators.dedup``: 32-byte digests,
not documents).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# container magic numbers (public file-format signatures)
MAGICS: list[tuple[bytes, str]] = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"RIFF", "audio/wav"),      # RIFF container (WAV/AVI; WAVE tag at 8:12)
    (b"ID3", "audio/mp3"),
    (b"\x1aE\xdf\xa3", "video/webm"),
]

MAGIC_HEX = {m.hex().upper(): t for m, t in MAGICS}


def sniff_type(content: bytes | None) -> str:
    """Container type from the leading magic bytes; pure byte logic."""
    if content is None:
        return "unknown"
    for magic, mtype in MAGICS:
        if content[:len(magic)] == magic:
            return mtype
    return "unknown"


def extract_features(assets: DataFrame, content_col: str = "content",
                     digest_of: str = "bytes") -> DataFrame:
    """Byte-level features per asset via ``mapInPandas``: size, md5
    digest, sniffed container type. One narrow pass, no shuffle; columns
    other than ``content_col`` pass through untouched, content itself is
    dropped from the output (carry digests downstream, not bytes).

    ``digest_of="bytes"`` hashes the raw content (the real thing);
    ``"hex"`` hashes the uppercase hex encoding instead — same dedup
    power, but computable by SQL engines whose ``md5`` takes only text
    (the DuckDB oracle), so the whole operator stays hash-checkable."""
    if digest_of not in ("bytes", "hex"):
        raise ValueError(f"unknown digest_of: {digest_of!r}")
    hex_mode = digest_of == "hex"
    passthrough = [f for f in assets.schema.fields if f.name != content_col]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in passthrough]
        + ["byte_len BIGINT", "digest STRING", "sniffed_type STRING"])
    names = [f.name for f in passthrough]

    def digest(b: bytes) -> str:
        data = b.hex().upper().encode() if hex_mode else b
        return hashlib.md5(data).hexdigest()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf[content_col]
            out = pdf[names].copy()
            out["byte_len"] = [
                len(b) if b is not None else 0 for b in content]
            out["digest"] = [
                digest(b) if b is not None else None for b in content]
            out["sniffed_type"] = [sniff_type(b) for b in content]
            yield out

    return assets.mapInPandas(batches, out_schema)


def sample_frames(assets: DataFrame, frame_size: int, stride: int,
                  content_col: str = "content",
                  id_col: str = "asset_id") -> DataFrame:
    """Fixed-stride frame sampling: treat ``content`` as a sequence of
    ``frame_size``-byte frames and keep every ``stride``-th one —
    the batch-shape of video frame extraction with the codec stubbed to
    byte slicing. Output: ``(id, frame_no, frame BINARY)``, one row per
    sampled frame (flatMap via ``mapInPandas``)."""
    if frame_size <= 0 or stride <= 0:
        raise ValueError("frame_size and stride must be positive")
    id_type = assets.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, frame_no INT, frame BINARY"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, nos, frames = [], [], []
            for aid, content in zip(pdf[id_col], pdf[content_col]):
                if content is None:
                    continue
                n_frames = len(content) // frame_size
                for i in range(0, n_frames, stride):
                    ids.append(aid)
                    nos.append(i)
                    frames.append(content[i * frame_size:(i + 1) * frame_size])
            yield pd.DataFrame({id_col: ids, "frame_no": nos, "frame": frames})

    return assets.mapInPandas(batches, out_schema)


def decode_image(content: bytes):
    """Real image decode — requires Pillow, which this container does not
    ship. The gate is explicit so the stub is impossible to mistake for a
    working decoder."""
    try:
        from io import BytesIO

        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decode needs Pillow (not installed in this container); "
            "use fake_decode for deterministic tests") from e
    return Image.open(BytesIO(content))


def fake_decode(content: bytes | None) -> tuple[int, int]:
    """Deterministic stand-in decoder: (width, height) derived from the
    content digest — stable across runs/partitions, no codec needed."""
    if content is None:
        return (0, 0)
    d = hashlib.md5(content).digest()
    return (64 + d[0] % 192, 64 + d[1] % 192)


def decode_dimensions(assets: DataFrame, content_col: str = "content",
                      id_col: str = "asset_id") -> DataFrame:
    """The decode step's Spark plumbing: ``mapInPandas`` emitting
    ``(id, width, height)`` per asset using :func:`fake_decode` (swap in
    :func:`decode_image` where Pillow exists — same signature, same
    batch shape)."""
    id_type = assets.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, width INT, height INT"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = [fake_decode(b) for b in pdf[content_col]]
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "width": [w for w, _ in dims],
                "height": [h for _, h in dims],
            })

    return assets.mapInPandas(batches, out_schema)


def resize_images(assets: DataFrame, target_w: int, target_h: int,
                  content_col: str = "content",
                  id_col: str = "asset_id") -> DataFrame:
    """The resize step's Spark plumbing: ``mapInPandas`` emitting
    ``(id, width, height, resized BINARY)`` — dimensions from the decode
    stub, resized payload a deterministic byte transform sized
    proportionally to ``target_w × target_h`` (a real codec's
    decode→resample→encode drops into the same loop; signature, schema
    and Arrow batch shape are what it would use). Nulls pass through as
    null rows, mirroring decoder failure handling."""
    if target_w <= 0 or target_h <= 0:
        raise ValueError("target dimensions must be positive")
    id_type = assets.schema[id_col].dataType.simpleString()
    out_schema = (f"{id_col} {id_type}, width INT, height INT, "
                  f"resized BINARY")
    budget = target_w * target_h // 64  # stub: bytes ∝ pixel count

    def resize_stub(b: bytes) -> bytes:
        if len(b) >= budget:
            return b[:budget]
        return (b * (budget // max(len(b), 1) + 1))[:budget]

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"id": [], "w": [], "h": [], "r": []}
            for aid, content in zip(pdf[id_col], pdf[content_col]):
                rows["id"].append(aid)
                if content is None:
                    rows["w"].append(None)
                    rows["h"].append(None)
                    rows["r"].append(None)
                    continue
                w, h = fake_decode(content)
                rows["w"].append(w)
                rows["h"].append(h)
                rows["r"].append(resize_stub(content))
            yield pd.DataFrame({id_col: rows["id"], "width": rows["w"],
                                "height": rows["h"], "resized": rows["r"]})

    return assets.mapInPandas(batches, out_schema)


def documents_as_assets(docs: DataFrame) -> DataFrame:
    """Deterministic asset fixture from the driver's ``documents`` table:
    content = container magic (cycled by doc_id) + utf-8 text bytes, so
    sniffing/digesting exercise real byte paths. JVM-side expressions
    only — the binary column is built without any Python."""
    magic_hexes = list(MAGIC_HEX)
    magic = F.element_at(
        F.array(*[F.lit(h) for h in magic_hexes]),
        (F.col("doc_id") % len(magic_hexes) + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(*[F.lit(MAGIC_HEX[h]) for h in magic_hexes]),
            (F.col("doc_id") % len(magic_hexes) + 1).cast("int"),
        ).alias("media_type"),
        F.concat(F.unhex(magic), F.encode("text", "UTF-8")).alias("content"),
        F.to_json(F.struct("lang", "source", "n_chars"),
                  {"ignoreNullFields": "false"}).alias("meta"),
    )
