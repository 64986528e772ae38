"""Multimodal columns: binary media payloads with typed metadata.

Charter surface: image/audio/video as opaque ``binary`` columns flowing
through Spark, with decode / feature-extract / frame-sample implemented
as Arrow-batched ``mapInPandas`` stages.  The Spark-side plumbing —
schema, batch shape, partition behavior — is real and tested; the
*codec* step is stubbed (this container has no image/audio libraries):

- with Pillow/soundfile installed, ``decode_image_batch`` uses them;
- otherwise a clearly-marked deterministic fake parses our own
  ``FAKEIMG`` header format (see :func:`attach_fake_media`), keeping
  every downstream stage (resize math, feature vectors, batching)
  exercisable end-to-end.

Scale design: media bytes never leave the executor as Python objects —
each ``mapInPandas`` batch receives an Arrow record batch, processes
``binary`` cells in-loop, and emits only compact features.  The decode
stage is the natural GPU/accelerator boundary in a real pipeline.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of :func:`extract_media_features`.
MEDIA_FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, width int, height int,"
    " n_channels int, mean_luma double, ok boolean, error string"
)

_MAGIC = b"FAKEIMG1"


def _try_real_decoder():
    try:  # real path, if the env ever provides it
        import PIL.Image  # noqa: F401

        return PIL.Image
    except ImportError:
        return None


def encode_fake_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic stand-in payload: 8-byte magic, dims, then a
    seeded byte pattern standing in for pixel data (1 channel)."""
    body_len = width * height
    header = _MAGIC + struct.pack("<iii", width, height, seed)
    body = bytes(((i * 31 + seed) % 251) for i in range(body_len))
    return header + body


def _decode_real(pil_image_module, payload: bytes):
    """Decode a real image via Pillow: (width, height, channels,
    mean luma of the L-converted image).  Pure-PIL (histogram mean),
    no numpy round trip per row."""
    import io as _io

    with pil_image_module.open(_io.BytesIO(payload)) as img:
        w, h = img.size
        channels = len(img.getbands())
        hist = img.convert("L").histogram()
        total = sum(hist)
        luma = (
            sum(i * c for i, c in enumerate(hist)) / total if total else 0.0
        )
    return w, h, channels, luma


def _decode_fake(payload: bytes):
    if payload[:8] != _MAGIC:
        raise ValueError("not a FAKEIMG payload")
    w, h, seed = struct.unpack("<iii", payload[8:20])
    body = payload[20:20 + w * h]
    return w, h, 1, (sum(body) / len(body)) if body else 0.0


def _le32_hex(col):
    """Hex of a 32-bit little-endian int (mirrors struct.pack('<i'))."""
    return F.concat(
        *[
            F.lpad(F.hex(F.shiftright(col, s).bitwiseAND(F.lit(255))), 2, "0")
            for s in (0, 8, 16, 24)
        ]
    )


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic binary media column from ``documents`` —
    the testdata has no media table, so the payload is synthesized
    (content-addressed by doc_id) to exercise the binary plumbing.

    Byte-identical to ``encode_fake_image(w, h, pmod(doc_id, 2^31-1))``
    but built from pure column expressions (hex assembly + unhex): no
    Python UDF, so payload generation is JVM-side and costs no Python
    workers.  All modular arithmetic uses ``pmod`` (SQL ``%`` returns
    negative values for negative operands where Python's does not) and
    the seed is bounded into int32 range so the little-endian header
    packing never truncates.
    """
    seed = F.pmod(F.col("doc_id"), F.lit(2147483647))
    base = docs.select(
        F.col("doc_id"),
        seed.alias("seed"),
        (F.pmod(F.col("doc_id"), F.lit(16)) + 4).cast("int").alias("w"),
        (F.pmod(F.col("doc_id"), F.lit(8)) + 4).cast("int").alias("h"),
    )
    header_hex = F.concat(
        F.lit(_MAGIC.hex().upper()),
        _le32_hex(F.col("w")),
        _le32_hex(F.col("h")),
        _le32_hex(F.col("seed").cast("int")),
    )
    body_hex = F.expr(
        "array_join(transform(sequence(0, w * h - 1),"
        " i -> lpad(hex(pmod(i * 31 + seed, 251)), 2, '0')), '')"
    )
    return base.select(
        "doc_id",
        F.lit("image").alias("media_type"),
        F.unhex(F.concat(header_hex, body_hex)).alias("payload"),
    )


def decode_image_batch(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """``mapInPandas`` stage: binary payload → (dims, channels, luma).

    Real decode (Pillow) when available; FAKEIMG fake otherwise; any
    per-row failure is captured in (ok, error) instead of failing the
    task — at 100 TB a corrupt blob must never kill a 4-hour stage.
    """
    real = _try_real_decoder()
    for pdf in pdfs:
        out = {
            "doc_id": pdf["doc_id"],
            "media_type": pdf["media_type"],
            "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
            "width": [], "height": [], "n_channels": [],
            "mean_luma": [], "ok": [], "error": [],
        }
        for payload in pdf["payload"]:
            try:
                if payload is None:
                    raise ValueError("null payload")
                if payload[:8] != _MAGIC:
                    if real is None:
                        raise NotImplementedError(
                            "real image decode requires Pillow, which this"
                            " environment does not provide"
                        )
                    w, h, c, luma = _decode_real(real, bytes(payload))
                else:
                    w, h, c, luma = _decode_fake(bytes(payload))
                out["width"].append(w); out["height"].append(h)
                out["n_channels"].append(c); out["mean_luma"].append(luma)
                out["ok"].append(True); out["error"].append(None)
            except Exception as e:  # noqa: BLE001 — per-row isolation
                out["width"].append(0); out["height"].append(0)
                out["n_channels"].append(0); out["mean_luma"].append(0.0)
                out["ok"].append(False); out["error"].append(str(e))
        yield pd.DataFrame(out)


def extract_media_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract over a (doc_id, media_type, payload)
    DataFrame.  Arrow-batched; output is compact typed features."""
    return media.mapInPandas(decode_image_batch, MEDIA_FEATURE_SCHEMA)


def sample_video_frames(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sampling plumbing: explode a video payload into frame
    rows.  Codec is stubbed — frames are synthesized indices with the
    payload sliced per frame, demonstrating the fan-out schema
    (`doc_id, frame_idx, frame_payload`) a real ffmpeg-backed UDF
    would fill."""
    n_frames = (F.length("payload") / 1024).cast("int") + 1
    idx = F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_nth)))
    return media.select("doc_id", idx.alias("frame_idx"), "payload").select(
        "doc_id",
        "frame_idx",
        F.expr("substring(payload, frame_idx * 64 + 1, 64)").alias("frame_payload"),
    )
