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


_AUD_MAGIC = b"FAKEAUD1"

#: Output schema of :func:`extract_audio_features`.
AUDIO_FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, sample_rate int, n_samples int,"
    " duration_ms double, rms double, zero_crossings int, peak int,"
    " ok boolean, error string"
)


def _try_real_audio_decoder():
    try:  # real path, if the env ever provides it
        import soundfile  # noqa: F401

        return soundfile
    except ImportError:
        return None


def encode_fake_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    """Deterministic stand-in payload: 8-byte magic, rate/length/seed
    header, then seeded bytes standing in for 8-bit PCM samples."""
    header = _AUD_MAGIC + struct.pack("<iii", sample_rate, n_samples, seed)
    body = bytes(((i * 17 + seed) % 256) for i in range(n_samples))
    return header + body


def attach_fake_audio(docs: DataFrame) -> DataFrame:
    """Audio twin of :func:`attach_fake_media`: a deterministic binary
    payload per document, byte-identical to ``encode_fake_audio(
    8000 + pmod(doc_id,4)*4000, (pmod(doc_id,32)+8)*4, pmod(doc_id,
    2^31-1))``, assembled JVM-side (hex + unhex, no Python UDF)."""
    seed = F.pmod(F.col("doc_id"), F.lit(2147483647))
    base = docs.select(
        F.col("doc_id"),
        seed.alias("seed"),
        (F.pmod(F.col("doc_id"), F.lit(4)) * 4000 + 8000).cast("int").alias("sr"),
        ((F.pmod(F.col("doc_id"), F.lit(32)) + 8) * 4).cast("int").alias("n"),
    )
    header_hex = F.concat(
        F.lit(_AUD_MAGIC.hex().upper()),
        _le32_hex(F.col("sr")),
        _le32_hex(F.col("n")),
        _le32_hex(F.col("seed").cast("int")),
    )
    body_hex = F.expr(
        "array_join(transform(sequence(0, n - 1),"
        " i -> lpad(hex(pmod(i * 17 + seed, 256)), 2, '0')), '')"
    )
    return base.select(
        "doc_id",
        F.lit("audio").alias("media_type"),
        F.unhex(F.concat(header_hex, body_hex)).alias("payload"),
    )


def decode_audio_batch(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """``mapInPandas`` stage: audio payload → (rate, length, duration,
    RMS, zero crossings, peak).  Bytes are read as centered 8-bit PCM
    (``byte - 128``); all features are integer sums (plus one final
    IEEE sqrt/divide), so the fake path is engine-portable for the
    oracle.  Real decode (soundfile) when available; per-row failures
    land in (ok, error), never fail the task."""
    import numpy as np

    real = _try_real_audio_decoder()
    for pdf in pdfs:
        out = {
            "doc_id": pdf["doc_id"],
            "media_type": pdf["media_type"],
            "sample_rate": [], "n_samples": [], "duration_ms": [],
            "rms": [], "zero_crossings": [], "peak": [],
            "ok": [], "error": [],
        }
        for payload in pdf["payload"]:
            try:
                if payload is None:
                    raise ValueError("null payload")
                buf = bytes(payload)
                if buf[:8] == _AUD_MAGIC:
                    sr, n, _seed = struct.unpack("<iii", buf[8:20])
                    x = (
                        np.frombuffer(buf[20:20 + n], np.uint8).astype(np.int64)
                        - 128
                    )
                else:
                    if real is None:
                        raise NotImplementedError(
                            "real audio decode requires soundfile, which"
                            " this environment does not provide"
                        )
                    import io as _io

                    data, sr = real.read(_io.BytesIO(buf), dtype="int16")
                    x = np.asarray(data, dtype=np.int64)
                    if x.ndim > 1:  # downmix: feature path is mono
                        x = x.mean(axis=1).astype(np.int64)
                    n = len(x)
                out["sample_rate"].append(sr)
                out["n_samples"].append(n)
                out["duration_ms"].append(n * 1000.0 / sr)
                out["rms"].append(
                    float(np.sqrt(int((x * x).sum()) / n)) if n else 0.0
                )
                out["zero_crossings"].append(
                    int((x[:-1] * x[1:] < 0).sum()) if n > 1 else 0
                )
                out["peak"].append(int(np.abs(x).max()) if n else 0)
                out["ok"].append(True); out["error"].append(None)
            except Exception as e:  # noqa: BLE001 — per-row isolation
                for c in ("sample_rate", "n_samples", "zero_crossings", "peak"):
                    out[c].append(0)
                out["duration_ms"].append(0.0); out["rms"].append(0.0)
                out["ok"].append(False); out["error"].append(str(e))
        yield pd.DataFrame(out)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract over a (doc_id, media_type, payload)
    audio DataFrame.  Arrow-batched; output is compact typed rows."""
    return media.mapInPandas(decode_audio_batch, AUDIO_FEATURE_SCHEMA)


def resize_image_batch(target_w: int, target_h: int):
    """``mapInPandas`` stage factory: image payload → resized image
    payload (binary → binary, the transform shape of a real
    preprocessing stage).  FAKEIMG payloads get a nearest-neighbor
    resample re-encoded as FAKEIMG (numpy-gathered, integer index
    math ``src = (y*h//th)*w + (x*w//tw)`` so the oracle can recompute
    every output pixel); real images go through Pillow when present.
    Failed rows pass through unchanged (the next decode stage reports
    them) rather than killing the task."""
    import numpy as np

    def resize(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real = _try_real_decoder()
        tw, th = target_w, target_h
        ys = np.arange(th)
        xs = np.arange(tw)
        for pdf in pdfs:
            out_payload = []
            for payload in pdf["payload"]:
                try:
                    buf = bytes(payload)
                    if buf[:8] == _MAGIC:
                        w, h, seed = struct.unpack("<iii", buf[8:20])
                        body = np.frombuffer(buf[20:20 + w * h], np.uint8)
                        idx = (ys * h // th)[:, None] * w + (xs * w // tw)[None, :]
                        resized = body[idx.ravel()].tobytes()
                        out_payload.append(
                            _MAGIC + struct.pack("<iii", tw, th, seed) + resized
                        )
                    elif real is not None:
                        import io as _io

                        with real.open(_io.BytesIO(buf)) as img:
                            o = _io.BytesIO()
                            img.resize((tw, th)).save(o, format="PNG")
                            out_payload.append(o.getvalue())
                    else:
                        out_payload.append(buf)  # decode stage will report
                except Exception:  # noqa: BLE001 — per-row isolation
                    out_payload.append(payload)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": out_payload,
                }
            )

    return resize


def resize_images(
    media: DataFrame, target_w: int = 8, target_h: int = 8
) -> DataFrame:
    """Resize every image payload to ``(target_w, target_h)``; same
    (doc_id, media_type, payload) schema, composable with
    :func:`extract_media_features` for a decode-after-transform check."""
    return media.mapInPandas(
        resize_image_batch(target_w, target_h),
        "doc_id bigint, media_type string, payload binary",
    )


def attach_fake_video(docs: DataFrame) -> DataFrame:
    """Video twin of :func:`attach_fake_media`: a deterministic binary
    payload per document standing in for an encoded video stream —
    ``(pmod(doc_id, 8) + 1) * 640`` bytes, byte ``j`` =
    ``pmod(j*13 + seed, 256)`` with ``seed = pmod(doc_id, 997)``.
    Headerless (the frame-sampling stage slices by byte offset, so
    unlike FAKEIMG/FAKEAUD there is no header to parse), assembled
    JVM-side (hex + unhex, no Python UDF), and pure arithmetic on
    doc_id — which is what lets :func:`sample_video_frames` over it be
    value-hashed against a DuckDB replay (the ``video`` member of the
    media_features pack)."""
    seed = F.pmod(F.col("doc_id"), F.lit(997))
    base = docs.select(
        F.col("doc_id"),
        seed.alias("seed"),
        ((F.pmod(F.col("doc_id"), F.lit(8)) + 1) * 640).cast("int").alias("n"),
    )
    body_hex = F.expr(
        "array_join(transform(sequence(0, n - 1),"
        " j -> lpad(hex(pmod(j * 13 + seed, 256)), 2, '0')), '')"
    )
    return base.select(
        "doc_id",
        F.lit("video").alias("media_type"),
        F.unhex(body_hex).alias("payload"),
    )


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
