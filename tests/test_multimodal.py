"""Multimodal plumbing tests: binary columns through mapInPandas."""

from pyspark.sql import functions as F

from hadoop_logfile_inputformat_spark.multimodal import (
    attach_fake_media,
    extract_media_features,
    sample_video_frames,
)
from hadoop_logfile_inputformat_spark.multimodal.media import encode_fake_image
from hadoop_logfile_inputformat_spark.operators.tables import load

SF = "/root/testdata/sf0.001"


def test_media_features_end_to_end(spark):
    docs = load(spark, SF, "documents").limit(50)
    media = attach_fake_media(docs)
    feats = extract_media_features(media)
    rows = feats.collect()
    assert len(rows) == 50
    assert all(r.ok for r in rows)
    assert all(r.width == r.doc_id % 16 + 4 for r in rows)
    assert all(r.n_bytes == 20 + r.width * r.height for r in rows)
    assert all(0 <= r.mean_luma <= 255 for r in rows)


def test_corrupt_payload_isolated_not_fatal(spark):
    good = encode_fake_image(4, 4, 1)
    rows = [(1, "image", bytearray(good)), (2, "image", bytearray(b"garbage")),
            (3, "image", None)]
    media = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    out = {r.doc_id: r for r in extract_media_features(media).collect()}
    assert out[1].ok and out[1].width == 4
    assert not out[2].ok and out[2].error
    assert not out[3].ok


def test_frame_sampling_schema_and_fanout(spark):
    media = spark.createDataFrame(
        [(1, "video", bytearray(encode_fake_image(50, 50, 0)))],
        "doc_id long, media_type string, payload binary",
    )
    frames = sample_video_frames(media, every_nth=1)
    rows = frames.collect()
    assert len(rows) == (len(encode_fake_image(50, 50, 0)) // 1024) + 1
    assert frames.columns == ["doc_id", "frame_idx", "frame_payload"]
    assert all(len(r.frame_payload) <= 64 for r in rows)


def test_audio_features_end_to_end(spark):
    """FAKEAUD payloads through the Arrow decode stage: header fields
    and integer-sum features must match a direct numpy recomputation."""
    import numpy as np

    from hadoop_logfile_inputformat_spark.multimodal.media import (
        attach_fake_audio,
        extract_audio_features,
    )

    docs = load(spark, SF, "documents").limit(40)
    rows = extract_audio_features(attach_fake_audio(docs)).collect()
    assert len(rows) == 40 and all(r.ok for r in rows)
    for r in rows:
        assert r.sample_rate == 8000 + (r.doc_id % 4) * 4000
        assert r.n_samples == (r.doc_id % 32 + 8) * 4
        seed = r.doc_id % 2147483647
        x = np.array(
            [((i * 17 + seed) % 256) - 128 for i in range(r.n_samples)]
        )
        assert r.peak == int(np.abs(x).max())
        assert r.zero_crossings == int((x[:-1] * x[1:] < 0).sum())
        assert abs(r.rms - float(np.sqrt((x * x).sum() / len(x)))) < 1e-12
        assert abs(r.duration_ms - r.n_samples * 1000.0 / r.sample_rate) < 1e-12


def test_audio_corrupt_payload_isolated(spark):
    from hadoop_logfile_inputformat_spark.multimodal.media import (
        encode_fake_audio,
        extract_audio_features,
    )

    rows = [
        (1, "audio", bytearray(encode_fake_audio(8000, 16, 7))),
        (2, "audio", bytearray(b"not audio")),
        (3, "audio", None),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )
    out = {r.doc_id: r for r in extract_audio_features(media).collect()}
    assert out[1].ok and out[1].sample_rate == 8000 and out[1].n_samples == 16
    assert not out[2].ok and out[2].error
    assert not out[3].ok


def test_resize_nearest_neighbor_semantics(spark):
    """4x2 -> 2x2 FAKEIMG resize picks exactly the nearest-neighbor
    source pixels ((y*h//th)*w + (x*w//tw)) and re-encodes the header
    with the target dims; decode of the resized payload agrees."""
    from hadoop_logfile_inputformat_spark.multimodal.media import (
        extract_media_features,
        resize_images,
    )

    payload = encode_fake_image(4, 2, 9)  # body[i] = (i*31 + 9) % 251
    media = spark.createDataFrame(
        [(1, "image", bytearray(payload))],
        "doc_id long, media_type string, payload binary",
    )
    resized = resize_images(media, 2, 2).collect()[0].payload
    body = payload[20:]
    # tw=th=2: src_y = y*2//2 = y, src_x = x*4//2 = 2x -> indices 0,2,4,6
    assert bytes(resized[20:]) == bytes(body[i] for i in (0, 2, 4, 6))
    feats = extract_media_features(
        spark.createDataFrame(
            [(1, "image", bytearray(bytes(resized)))],
            "doc_id long, media_type string, payload binary",
        )
    ).collect()[0]
    assert feats.ok and (feats.width, feats.height) == (2, 2)
    assert feats.mean_luma == sum(body[i] for i in (0, 2, 4, 6)) / 4


def _tiny_png(pixels=(100, 200)) -> bytes:
    """Minimal valid 8-bit grayscale PNG (len(pixels) x 1), stdlib-only."""
    import struct
    import zlib

    def chunk(typ, data):
        c = struct.pack(">I", len(data)) + typ + data
        return c + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", len(pixels), 1, 8, 0, 0, 0, 0)
    raw = b"\x00" + bytes(pixels)  # one scanline: filter byte + pixels
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_real_png_decode_with_pillow():
    """Real decode path: a genuine PNG through decode_image_batch.
    Skipped when Pillow is absent (this container); the payload fixture
    itself is stdlib-built so the test is ready wherever PIL exists."""
    import pandas as pd
    import pytest

    pytest.importorskip("PIL.Image")
    from hadoop_logfile_inputformat_spark.multimodal.media import (
        decode_image_batch,
    )

    pdf = pd.DataFrame(
        {"doc_id": [1], "media_type": ["image"],
         "payload": [bytearray(_tiny_png((100, 200)))]}
    )
    [out] = list(decode_image_batch(iter([pdf])))
    r = out.iloc[0]
    assert bool(r.ok), r.error
    assert (r.width, r.height, r.n_channels) == (2, 1, 1)
    assert abs(r.mean_luma - 150.0) < 0.5


def test_real_payload_without_pillow_reports_not_implemented():
    """Without Pillow, a non-FAKEIMG payload must surface the stubbed
    codec as a per-row NotImplementedError message, not a task crash."""
    import pandas as pd
    import pytest

    try:
        import PIL.Image  # noqa: F401
        pytest.skip("Pillow present: the real path is live")
    except ImportError:
        pass
    from hadoop_logfile_inputformat_spark.multimodal.media import (
        decode_image_batch,
    )

    pdf = pd.DataFrame(
        {"doc_id": [1], "media_type": ["image"],
         "payload": [bytearray(_tiny_png())]}
    )
    [out] = list(decode_image_batch(iter([pdf])))
    r = out.iloc[0]
    assert not bool(r.ok)
    assert "Pillow" in r.error


def test_attach_fake_video_payload_formula_and_determinism(spark):
    """attach_fake_video's payload must match the documented byte
    formula exactly (the property the DuckDB video_frames oracle
    replays) and be deterministic across invocations."""
    from hadoop_logfile_inputformat_spark.multimodal.media import (
        attach_fake_video,
    )

    docs = spark.createDataFrame([(3,), (8,), (997,)], "doc_id long")
    rows = {r.doc_id: bytes(r.payload) for r in attach_fake_video(docs).collect()}
    for doc_id, payload in rows.items():
        seed = doc_id % 997
        n = (doc_id % 8 + 1) * 640
        assert len(payload) == n
        assert payload == bytes((j * 13 + seed) % 256 for j in range(n))
    again = {r.doc_id: bytes(r.payload) for r in attach_fake_video(docs).collect()}
    assert again == rows


def test_video_frames_member_slices_expected_bytes(spark):
    """The gated video member: sampled frame hex must equal the exact
    64-byte slice at frame_idx*64, and the fan-out count must follow
    (len // 1024 + 1) stepped by every_nth=2."""
    from hadoop_logfile_inputformat_spark.plans.registry import MEMBER_QUERIES

    out = MEMBER_QUERIES["video_frames"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert out.columns == ["doc_id", "frame_idx", "frame_hex", "n_bytes"]
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, frs in by_doc.items():
        seed, n = doc_id % 997, (doc_id % 8 + 1) * 640
        want_idx = list(range(0, n // 1024 + 1, 2))
        assert sorted(r.frame_idx for r in frs) == want_idx
        for r in frs:
            start = r.frame_idx * 64
            want = bytes((j * 13 + seed) % 256 for j in range(start, start + 64))
            assert r.frame_hex == want.hex().upper()
            assert r.n_bytes == 64
