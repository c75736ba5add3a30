"""Tests for the multimodal asset pipeline.

The codecs are stubbed (deterministic md5-seeded fakes — PIL/soundfile/
pyav aren't in this container) but everything Spark-side is real:
schemas, binary payload transport through Arrow, mapInPandas batch
shapes, row explosion, and metadata pushdown.
"""

from __future__ import annotations

import numpy as np
import pytest

from sf_datalake_spark.multimodal import (
    ASSET_SCHEMA,
    decode_images,
    extract_audio_features,
    resize_images,
    sample_frames,
    with_asset_metadata,
)


def asset(aid, modality, payload, fmt=None, w=None, h=None, dur=None, rate=None):
    return (aid, modality, payload, (fmt, w, h, dur, rate))


@pytest.fixture()
def assets(spark):
    rows = [
        asset(1, "image", b"img-payload-1", "png", 8, 6),
        asset(2, "image", b"img-payload-2", "png", 4, 4),
        asset(3, "audio", b"aud-payload-3", "wav", rate=8000),
        asset(4, "video", b"vid-payload-4", "mp4", 4, 4, dur=2500),
        asset(5, "video", b"vid-payload-5", "mp4", 4, 4, dur=0),
    ]
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def test_metadata_pass_is_jvm_side(assets):
    out = with_asset_metadata(assets).select(
        "asset_id", "content_length", "content_md5"
    ).collect()
    got = {r["asset_id"]: r["content_length"] for r in out}
    assert got[1] == len(b"img-payload-1")
    assert all(len(r["content_md5"]) == 32 for r in out)
    # no Python stage in the plan: BatchEvalPython/ArrowEvalPython absent
    plan = with_asset_metadata(assets)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_decode_images_shapes_and_determinism(assets):
    imgs = assets.filter("modality = 'image'")
    out = {r["asset_id"]: r for r in decode_images(imgs).collect()}
    assert (out[1]["height"], out[1]["width"], out[1]["channels"]) == (6, 8, 3)
    assert len(out[1]["pixels"]) == 6 * 8 * 3
    # deterministic: same payload → same pixels on re-run
    again = {r["asset_id"]: r for r in decode_images(imgs).collect()}
    assert bytes(out[1]["pixels"]) == bytes(again[1]["pixels"])
    assert bytes(out[1]["pixels"]) != bytes(out[2]["pixels"])


def test_resize_images(assets):
    imgs = decode_images(assets.filter("asset_id = 1"))
    res = resize_images(imgs, 3, 4).first()
    assert (res["height"], res["width"], res["channels"]) == (3, 4, 3)
    assert len(res["pixels"]) == 3 * 4 * 3
    # nearest-neighbor: every output pixel exists in the source
    src = np.frombuffer(imgs.first()["pixels"], dtype=np.uint8).reshape(6, 8, 3)
    dst = np.frombuffer(res["pixels"], dtype=np.uint8).reshape(3, 4, 3)
    src_px = {tuple(p) for p in src.reshape(-1, 3)}
    assert all(tuple(p) in src_px for p in dst.reshape(-1, 3))


def test_sample_frames_row_explosion(assets):
    vids = assets.filter("modality = 'video'")
    out = sample_frames(vids, every_ms=1000).collect()
    by_asset = {}
    for r in out:
        by_asset.setdefault(r["asset_id"], []).append(r)
    # 2500 ms at 1000 ms cadence → 3 frames; zero/None duration → 1 frame
    assert len(by_asset[4]) == 3
    assert [r["frame_ms"] for r in sorted(by_asset[4], key=lambda r: r["frame_index"])] == [
        0, 1000, 2000,
    ]
    assert len(by_asset[5]) == 1
    # distinct frames from the same payload differ (frame_index in seed)
    f = sorted(by_asset[4], key=lambda r: r["frame_index"])
    assert bytes(f[0]["pixels"]) != bytes(f[1]["pixels"])


def test_audio_features(assets):
    aud = assets.filter("modality = 'audio'")
    row = extract_audio_features(aud).first()
    assert row["sample_rate"] == 8000
    assert row["n_samples"] == 8000          # fake decoder: 1 s of noise
    assert row["duration_ms"] == 1000
    assert 0.0 < row["rms"] < 1.0            # uniform(-1,1) → rms ≈ 0.577
    assert row["zero_crossings"] > 0


def test_metadata_filter_prunes_before_decode(assets, spark):
    """Filtering on typed metadata happens JVM-side before the Python
    stage — the decode sees only surviving rows."""
    big = assets.filter("meta.width >= 8")
    assert decode_images(big).count() == 1


# ---------------------------------------------------------------------------
# Real pyav code path, exercised via a monkeypatched fake `av` module
# (the hook imports av lazily, so sys.modules injection reaches it)
# ---------------------------------------------------------------------------

def _fake_av(frames, fail_open=False):
    import sys
    import types

    class FakeFrame:
        def __init__(self, t, arr):
            self.time = t
            self._arr = arr

        def to_ndarray(self, format):
            assert format == "rgb24"
            return self._arr

    class FakeContainer:
        def __init__(self):
            self.streams = types.SimpleNamespace(video=[object()])
            self.seek_calls = []

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def seek(self, offset, backward=True):
            self.seek_calls.append(offset)

        def decode(self, stream):
            yield from (FakeFrame(t, a) for t, a in frames)

    mod = types.ModuleType("av")
    container = FakeContainer()
    if fail_open:
        def _open(buf):
            raise OSError("moov atom not found")
    else:
        def _open(buf):
            return container
    mod.open = _open
    return mod, container


def test_pyav_path_seeks_and_returns_first_frame_at_or_after(monkeypatch):
    import sys

    from sf_datalake_spark.multimodal.assets import _decode_video_frame

    arrs = [np.full((4, 4, 3), i, dtype=np.uint8) for i in range(3)]
    mod, container = _fake_av([(0.0, arrs[0]), (0.5, arrs[1]), (1.0, arrs[2])])
    monkeypatch.setitem(sys.modules, "av", mod)
    got = _decode_video_frame(b"payload", 0, None, None, at_ms=600)
    assert (got == arrs[2]).all()  # 500 ms < 600 ≤ 1000 ms
    assert container.seek_calls == [600 * 1000]  # AV_TIME_BASE µs


def test_pyav_path_frame_index_without_timestamp(monkeypatch):
    import sys

    from sf_datalake_spark.multimodal.assets import _decode_video_frame

    arrs = [np.full((2, 2, 3), i, dtype=np.uint8) for i in range(3)]
    mod, _ = _fake_av([(None, arrs[0]), (None, arrs[1]), (None, arrs[2])])
    monkeypatch.setitem(sys.modules, "av", mod)
    got = _decode_video_frame(b"payload", 1, None, None)
    assert (got == arrs[1]).all()


def test_pyav_path_target_beyond_stream_returns_none(monkeypatch):
    import sys

    from sf_datalake_spark.multimodal.assets import _decode_video_frame

    mod, _ = _fake_av([(0.0, np.zeros((2, 2, 3), np.uint8))])
    monkeypatch.setitem(sys.modules, "av", mod)
    assert _decode_video_frame(b"payload", 0, None, None, at_ms=5000) is None


def test_pyav_path_corrupt_payload_returns_none(monkeypatch):
    import sys

    from sf_datalake_spark.multimodal.assets import _decode_video_frame

    mod, _ = _fake_av([], fail_open=True)
    monkeypatch.setitem(sys.modules, "av", mod)
    assert _decode_video_frame(b"\x00garbage", 0, None, None, at_ms=0) is None


def test_pyav_at_ms_with_ptsless_frames_falls_back_to_index(monkeypatch):
    """at_ms > 0 on a pts-less stream (frame.time None) must not treat
    every frame as t=0 and drop it — it falls back to index counting."""
    import sys

    from sf_datalake_spark.multimodal.assets import _decode_video_frame

    arrs = [np.full((2, 2, 3), i, dtype=np.uint8) for i in range(3)]
    mod, _ = _fake_av([(None, arrs[0]), (None, arrs[1]), (None, arrs[2])])
    monkeypatch.setitem(sys.modules, "av", mod)
    got = _decode_video_frame(b"payload", 2, None, None, at_ms=2000)
    assert (got == arrs[2]).all()


def test_pyav_batch_decode_single_pass(monkeypatch):
    """_decode_video_frames opens the container ONCE and one sequential
    decode serves every target; a sparse stream's frame satisfies
    several consecutive targets, and targets beyond the stream emit
    nothing — same semantics as the per-frame seek path."""
    import sys

    from sf_datalake_spark.multimodal.assets import _decode_video_frames

    arrs = [np.full((2, 2, 3), i, dtype=np.uint8) for i in range(3)]
    mod, container = _fake_av([(0.0, arrs[0]), (0.5, arrs[1]), (2.2, arrs[2])])
    open_calls = []
    orig_open = mod.open
    mod.open = lambda buf: (open_calls.append(1), orig_open(buf))[1]
    monkeypatch.setitem(sys.modules, "av", mod)

    got = _decode_video_frames(b"payload", 6, 1000, None, None)
    assert len(open_calls) == 1
    # t=0 → target 0; t=2200 → targets 1000 and 2000; targets 3000+ gone
    assert [(i, a[0, 0, 0]) for i, a in got] == [(0, 0), (1, 2), (2, 2)]


def test_pyav_batch_decode_ptsless_index_mode(monkeypatch):
    import sys

    from sf_datalake_spark.multimodal.assets import _decode_video_frames

    arrs = [np.full((2, 2, 3), i, dtype=np.uint8) for i in range(4)]
    mod, _ = _fake_av([(None, a) for a in arrs])
    monkeypatch.setitem(sys.modules, "av", mod)
    got = _decode_video_frames(b"payload", 3, 1000, None, None)
    assert [(i, a[0, 0, 0]) for i, a in got] == [(0, 0), (1, 1), (2, 2)]


# ---------------------------------------------------------------------------
# Real in-container codec paths: hand-built BMP / WAV bytes decoded by
# the pure-numpy/struct parsers through the full Spark stages
# ---------------------------------------------------------------------------

def _bmp_bytes(pixels_rgb, bottom_up=True):
    """Serialize an (H, W, 3) uint8 RGB array as an uncompressed 24-bit
    BMP — built with raw struct packing, independent of the parser."""
    import struct

    h, w, _ = pixels_rgb.shape
    stride = (w * 3 + 3) & ~3
    img = bytearray()
    row_order = range(h - 1, -1, -1) if bottom_up else range(h)
    for y in row_order:
        row = bytearray()
        for x in range(w):
            r, g, b = pixels_rgb[y, x]
            row += bytes((b, g, r))  # BGR on disk
        row += b"\x00" * (stride - len(row))
        img += row
    data_offset = 14 + 40
    file_size = data_offset + len(img)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, data_offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h if bottom_up else -h, 1, 24, 0,
        len(img), 2835, 2835, 0, 0,
    )
    return bytes(header + info + img)


def _wav_bytes(samples_i16, rate, n_channels=1):
    """Serialize int16 PCM as a canonical RIFF/WAVE file via struct."""
    import struct

    data = b"".join(struct.pack("<h", int(s)) for s in samples_i16)
    fmt = struct.pack("<HHIIHH", 1, n_channels, rate,
                      rate * n_channels * 2, n_channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_real_bmp_decode_exact_pixels(spark):
    """A generated BMP decodes to its EXACT pixel values through the
    full decode_images Spark stage — the real (non-fake) path."""
    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(5, 3, 3), dtype=np.uint8)
    rows = [asset(10, "image", _bmp_bytes(px), "bmp", 3, 5)]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    out = decode_images(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["height"], r["width"], r["channels"]) == (5, 3, 3)
    got = np.frombuffer(r["pixels"], dtype=np.uint8).reshape(5, 3, 3)
    assert np.array_equal(got, px)


def test_real_bmp_top_down_and_padding(spark):
    """Top-down BMPs (negative height) and 4-byte row padding both
    round-trip exactly; width 3 forces a padded stride."""
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    rows = [
        asset(11, "image", _bmp_bytes(px, bottom_up=False), "bmp", 3, 2),
        asset(12, "image", _bmp_bytes(px, bottom_up=True), "bmp", 3, 2),
    ]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    out = {r["asset_id"]: r for r in decode_images(df).collect()}
    for aid in (11, 12):
        got = np.frombuffer(out[aid]["pixels"], dtype=np.uint8).reshape(2, 3, 3)
        assert np.array_equal(got, px)


def _png_bytes(pixels, color_type=2, filters=None):
    """Serialize an (H, W, C) uint8 array as a baseline PNG — built
    with struct + zlib, independent of the parser.  ``filters`` picks
    the per-scanline filter type (default: cycle through 0..4 so every
    defilter branch is exercised)."""
    import struct
    import zlib

    h, w = pixels.shape[:2]
    nch = pixels.shape[2] if pixels.ndim == 3 else 1
    flat = pixels.reshape(h, w * nch).astype(np.int64)
    if filters is None:
        filters = [(y % 5) for y in range(h)]
    recon = flat  # reconstructed bytes (what the decoder must recover)
    raw = bytearray()
    for y in range(h):
        f = filters[y]
        cur = recon[y]
        up = recon[y - 1] if y > 0 else np.zeros(w * nch, dtype=np.int64)
        line = bytearray([f])
        for x in range(w * nch):
            a = cur[x - nch] if x >= nch else 0
            b = up[x]
            c = up[x - nch] if x >= nch else 0
            if f == 0:
                v = cur[x]
            elif f == 1:
                v = cur[x] - a
            elif f == 2:
                v = cur[x] - b
            elif f == 3:
                v = cur[x] - (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = cur[x] - pred
            line.append(v & 0xFF)
        raw += line

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_real_png_decode_exact_pixels(spark):
    """A generated baseline PNG (zlib-compressed, all five filter types
    across its scanlines) decodes to its EXACT pixels through the full
    decode_images Spark stage — the compressed-codec seam, real."""
    rng = np.random.RandomState(21)
    px = rng.randint(0, 256, size=(7, 5, 3), dtype=np.uint8)
    rows = [asset(20, "image", _png_bytes(px), "png", 5, 7)]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    out = decode_images(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["height"], r["width"], r["channels"]) == (7, 5, 3)
    got = np.frombuffer(r["pixels"], dtype=np.uint8).reshape(7, 5, 3)
    assert np.array_equal(got, px)


def test_png_parser_color_types_and_rejection():
    """Grayscale replicates to RGB, RGBA drops alpha; malformed or
    unsupported payloads return None (fall through to the fake)."""
    from sf_datalake_spark.multimodal.assets import _decode_png

    rng = np.random.RandomState(5)
    gray = rng.randint(0, 256, size=(4, 3, 1), dtype=np.uint8)
    got = _decode_png(_png_bytes(gray, color_type=0))
    assert got.shape == (4, 3, 3)
    assert np.array_equal(got[:, :, 0], gray[:, :, 0])
    assert np.array_equal(got[:, :, 1], gray[:, :, 0])

    rgba = rng.randint(0, 256, size=(3, 4, 4), dtype=np.uint8)
    got = _decode_png(_png_bytes(rgba, color_type=6))
    assert np.array_equal(got, rgba[:, :, :3])

    rgb = rng.randint(0, 256, size=(3, 3, 3), dtype=np.uint8)
    good = _png_bytes(rgb)
    assert _decode_png(good) is not None
    assert _decode_png(good[:20]) is None            # truncated
    assert _decode_png(b"BM" + good[2:]) is None     # wrong magic
    corrupt = good[:40] + b"\x00\x00" + good[42:]    # damaged IDAT stream
    assert _decode_png(corrupt) is None


def test_real_bmp_resize_chain(spark):
    """Real decode feeds the resize stage: 4x4 checkerboard -> 2x2."""
    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[::2, ::2] = 255
    px[1::2, 1::2] = 255
    df = spark.createDataFrame([asset(13, "image", _bmp_bytes(px), "bmp", 4, 4)],
                               ASSET_SCHEMA)
    out = resize_images(decode_images(df), 2, 2).collect()[0]
    got = np.frombuffer(out["pixels"], dtype=np.uint8).reshape(2, 2, 3)
    # nearest-neighbor with index floor: picks rows/cols 0 and 2 -> all 255
    assert np.array_equal(got, np.full((2, 2, 3), 255, dtype=np.uint8))


def test_real_wav_decode_exact_features(spark):
    """A struct-built WAV decodes through extract_audio_features with
    exactly predictable sample count, duration, RMS and zero crossings."""
    # alternating +/-16384: rms = 0.5 exactly, zero crossing at every step
    samples = [16384, -16384] * 500  # 1000 samples @ 1000 Hz -> 1000 ms
    rows = [asset(20, "audio", _wav_bytes(samples, 1000), "wav", rate=1000)]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    out = extract_audio_features(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_samples"] == 1000
    assert r["sample_rate"] == 1000
    assert r["duration_ms"] == 1000
    assert r["rms"] == pytest.approx(0.5, rel=1e-12)
    assert r["zero_crossings"] == 999


def test_wav_parser_formats_and_fallback():
    """Direct parser coverage: 8-bit PCM, float32, stereo mixdown,
    malformed payloads -> None (callers then use the fake)."""
    import struct

    from sf_datalake_spark.multimodal.assets import _decode_wav

    # 8-bit unsigned: 128 -> 0.0, 255 -> ~1.0, 0 -> -1.0
    fmt8 = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt8)) + fmt8 \
        + b"data" + struct.pack("<I", 3) + bytes([0, 128, 255]) + b"\x00"
    out = _decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert out is not None
    s, rate = out
    assert rate == 8000
    assert s[0] == pytest.approx(-1.0) and s[1] == 0.0 and s[2] == pytest.approx(0.9921875)

    # float32 stereo: chunks word-aligned, mean mixdown
    fmtf = struct.pack("<HHIIHH", 3, 2, 44100, 44100 * 8, 8, 32)
    dataf = struct.pack("<4f", 0.5, -0.5, 1.0, 0.0)
    bodyf = b"WAVE" + b"fmt " + struct.pack("<I", len(fmtf)) + fmtf \
        + b"data" + struct.pack("<I", len(dataf)) + dataf
    s2, rate2 = _decode_wav(b"RIFF" + struct.pack("<I", len(bodyf)) + bodyf)
    assert rate2 == 44100
    assert np.allclose(s2, [0.0, 0.5])

    assert _decode_wav(b"RIFX1234WAVE") is None  # big-endian RIFX: refused
    assert _decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE") is None  # no chunks


def test_bmp_parser_rejects_malformed():
    from sf_datalake_spark.multimodal.assets import _decode_bmp

    px = np.zeros((2, 2, 3), dtype=np.uint8)
    good = _bmp_bytes(px)
    assert _decode_bmp(good) is not None
    assert _decode_bmp(good[:30]) is None                      # truncated header
    assert _decode_bmp(good[:-3]) is None                      # truncated pixels
    assert _decode_bmp(b"PNG" + good[3:]) is None              # wrong magic
    bad_comp = bytearray(good)
    bad_comp[30] = 1  # BI_RLE8
    assert _decode_bmp(bytes(bad_comp)) is None


def test_phash_batched_equals_scalar_reference(spark):
    """The vectorized mapInPandas pHash must reproduce the scalar
    reference implementation bit-for-bit."""
    import numpy as np
    from pyspark.sql import functions as F

    from sf_datalake_spark.multimodal import decode_images, image_phash
    from sf_datalake_spark.multimodal.assets import _decode_image, _phash64

    payloads = [f"doc number {i} with distinct text".encode() for i in range(12)]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in enumerate(payloads)],
        "asset_id long, content binary",
    )
    got = {
        r["asset_id"]: r["phash"]
        for r in image_phash(decode_images(df)).collect()
    }
    for i, p in enumerate(payloads):
        assert got[i] == _phash64(_decode_image(p, None, None)), i


def test_phash_hamming_tracks_visual_similarity():
    import numpy as np

    from sf_datalake_spark.multimodal.assets import _phash64

    rng = np.random.RandomState(7)
    base = (
        np.outer(np.linspace(0, 255, 64), np.ones(64))[:, :, None]
        * np.ones(3)[None, None, :]
        + rng.randint(0, 40, (64, 64, 3))
    ).clip(0, 255).astype(np.uint8)
    noisy = (base.astype(int) + rng.randint(-3, 4, base.shape)).clip(
        0, 255
    ).astype(np.uint8)
    unrelated = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    h = _phash64(base)
    assert ham(h, _phash64(base.copy())) == 0
    assert ham(h, _phash64(noisy)) <= 8          # visually identical
    assert ham(h, _phash64(unrelated)) >= 20      # visually unrelated


def _jpeg_bytes(pixels, subsample=False, quant=8, restart_interval=0):
    """Serialize an (H, W, 3) RGB or (H, W) grayscale uint8 array as a
    baseline JFIF — struct + numpy, independent of the decoder.
    Forward DCT + flat quantization; the Huffman tables are CUSTOM
    canonical codes built from the actual symbol set and emitted in
    DHT, so neither side depends on the Annex-K defaults.  With
    ``subsample`` the chroma planes are 2x2-averaged (4:2:0);
    ``restart_interval`` > 0 emits DRI and RSTn markers."""
    import struct

    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]

    C = np.zeros((8, 8))
    for u in range(8):
        a = np.sqrt(0.125) if u == 0 else 0.5
        for k in range(8):
            C[u, k] = a * np.cos((2 * k + 1) * u * np.pi / 16.0)

    zz = []
    for s in range(15):
        ij = [(i, s - i) for i in range(s + 1) if i < 8 and s - i < 8]
        zz.extend(ij if s % 2 == 1 else ij[::-1])

    if gray:
        planes = [pixels.astype(np.float64)]
        samps = [(1, 1)]
    else:
        p = pixels.astype(np.float64)
        y = 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
        cb = 128 - 0.168736 * p[..., 0] - 0.331264 * p[..., 1] + 0.5 * p[..., 2]
        cr = 128 + 0.5 * p[..., 0] - 0.418688 * p[..., 1] - 0.081312 * p[..., 2]
        if subsample:
            hy, vy = 2, 2
            # pad to 16, then 2x2 average
            ph = -(-h // 16) * 16
            pw = -(-w // 16) * 16
            def pad(pl, th, tw):
                return np.pad(pl, ((0, th - pl.shape[0]), (0, tw - pl.shape[1])),
                              mode="edge")
            cb = pad(cb, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = pad(cr, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        else:
            hy, vy = 1, 1
        planes = [y, cb, cr]
        samps = [(hy, vy), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for pl, (sh, sv) in zip(planes, samps):
        th, tw = mcuy * 8 * sv, mcux * 8 * sh
        padded.append(np.pad(pl, ((0, max(0, th - pl.shape[0]))
                                  , (0, max(0, tw - pl.shape[1]))),
                             mode="edge")[:th, :tw])

    def category(v):
        return abs(int(v)).bit_length()

    # pass 1: build the symbol/bits stream per block in MCU order
    stream = []  # (kind, table, symbol, extra_bits_value, extra_bits_len)
    preds = [0] * len(planes)
    restarts = []  # stream indices where an RSTn goes
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                restarts.append(len(stream))
                preds = [0] * len(planes)
            mcu_count += 1
            for ci, (pl, (sh, sv)) in enumerate(zip(padded, samps)):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        blk = pl[y0:y0 + 8, x0:x0 + 8] - 128.0
                        coef = C @ blk @ C.T
                        q = np.rint(coef / quant).astype(np.int64)
                        qz = [int(q[i, j]) for (i, j) in zz]
                        diff = qz[0] - preds[ci]
                        preds[ci] = qz[0]
                        t = category(diff)
                        bits = diff if diff >= 0 else diff + (1 << t) - 1
                        stream.append(("dc", t, bits, t))
                        run = 0
                        last_nz = max((k for k in range(1, 64) if qz[k]),
                                      default=0)
                        for k in range(1, last_nz + 1):
                            v = qz[k]
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                stream.append(("ac", 0xF0, 0, 0))
                                run -= 16
                            s = category(v)
                            bits = v if v >= 0 else v + (1 << s) - 1
                            stream.append(("ac", (run << 4) | s, bits, s))
                            run = 0
                        if last_nz < 63:
                            stream.append(("ac", 0x00, 0, 0))

    # pass 2: canonical Huffman tables from the used symbol sets
    def build(symbols_used):
        syms = sorted(symbols_used)
        L = max(2, (len(syms)).bit_length())  # 2^L > nsym: all-ones free
        if (1 << L) <= len(syms):
            L += 1
        counts = [0] * 16
        counts[L - 1] = len(syms)
        return {s: (i, L) for i, s in enumerate(syms)}, counts, bytes(syms)

    dc_syms = {s for kind, s, *_ in stream if kind == "dc"}
    ac_syms = {s for kind, s, *_ in stream if kind == "ac"}
    dc_map, dc_counts, dc_vals = build(dc_syms)
    ac_map, ac_counts, ac_vals = build(ac_syms)

    out_bits = []
    body = bytearray()

    def flush(pad=True):
        while pad and len(out_bits) % 8:
            out_bits.append(1)
        while len(out_bits) >= 8:
            b = 0
            for bit in out_bits[:8]:
                b = (b << 1) | bit
            del out_bits[:8]
            body.append(b)
            if b == 0xFF:
                body.append(0x00)

    def emit(code, length):
        for i in range(length - 1, -1, -1):
            out_bits.append((code >> i) & 1)
        flush(pad=False)

    rst_i = 0
    rset = set(restarts)
    for idx, (kind, sym, bits, blen) in enumerate(stream):
        if idx in rset:
            flush(pad=True)
            body.append(0xFF)
            body.append(0xD0 + (rst_i % 8))
            rst_i += 1
        code, length = (dc_map if kind == "dc" else ac_map)[sym]
        emit(code, length)
        if blen:
            emit(bits, blen)
    flush(pad=True)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) \
            + payload

    qtbl = bytes([0]) + bytes([quant] * 64)
    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci, (sh, sv) in enumerate(samps):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    dht = bytes([0x00]) + bytes(dc_counts) + dc_vals \
        + bytes([0x10]) + bytes(ac_counts) + ac_vals
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out = b"\xff\xd8" + seg(0xE0, app0) + seg(0xDB, qtbl)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xC0, sof) + seg(0xC4, dht) + seg(0xDA, sos)
    return out + bytes(body) + b"\xff\xd9"


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _jpeg_progressive_bytes(pixels, subsample=False, quant=8,
                            restart_interval=0, al_levels=1,
                            dc_separate=False):
    """Serialize an RGB/grayscale uint8 array as a PROGRESSIVE (SOF2)
    JFIF — independent of the decoder, following T.81 G.1.2 and the
    libjpeg encoder's scan script shape: an interleaved first DC scan
    at Al=1, a DC refinement scan, then per-component AC scans split
    into spectral bands (1-5, 6-63 for luma; 1-63 for chroma), each
    coded first at Al=1 and refined to Al=0.  Exercises EOB-run
    coding, ZRL, spectral selection, and successive-approximation
    correction bits.  Quantized coefficients are IDENTICAL to
    ``_jpeg_bytes``'s, so the progressive decode must equal the
    baseline decode bit-for-bit."""
    import struct

    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]

    C = np.zeros((8, 8))
    for u in range(8):
        a = np.sqrt(0.125) if u == 0 else 0.5
        for k in range(8):
            C[u, k] = a * np.cos((2 * k + 1) * u * np.pi / 16.0)
    zz = []
    for s in range(15):
        ij = [(i, s - i) for i in range(s + 1) if i < 8 and s - i < 8]
        zz.extend(ij if s % 2 == 1 else ij[::-1])

    if gray:
        planes = [pixels.astype(np.float64)]
        samps = [(1, 1)]
    else:
        p = pixels.astype(np.float64)
        y = 0.299 * p[..., 0] + 0.587 * p[..., 1] + 0.114 * p[..., 2]
        cb = 128 - 0.168736 * p[..., 0] - 0.331264 * p[..., 1] + 0.5 * p[..., 2]
        cr = 128 + 0.5 * p[..., 0] - 0.418688 * p[..., 1] - 0.081312 * p[..., 2]
        if subsample:
            hy, vy = 2, 2
            ph = -(-h // 16) * 16
            pw = -(-w // 16) * 16

            def pad(pl, th, tw):
                return np.pad(pl, ((0, th - pl.shape[0]),
                                   (0, tw - pl.shape[1])), mode="edge")
            cb = pad(cb, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = pad(cr, ph, pw).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        else:
            hy, vy = 1, 1
        planes = [y, cb, cr]
        samps = [(hy, vy), (1, 1), (1, 1)]

    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # quantized zigzag coefficients per comp over the padded MCU grid
    qzs = []
    for pl, (sh, sv) in zip(planes, samps):
        th, tw = mcuy * 8 * sv, mcux * 8 * sh
        pl = np.pad(pl, ((0, max(0, th - pl.shape[0])),
                         (0, max(0, tw - pl.shape[1]))),
                    mode="edge")[:th, :tw]
        by, bx = th // 8, tw // 8
        arr = np.zeros((by, bx, 64), dtype=np.int64)
        for yb in range(by):
            for xb in range(bx):
                blk = pl[yb * 8:yb * 8 + 8, xb * 8:xb * 8 + 8] - 128.0
                q = np.rint((C @ blk @ C.T) / quant).astype(np.int64)
                arr[yb, xb] = [int(q[i, j]) for (i, j) in zz]
        qzs.append(arr)

    # non-interleaved block dims per comp
    nbdims = []
    for (sh, sv) in samps:
        cw = -(-(w * sh) // hmax)
        ch = -(-(h * sv) // vmax)
        nbdims.append((-(-ch // 8), -(-cw // 8)))

    class BW:
        def __init__(self):
            self.bits = []
            self.out = bytearray()

        def emit(self, code, n):
            for i in range(n - 1, -1, -1):
                self.bits.append((code >> i) & 1)
            self._flush(False)

        def _flush(self, pad):
            if pad:
                while len(self.bits) % 8:
                    self.bits.append(1)
            while len(self.bits) >= 8:
                b = 0
                for bit in self.bits[:8]:
                    b = (b << 1) | bit
                del self.bits[:8]
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)

        def marker(self, m):
            self._flush(True)  # byte-align (1-padded) before a marker
            self.out.append(0xFF)
            self.out.append(m)

        def done(self):
            self._flush(True)
            return bytes(self.out)

    def build_huff(symbols_used):
        syms = sorted(symbols_used) or [0]
        L = max(2, len(syms).bit_length())
        if (1 << L) <= len(syms):
            L += 1
        counts = [0] * 16
        counts[L - 1] = len(syms)
        return {s: (i, L) for i, s in enumerate(syms)}, counts, bytes(syms)

    def category(v):
        return abs(int(v)).bit_length()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) \
            + payload

    def sos_seg(comp_ids, ss, se, ah, al):
        p = bytes([len(comp_ids)])
        for cid in comp_ids:
            p += bytes([cid, 0x00])  # DC table 0 / AC table 0
        p += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, p)

    # ---- scan emitters: each returns (symbol_stream, raw_scan) where
    # symbol_stream is [(kind, payload...)]: ("sym", s) Huffman-coded,
    # ("bits", value, nbits) raw
    def dc_first_stream(al):
        stream = []
        preds = [0] * len(qzs)
        mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    stream.append(("rst",))
                    preds = [0] * len(qzs)
                mcu += 1
                for ci, ((sh, sv), arr) in enumerate(zip(samps, qzs)):
                    for by in range(sv):
                        for bx in range(sh):
                            dc = int(arr[my * sv + by, mx * sh + bx, 0]) >> al
                            diff = dc - preds[ci]
                            preds[ci] = dc
                            t = category(diff)
                            stream.append(("sym", t))
                            if t:
                                bits = diff if diff >= 0 else diff + (1 << t) - 1
                                stream.append(("bits", bits, t))
        return stream

    def dc_refine_stream(al):
        stream = []
        mcu = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    stream.append(("rst",))
                mcu += 1
                for (sh, sv), arr in zip(samps, qzs):
                    for by in range(sv):
                        for bx in range(sh):
                            bit = (int(arr[my * sv + by, mx * sh + bx, 0])
                                   >> al) & 1
                            stream.append(("bits", bit, 1))
        return stream

    def dc_first_stream_1(ci, al):
        """Non-interleaved (ns=1) DC first scan for one component,
        walking its own block raster — valid progressive JPEG that
        interleaved-only decoders get wrong."""
        arr = qzs[ci]
        nbh, nbw = nbdims[ci]
        stream = []
        pred = 0
        mcu = 0
        for by in range(nbh):
            for bx in range(nbw):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    stream.append(("rst",))
                    pred = 0
                mcu += 1
                dc = int(arr[by, bx, 0]) >> al
                diff = dc - pred
                pred = dc
                t = category(diff)
                stream.append(("sym", t))
                if t:
                    stream.append(
                        ("bits", diff if diff >= 0 else diff + (1 << t) - 1, t)
                    )
        return stream

    def dc_refine_stream_1(ci, al):
        arr = qzs[ci]
        nbh, nbw = nbdims[ci]
        stream = []
        mcu = 0
        for by in range(nbh):
            for bx in range(nbw):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    stream.append(("rst",))
                mcu += 1
                stream.append(("bits", (int(arr[by, bx, 0]) >> al) & 1, 1))
        return stream

    def ac_first_stream(ci, ss, se, al):
        arr = qzs[ci]
        nbh, nbw = nbdims[ci]
        stream = []
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            if eobrun:
                nb = eobrun.bit_length() - 1
                stream.append(("sym", nb << 4))
                if nb:
                    stream.append(("bits", eobrun - (1 << nb), nb))
                eobrun = 0

        mcu = 0
        for by in range(nbh):
            for bx in range(nbw):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    flush_eob()
                    stream.append(("rst",))
                mcu += 1
                vals = [
                    (1 if v >= 0 else -1) * (abs(int(v)) >> al)
                    for v in arr[by, bx, ss:se + 1]
                ]
                if not any(vals):
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                last_nz = max(i for i, v in enumerate(vals) if v)
                for v in vals[:last_nz + 1]:
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        stream.append(("sym", 0xF0))
                        run -= 16
                    s = category(v)
                    bits = v if v >= 0 else v + (1 << s) - 1
                    stream.append(("sym", (run << 4) | s))
                    stream.append(("bits", bits, s))
                    run = 0
                if last_nz < len(vals) - 1:
                    eobrun = 1
        flush_eob()
        return stream

    def ac_refine_stream(ci, ss, se, al):
        arr = qzs[ci]
        nbh, nbw = nbdims[ci]
        stream = []
        eobrun = 0
        pend = []  # correction bits buffered with the pending EOB run

        def flush_eob():
            nonlocal eobrun, pend
            if eobrun:
                nb = eobrun.bit_length() - 1
                stream.append(("sym", nb << 4))
                if nb:
                    stream.append(("bits", eobrun - (1 << nb), nb))
                for b in pend:
                    stream.append(("bits", b, 1))
                eobrun = 0
                pend = []

        mcu = 0
        for by in range(nbh):
            for bx in range(nbw):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    flush_eob()
                    stream.append(("rst",))
                mcu += 1
                band = [int(v) for v in arr[by, bx, ss:se + 1]]
                absv = [abs(v) >> al for v in band]
                eob_i = max((i for i, t in enumerate(absv) if t == 1),
                            default=-1)
                r = 0
                br_bits = []  # block-local buffered correction bits
                for i, t in enumerate(absv):
                    if t == 0:
                        r += 1
                        continue
                    while r > 15 and i <= eob_i:
                        flush_eob()
                        stream.append(("sym", 0xF0))
                        for b in br_bits:
                            stream.append(("bits", b, 1))
                        br_bits = []
                        r -= 16
                    if t > 1:  # already nonzero: correction bit
                        br_bits.append(t & 1)
                        continue
                    flush_eob()
                    stream.append(("sym", (r << 4) | 1))
                    stream.append(("bits", 1 if band[i] > 0 else 0, 1))
                    for b in br_bits:
                        stream.append(("bits", b, 1))
                    br_bits = []
                    r = 0
                if r > 0 or br_bits:
                    eobrun += 1
                    pend.extend(br_bits)
                    if eobrun == 0x7FFF:
                        flush_eob()
        flush_eob()
        return stream

    def render_scan(stream, tc):
        """Huffman-code a scan's symbol stream; returns (DHT, bytes)."""
        syms = {p[1] for p in stream if p[0] == "sym"}
        hmap, counts, vals = build_huff(syms)
        bw = BW()
        rst_i = 0
        for p in stream:
            if p[0] == "sym":
                code, length = hmap[p[1]]
                bw.emit(code, length)
            elif p[0] == "rst":
                bw.marker(0xD0 + (rst_i % 8))
                rst_i += 1
            else:
                bw.emit(p[1], p[2])
        dht = seg(0xC4, bytes([tc << 4]) + bytes(counts) + vals)
        return dht, bw.done()

    ncomp = len(planes)
    qtbl = bytes([0]) + bytes([quant] * 64)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci, (sh, sv) in enumerate(samps):
        sof += bytes([ci + 1, (sh << 4) | sv, 0])
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out = b"\xff\xd8" + seg(0xE0, app0) + seg(0xDB, qtbl)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xC2, sof)

    all_ids = [ci + 1 for ci in range(ncomp)]
    if dc_separate:
        # one non-interleaved DC scan chain per component
        for ci in range(ncomp):
            dht, body = render_scan(dc_first_stream_1(ci, al_levels), tc=0)
            out += dht + sos_seg([ci + 1], 0, 0, 0, al_levels) + body
        for al in range(al_levels - 1, -1, -1):
            for ci in range(ncomp):
                _, body = render_scan(dc_refine_stream_1(ci, al), tc=0)
                out += sos_seg([ci + 1], 0, 0, al + 1, al) + body
    else:
        # scan 1: DC first (interleaved) at Al=al_levels
        dht, body = render_scan(dc_first_stream(al_levels), tc=0)
        out += dht + sos_seg(all_ids, 0, 0, 0, al_levels) + body
        # DC refinement chain Ah=al..al-1..1 -> Al down to 0 (raw bits)
        for al in range(al_levels - 1, -1, -1):
            _, body = render_scan(dc_refine_stream(al), tc=0)
            out += sos_seg(all_ids, 0, 0, al + 1, al) + body
    # AC scans: luma split into spectral bands, chroma whole-band;
    # first scans at Al=al_levels, then a refinement chain per band
    bands = {0: [(1, 5), (6, 63)]}
    for ci in range(ncomp):
        for (bss, bse) in bands.get(ci, [(1, 63)]):
            dht, body = render_scan(
                ac_first_stream(ci, bss, bse, al_levels), tc=1
            )
            out += dht + sos_seg([ci + 1], bss, bse, 0, al_levels) + body
    for al in range(al_levels - 1, -1, -1):
        for ci in range(ncomp):
            for (bss, bse) in bands.get(ci, [(1, 63)]):
                dht, body = render_scan(
                    ac_refine_stream(ci, bss, bse, al), tc=1
                )
                out += dht + sos_seg([ci + 1], bss, bse, al + 1, al) + body
    return out + b"\xff\xd9"


def test_real_jpeg_grayscale_decode_psnr(spark):
    """A generated grayscale baseline JFIF decodes through the full
    decode_images Spark stage within a PSNR bound (IDCT rounding makes
    bit-exactness the wrong contract for JPEG, unlike PNG/BMP)."""
    rng = np.random.RandomState(31)
    base = rng.randint(0, 9, size=(3, 3)).repeat(8, 0).repeat(8, 1) * 28
    px = (base[:17, :21] + rng.randint(0, 8, size=(17, 21))).astype(np.uint8)
    rows = [asset(30, "image", _jpeg_bytes(px), "jpeg", 21, 17)]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    out = decode_images(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["height"], r["width"], r["channels"]) == (17, 21, 3)
    got = np.frombuffer(r["pixels"], dtype=np.uint8).reshape(17, 21, 3)
    assert np.array_equal(got[:, :, 0], got[:, :, 1])  # gray replicated
    assert _psnr(got[:, :, 0], px) > 30


def test_real_jpeg_color_444_and_420_psnr():
    """4:4:4 and 4:2:0 color JFIFs both decode within PSNR bounds on a
    smooth gradient (chroma subsampling halves chroma resolution, so
    the 4:2:0 bound is looser)."""
    from sf_datalake_spark.multimodal.jpeg import decode_jpeg

    hh, ww = 35, 29
    yy, xx = np.mgrid[0:hh, 0:ww]
    px = np.stack([
        (yy * 5 + 20) % 256, (xx * 5 + 80) % 256,
        ((yy + xx) * 3 + 40) % 256,
    ], axis=-1).astype(np.uint8)
    got444 = decode_jpeg(_jpeg_bytes(px, subsample=False))
    assert got444.shape == (hh, ww, 3)
    assert _psnr(got444, px) > 28
    got420 = decode_jpeg(_jpeg_bytes(px, subsample=True))
    assert got420.shape == (hh, ww, 3)
    assert _psnr(got420, px) > 24


def test_real_jpeg_restart_markers():
    """DRI + RSTn: DC predictors reset per interval; pixels match the
    no-restart encode of the same image."""
    from sf_datalake_spark.multimodal.jpeg import decode_jpeg

    rng = np.random.RandomState(40)
    px = rng.randint(0, 256, size=(24, 40), dtype=np.uint8)
    plain = decode_jpeg(_jpeg_bytes(px))
    rst = decode_jpeg(_jpeg_bytes(px, restart_interval=3))
    assert plain is not None and rst is not None
    assert np.array_equal(plain, rst)


def test_jpeg_rejects_unsupported_and_truncated():
    from sf_datalake_spark.multimodal.jpeg import decode_jpeg

    px = np.zeros((8, 8), dtype=np.uint8)
    good = _jpeg_bytes(px)
    # SOF2 marker on a BASELINE scan header: the SOS carries Se=63 with
    # Ss=0, which is invalid for a progressive DC scan — structurally
    # inconsistent, None (not a crash, not wrong pixels)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert decode_jpeg(prog) is None
    # lossless SOF3: genuinely unsupported SOF class
    assert decode_jpeg(good.replace(b"\xff\xc0", b"\xff\xc3", 1)) is None
    assert decode_jpeg(b"\x89PNG" + good) is None     # wrong magic
    assert decode_jpeg(good[:12]) is None             # truncated header


def test_real_jpeg_progressive_matches_baseline_exactly():
    """Progressive (SOF2) decode reconstructs the SAME quantized
    coefficients as the baseline encode of the same image, so the
    decoded pixels must be bit-identical across gray / 4:4:4 / 4:2:0 —
    a far stronger contract than a PSNR bound (round-5 verdict #5).
    The test encoder's scan script covers interleaved DC first +
    refinement, spectral band splits (1-5 / 6-63 luma), EOB-run
    coding, ZRL, and successive-approximation correction bits."""
    from sf_datalake_spark.multimodal.jpeg import decode_jpeg

    rng = np.random.RandomState(7)
    gray = (rng.randint(0, 9, size=(3, 3)).repeat(8, 0).repeat(8, 1)
            * 28)[:17, :21].astype(np.uint8)
    hh, ww = 35, 29
    yy, xx = np.mgrid[0:hh, 0:ww]
    color = np.stack([
        (yy * 5 + 20) % 256, (xx * 5 + 80) % 256, ((yy + xx) * 3 + 40) % 256,
    ], axis=-1).astype(np.uint8)
    noise = rng.randint(0, 256, size=(13, 50, 3)).astype(np.uint8)
    for px, sub in ((gray, False), (color, False), (color, True),
                    (noise, True), (noise, False)):
        base = decode_jpeg(_jpeg_bytes(px, subsample=sub))
        prog = decode_jpeg(_jpeg_progressive_bytes(px, subsample=sub))
        assert prog is not None
        assert np.array_equal(base, prog)
    assert _psnr(decode_jpeg(_jpeg_progressive_bytes(color, subsample=True)),
                 color) > 24


def test_real_jpeg_progressive_restart_markers():
    """DRI + RSTn inside progressive scans: DC predictors and EOB runs
    reset per interval in every scan; pixels match the no-restart
    progressive encode AND the baseline encode of the same image."""
    from sf_datalake_spark.multimodal.jpeg import decode_jpeg

    rng = np.random.RandomState(40)
    px = rng.randint(0, 256, size=(24, 40, 3), dtype=np.uint8)
    for sub in (False, True):
        plain = decode_jpeg(_jpeg_progressive_bytes(px, subsample=sub))
        rst = decode_jpeg(
            _jpeg_progressive_bytes(px, subsample=sub, restart_interval=3)
        )
        base = decode_jpeg(_jpeg_bytes(px, subsample=sub))
        assert plain is not None and rst is not None
        assert np.array_equal(plain, rst)
        assert np.array_equal(base, rst)


def test_real_jpeg_progressive_multilevel_successive_approx():
    """Real encoders emit Al chains deeper than one step (e.g. the
    libjpeg default scan script refines AC at Al=2 -> 1 -> 0): each
    refinement pass must correct already-nonzero coefficients by
    exactly one bit while inserting this level's newly-visible ±1<<Al
    coefficients.  Decoded pixels stay bit-equal to baseline through
    2- and 3-level chains, with and without restart markers."""
    from sf_datalake_spark.multimodal.jpeg import decode_jpeg

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(21, 37, 3)).astype(np.uint8)
    base = decode_jpeg(_jpeg_bytes(px, subsample=True))
    for al_levels in (2, 3):
        for rst in (0, 3):
            got = decode_jpeg(_jpeg_progressive_bytes(
                px, subsample=True, al_levels=al_levels,
                restart_interval=rst))
            assert got is not None
            assert np.array_equal(base, got)


def test_real_jpeg_progressive_separate_dc_scans():
    """Per-component (ns=1, non-interleaved) DC scans are valid
    progressive JPEG — the decoder must walk each component's OWN
    block raster, not the MCU grid.  Bit-equal to baseline with and
    without subsampling/restarts."""
    from sf_datalake_spark.multimodal.jpeg import decode_jpeg

    rng = np.random.RandomState(5)
    px = rng.randint(0, 256, size=(19, 43, 3)).astype(np.uint8)
    for sub in (False, True):
        base = decode_jpeg(_jpeg_bytes(px, subsample=sub))
        got = decode_jpeg(_jpeg_progressive_bytes(
            px, subsample=sub, dc_separate=True, al_levels=2,
            restart_interval=3))
        assert got is not None
        assert np.array_equal(base, got)


def test_real_jpeg_progressive_through_decode_images(spark):
    """A progressive JFIF decodes through the full Spark decode_images
    stage (same Arrow seam as baseline), matching the source within
    the SOF0 PSNR bound."""
    rng = np.random.RandomState(55)
    base = rng.randint(0, 9, size=(3, 3)).repeat(8, 0).repeat(8, 1) * 28
    px = (base[:19, :22] + rng.randint(0, 8, size=(19, 22))).astype(np.uint8)
    rows = [asset(31, "image", _jpeg_progressive_bytes(px), "jpeg", 22, 19)]
    df = spark.createDataFrame(rows, ASSET_SCHEMA)
    out = decode_images(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["height"], r["width"], r["channels"]) == (19, 22, 3)
    got = np.frombuffer(r["pixels"], dtype=np.uint8).reshape(19, 22, 3)
    assert _psnr(got[:, :, 0], px) > 30


def test_jpeg_ac_refine_raises_past_band_end():
    """Corrupt-stream contract parity between the two progressive AC
    paths: when a refinement scan's zero-run positions a pending
    ±1<<al insertion past the band end, `_prog_ac_refine` must raise
    (falling back to the deterministic stub) exactly like
    `_prog_ac_first` does — not silently drop the insertion and
    produce slightly-wrong pixels."""
    import pytest as _pytest

    from sf_datalake_spark.multimodal.jpeg import _prog_ac_refine

    class _FakeHuff:
        def decode(self, br):   # rs = (r=5)<<4 | (s=1): run past se=3
            return 0x51

    class _FakeBits:
        def bit(self):
            return 1

        def bits(self, n):
            return 0

    blk = [0] * 64
    with _pytest.raises(ValueError, match="past band end"):
        _prog_ac_refine(_FakeBits(), _FakeHuff(), blk, 1, 3, 0, 0)
    assert all(v == 0 for v in blk)  # nothing written before the raise


def test_jpeg_decoder_fuzz_never_crashes():
    """Byte-flip fuzz over valid encodes: every corruption either
    decodes (lenient truncation contract) or returns None — never an
    exception, never a pathological allocation (round-5 fuzz found
    StopIteration, OverflowError, ZeroDivisionError escapes and a
    34 GB allocation from a corrupt 65535x65535 SOF header; all are
    guarded now)."""
    import random

    from sf_datalake_spark.multimodal.jpeg import decode_jpeg

    random.seed(11)
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    pxc = np.arange(192, dtype=np.uint8).reshape(8, 8, 3)
    for base in (_jpeg_bytes(px), _jpeg_bytes(pxc, subsample=True),
                 _jpeg_progressive_bytes(pxc, subsample=True)):
        for _ in range(400):
            b = bytearray(base)
            for _ in range(random.randint(1, 10)):
                b[random.randrange(len(b))] = random.randrange(256)
            r = decode_jpeg(bytes(b))
            assert r is None or r.dtype == np.uint8
