"""Multimodal plumbing: payload stats, stubbed feature extraction, frame
sampling — real Spark-side schema/batching, stubbed codec kernels."""

import pytest

from etl_capnz_spark.operators.multimodal import (
    extract_features,
    payload_stats,
    sample_frames,
    synthesize_media,
)
from etl_capnz_spark.session import read_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    return synthesize_media(read_table(spark, sf_dir, "documents"))


def test_payload_stats_jvm_side(media):
    rows = payload_stats(media).collect()
    assert all(r["n_bytes"] > 0 for r in rows)
    assert not any(r["is_png"] or r["is_jpeg"] or r["is_riff"] for r in rows)


def test_extract_features_deterministic(media):
    a = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    b = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert a == b
    assert all(len(v) == 8 for v in a.values())
    assert all(0.0 <= x <= 1.0 for v in a.values() for x in v)


def test_real_decode_is_a_marked_seam(media):
    with pytest.raises(NotImplementedError):
        extract_features(media, decode_stub=False)
    with pytest.raises(NotImplementedError):
        sample_frames(media, decode_stub=False)


def test_sample_frames_shape(media):
    frames = sample_frames(media, n_frames=4).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    assert by_media
    for rows in by_media.values():
        assert len(rows) == 4
        idxs = sorted(r["frame_idx"] for r in rows)
        assert idxs == [0, 1, 2, 3]
        offs = [r["frame_offset"] for r in sorted(rows, key=lambda r: r["frame_idx"])]
        assert offs == sorted(offs)
        assert all(len(r["frame_digest"]) == 16 for r in rows)


def test_resize_media_plumbing(media):
    from etl_capnz_spark.operators.multimodal import resize_media

    n_in = media.count()
    out = resize_media(media, target_w=224, target_h=224)
    rows = out.collect()
    assert len(rows) == n_in  # 1:1 row mapping
    for r in rows:
        assert r["target_w"] == 224 and r["target_h"] == 224
        assert r["width"] >= 64 and r["height"] >= 64
        assert len(r["resized_sha1"]) == 40
    # deterministic kernel: same input, same output
    again = {r["media_id"]: r["resized_sha1"] for r in out.collect()}
    assert all(again[r["media_id"]] == r["resized_sha1"] for r in rows)
    with pytest.raises(NotImplementedError):
        resize_media(media, decode_stub=False)


def test_ppm_decode_real_and_isolates_malformed(spark):
    """The PPM path is a REAL decoder: a hand-built P6 image yields its
    true dims and channel means; malformed payloads yield NULL dims
    without failing the batch (row-level isolation)."""
    from etl_capnz_spark.operators.multimodal import decode_ppm_features

    good = b"P6\n2 1\n255\n" + bytes([10, 20, 30, 50, 60, 70])
    rows = [(1, bytearray(good)), (2, bytearray(b"not an image"))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in decode_ppm_features(df).collect()}
    assert (got[1]["width"], got[1]["height"]) == (2, 1)
    assert got[1]["mean_r"] == 30.0  # (10+50)/2
    assert got[1]["mean_g"] == 40.0
    assert got[1]["mean_b"] == 50.0
    assert got[2]["width"] is None and got[2]["mean_r"] is None


def test_wav_decode_real_and_isolates_malformed(spark):
    """The WAV path is a REAL decoder: a hand-built RIFF/PCM file yields
    its true rate/duration/RMS; junk bytes yield NULLs without failing
    the batch."""
    import struct

    import numpy as np

    from etl_capnz_spark.operators.multimodal import decode_wav_features

    samples = np.array([100, -100, 300, -300], dtype="<i2")
    data = samples.tobytes()
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, 4000, 8000, 2, 16)
    wav = (
        struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
        + fmt
        + struct.pack("<4sI", b"data", len(data))
        + data
    )
    rows = [(1, bytearray(wav)), (2, bytearray(b"RIFFjunk"))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in decode_wav_features(df).collect()}
    assert got[1]["sample_rate"] == 4000
    assert got[1]["n_samples"] == 4
    assert got[1]["duration_s"] == 0.001
    assert got[1]["rms"] == round(float(np.sqrt((samples.astype(float) ** 2).mean())), 6)
    assert got[2]["sample_rate"] is None


def test_y4m_decode_real_and_isolates_malformed(spark):
    """The Y4M path is a REAL container parser: a hand-built 2-frame
    video yields its true dims/frame count/luma mean; junk yields NULLs."""
    from etl_capnz_spark.operators.multimodal import decode_y4m_features

    f0, f1 = bytes([10, 20]), bytes([30, 40])
    y4m = b"YUV4MPEG2 W2 H1 F25:1 Cmono\n" + b"FRAME\n" + f0 + b"FRAME\n" + f1
    rows = [(1, bytearray(y4m)), (2, bytearray(b"YUV4MPEG2 garbage"))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in decode_y4m_features(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_frames"]) == (2, 1, 2)
    assert got[1]["mean_luma"] == 25.0
    assert got[2]["width"] is None


def test_phash_matches_reference_and_clusters_planted_dups(spark, sf_dir):
    """Distributed phash == pure-Python reference per image, and planted
    duplicates (pixel seed = doc_id % 7) cluster exactly by seed."""
    from etl_capnz_spark.operators.multimodal import (
        phash_ppm,
        phash_reference,
        synthesize_ppm_media,
    )
    from etl_capnz_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").limit(40)
    media = synthesize_ppm_media(docs, seed_mod=7).cache()
    got = {r["media_id"]: r["phash"] for r in phash_ppm(media).collect()}
    for r in media.collect():
        assert got[r["media_id"]] == phash_reference(bytes(r["payload"]))
    # same seed -> identical payload -> identical hash: clusters must
    # refine the seed partition (hash collisions across seeds allowed,
    # splits within a seed are NOT)
    seed_to_hashes = {}
    for mid, h in got.items():
        seed_to_hashes.setdefault(mid % 7, set()).add(h)
    assert all(len(hs) == 1 for hs in seed_to_hashes.values())
    media.unpersist()


def test_phash_malformed_payload_isolated(spark):
    from etl_capnz_spark.operators.multimodal import phash_ppm

    df = spark.createDataFrame(
        [(1, bytearray(b"P6\n8 6\n255\n" + bytes(144))), (2, bytearray(b"nope"))],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r["phash"] for r in phash_ppm(df).collect()}
    assert rows[1] is not None and rows[2] is None


def test_phash_arrow_equals_pandas_seam(spark, sf_dir):
    """mapInArrow and mapInPandas kernels must produce identical hashes
    — the RecordBatch seam is a faster boundary, not different math."""
    from etl_capnz_spark.operators.multimodal import (
        phash_ppm,
        phash_ppm_arrow,
        synthesize_ppm_media,
    )
    from etl_capnz_spark.session import read_table

    docs = read_table(spark, sf_dir, "documents").limit(30)
    media = synthesize_ppm_media(docs, seed_mod=11).cache()
    via_pandas = {r["media_id"]: r["phash"] for r in phash_ppm(media).collect()}
    via_arrow = {
        r["media_id"]: r["phash"] for r in phash_ppm_arrow(media).collect()
    }
    assert via_pandas == via_arrow and len(via_arrow) == 30
    media.unpersist()


def test_phash_custom_id_column_name_and_type(spark):
    """Output schema follows the caller's id column — name and type —
    through BOTH seams (ADVICE r3: was hardcoded 'media_id long')."""
    from etl_capnz_spark.operators.multimodal import (
        phash_ppm,
        phash_ppm_arrow,
    )

    df = spark.createDataFrame(
        [("img-a", bytearray(b"P6\n8 6\n255\n" + bytes(144)))],
        "asset_key string, payload binary",
    )
    for fn in (phash_ppm, phash_ppm_arrow):
        out = fn(df, id_col="asset_key")
        assert [f.name for f in out.schema.fields] == ["asset_key", "phash"]
        assert out.schema["asset_key"].dataType.simpleString() == "string"
        rows = out.collect()
        assert rows[0]["asset_key"] == "img-a" and rows[0]["phash"] is not None


# ----------------------------------------------------------- PNG codec
def test_png_round_trip_every_filter_type():
    """encode->decode is pixel-exact for ALL five RFC 2083 scanline
    filters (None/Sub/Up/Average/Paeth) — the decoder's reconstruction
    arithmetic is real, not a stub."""
    import numpy as np

    from etl_capnz_spark.operators.multimodal import (
        _png_pixels,
        decode_png,
        encode_png,
    )

    px = _png_pixels(7)
    for f in range(5):
        assert np.array_equal(decode_png(encode_png(px, f)), px), f


def test_png_crc_tamper_detected():
    import pytest as _pytest

    from etl_capnz_spark.operators.multimodal import (
        _png_pixels,
        decode_png,
        encode_png,
    )

    raw = bytearray(encode_png(_png_pixels(1), 0))
    raw[40] ^= 0xFF  # flip a byte inside a chunk body
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(raw))


def test_png_decode_features_with_malformed_isolation(spark):
    """Spark-side decode over real compressed payloads (Paeth filter);
    a garbage payload yields NULL dims without poisoning the batch."""
    import numpy as np

    from pyspark.sql import functions as F2

    from etl_capnz_spark.operators.multimodal import (
        _png_pixels,
        decode_png_features,
        encode_png,
        synthesize_png_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    media = synthesize_png_media(docs, filter_type=4)
    broken = spark.createDataFrame(
        [(99, bytearray(b"not a png at all"))], "media_id long, payload binary"
    )
    feats = decode_png_features(media.unionByName(broken))
    rows = {r["media_id"]: r for r in feats.collect()}
    assert rows[99]["width"] is None  # isolated, not raised
    for d in range(6):
        px = _png_pixels(d)
        assert rows[d]["width"] == 8 and rows[d]["height"] == 6
        assert rows[d]["mean_r"] == round(float(px[:, :, 0].mean()), 6)


# -------------------------------------------------------- mu-law codec
def test_mulaw_matches_audioop_full_domain():
    """Both codec directions byte-identical to CPython's audioop
    (the ITU G.711 reference implementation): compress over ALL 65536
    int16 inputs, expand over all 256 codes."""
    import numpy as np

    audioop = pytest.importorskip("audioop")
    from etl_capnz_spark.operators.multimodal import (
        mulaw_compress,
        mulaw_expand,
    )

    all16 = np.arange(-32768, 32768, dtype=np.int16)
    assert mulaw_compress(all16) == audioop.lin2ulaw(all16.tobytes(), 2)
    codes = bytes(range(256))
    assert np.array_equal(
        mulaw_expand(codes),
        np.frombuffer(audioop.ulaw2lin(codes, 2), dtype="<i2"),
    )


def test_mulaw_wav_decode_features(spark):
    """e2e: synthesized format-7 WAV payloads decode through the real
    G.711 expander; RMS equals the numpy recomputation; malformed
    payloads isolate to NULL rows."""
    import numpy as np

    from etl_capnz_spark.operators.multimodal import (
        WAV_N,
        decode_mulaw_wav_features,
        mulaw_compress,
        mulaw_expand,
        synthesize_mulaw_wav_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    media = synthesize_mulaw_wav_media(docs)
    broken = spark.createDataFrame(
        [(99, bytearray(b"RIFFxxxxJUNK"))], "media_id long, payload binary"
    )
    rows = {
        r["media_id"]: r
        for r in decode_mulaw_wav_features(media.unionByName(broken)).collect()
    }
    assert rows[99]["rms"] is None
    for d in range(5):
        s = np.array(
            [((d * 31 + i * 17) % 2048) - 1024 for i in range(WAV_N)],
            dtype=np.int16,
        )
        lin = mulaw_expand(mulaw_compress(s)).astype(np.float64)
        assert rows[d]["rms"] == round(float(np.sqrt((lin**2).mean())), 6)
        assert rows[d]["n_samples"] == WAV_N


# ------------------------------------------------------------ GIF codec
def test_gif_lzw_round_trip_and_width_growth():
    """encode->decode is pixel-exact, including a 200×180 image that
    forces LZW code widths past 6 bits and exercises dictionary
    growth — the real variable-width machinery, not a literal-only
    degenerate stream."""
    import numpy as np

    from etl_capnz_spark.operators.multimodal import (
        _gif_indices,
        _gif_palette,
        decode_gif,
        encode_gif,
    )

    pal = _gif_palette()

    def rgb_of(idx):
        return np.array(
            [pal[i] for i in idx.ravel()], dtype=np.uint8
        ).reshape(*idx.shape, 3)

    for d in (0, 7, 12345):
        idx = _gif_indices(d)
        assert np.array_equal(decode_gif(encode_gif(idx)), rgb_of(idx)), d
    big = (
        (np.arange(200)[:, None] * 5 + np.arange(180)[None, :] * 11) % 16
    ).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(big)), rgb_of(big))


def test_gif_lzw_kwkwk_case():
    """The KwKwK corner (decoder receives a code one past the table
    end): a run of identical pixels triggers it immediately."""
    import numpy as np

    from etl_capnz_spark.operators.multimodal import decode_gif, encode_gif

    idx = np.full((4, 10), 5, dtype=np.uint8)  # one flat color
    rec = decode_gif(encode_gif(idx))
    assert rec.shape == (4, 10, 3)
    assert (rec == rec[0, 0]).all()


def test_gif_decode_features_malformed_isolation(spark):
    import numpy as np

    from etl_capnz_spark.operators.multimodal import (
        _gif_indices,
        _gif_palette,
        decode_gif_features,
        synthesize_gif_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    media = synthesize_gif_media(docs)
    broken = spark.createDataFrame(
        [(99, bytearray(b"GIF89a but not really"))],
        "media_id long, payload binary",
    )
    rows = {
        r["media_id"]: r
        for r in decode_gif_features(media.unionByName(broken)).collect()
    }
    assert rows[99]["width"] is None
    pal = _gif_palette()
    for d in range(4):
        idx = _gif_indices(d)
        want_r = float(
            np.array([pal[i][0] for i in idx.ravel()]).mean()
        )
        assert rows[d]["mean_r"] == round(want_r, 6)
        assert rows[d]["width"] == 8


def test_mixed_codec_auto_dispatch(spark):
    """One pass over an interleaved PPM/PNG/GIF corpus routes each
    payload to the right decoder by magic bytes; unknown formats
    isolate to NULL rows."""
    from etl_capnz_spark.operators.multimodal import (
        decode_image_features_auto,
        synthesize_gif_media,
        synthesize_png_media,
        synthesize_ppm_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(9)], "doc_id long")
    media = (
        synthesize_ppm_media(docs.filter("doc_id % 3 = 0"))
        .unionByName(
            synthesize_png_media(docs.filter("doc_id % 3 = 1"), filter_type=2)
        )
        .unionByName(synthesize_gif_media(docs.filter("doc_id % 3 = 2")))
        .unionByName(
            spark.createDataFrame(
                [(99, bytearray(b"BM not supported"))],
                "media_id long, payload binary",
            )
        )
    )
    rows = {
        r["media_id"]: r
        for r in decode_image_features_auto(media).collect()
    }
    assert rows[99]["width"] is None
    for d in range(9):
        assert rows[d]["width"] == 8 and rows[d]["height"] == 6
        assert rows[d]["mean_r"] is not None


def test_jpeg_fast_decoder_equals_naive_reference():
    """The numpy matrix-IDCT decoder must equal the O(8^4) per-pixel
    reference EXACTLY (shared entropy decode, independent numerics:
    naive double-loop IDCT + per-pixel color floats) on gradients,
    random noise, multiple qualities and non-multiple-of-8 sizes —
    the full AC/Huffman/ZRL path, not just solid DC blocks."""
    import numpy as np

    from etl_capnz_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
        jpeg_reference_decode,
    )

    rng = np.random.RandomState(11)
    images = []
    yy, xx = np.mgrid[0:16, 0:24]
    images.append(
        np.stack(
            [(yy * 9 + xx * 3) % 256, (yy * 5) % 256, (xx * 11) % 256],
            axis=2,
        ).astype(np.uint8)
    )
    images.append(rng.randint(0, 256, (8, 8, 3)).astype(np.uint8))
    images.append(rng.randint(0, 256, (10, 13, 3)).astype(np.uint8))
    for px in images:
        for q in (50, 75, 90):
            raw = encode_jpeg(px, q)
            fast = decode_jpeg(raw)
            ref = jpeg_reference_decode(raw)
            assert fast.shape == px.shape
            assert np.array_equal(fast, ref), (px.shape, q)


def test_jpeg_solid_color_closed_form():
    """Solid 16x16 frames decode to a CONSTANT image whose value obeys
    the DC-only codec algebra the oracle mirrors in SQL: YCbCr with the
    pinned rounding, DC quantize at q75 steps (8 luma / 9 chroma),
    dequant, /8, color back. Luma (step 8) round-trips exactly."""
    import math

    import numpy as np

    from etl_capnz_spark.operators.multimodal import (
        _jpeg_solid_rgb,
        decode_jpeg,
        encode_jpeg,
    )

    def rhu(x):
        return math.floor(x + 0.5 + 1e-9)

    def clip(v):
        return min(255, max(0, v))

    for d in (0, 1, 7, 123, 255, 9999, 31337):
        r, g, b = _jpeg_solid_rgb(d)
        px = np.zeros((16, 16, 3), np.uint8)
        px[:, :] = (r, g, b)
        dec = decode_jpeg(encode_jpeg(px, 75))
        assert (dec == dec[0, 0]).all()  # still solid after decode
        y = clip(rhu(0.299 * r + 0.587 * g + 0.114 * b))
        cb = clip(rhu(-0.1687 * r - 0.3313 * g + 0.5 * b + 128.0))
        cr = clip(rhu(0.5 * r - 0.4187 * g - 0.0813 * b + 128.0))

        def dc_cycle(p, q):
            sign = 1 if p >= 128 else -1
            coef = sign * math.floor(abs(8 * (p - 128)) / q + 0.5)
            return clip(rhu(coef * q / 8.0 + 128.0))

        y2 = dc_cycle(y, 8)
        cb2 = dc_cycle(cb, 9)
        cr2 = dc_cycle(cr, 9)
        assert y2 == y  # luma step divides the DC gain exactly
        want = (
            clip(rhu(y2 + 1.402 * (cr2 - 128.0))),
            clip(rhu(y2 - 0.344136 * (cb2 - 128.0)
                     - 0.714136 * (cr2 - 128.0))),
            clip(rhu(y2 + 1.772 * (cb2 - 128.0))),
        )
        assert tuple(dec[0, 0]) == want, d
        # lossy but tight: chroma step 9 keeps solid colors within 2
        assert max(
            abs(int(a) - int(c)) for a, c in zip((r, g, b), want)
        ) <= 2


def test_jpeg_structural_rejections():
    """Honest scope: progressive (SOF2), restart intervals (DRI),
    subsampled frames and truncated streams raise ValueError — they
    isolate to NULL rows in the Spark path, never mis-decode."""
    import numpy as np
    import pytest as _pytest

    from etl_capnz_spark.operators.multimodal import (
        decode_jpeg,
        encode_jpeg,
    )

    px = np.zeros((8, 8, 3), np.uint8)
    raw = bytearray(encode_jpeg(px, 75))
    sof = raw.index(b"\xff\xc0")
    prog = bytearray(raw)
    prog[sof + 1] = 0xC2  # masquerade as progressive
    with _pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(prog))
    sub = bytearray(raw)
    sub[sof + 11] = 0x22  # claim 2x2 sampling for component 1
    with _pytest.raises(ValueError, match="subsampling"):
        decode_jpeg(bytes(sub))
    with _pytest.raises(ValueError):
        decode_jpeg(bytes(raw[: len(raw) // 2]))
    with _pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")


def test_jpeg_decode_features_malformed_isolation(spark):
    """Spark-side decode over real JPEG payloads; a garbage payload
    yields NULL dims without poisoning the batch (T8 discipline)."""
    from etl_capnz_spark.operators.multimodal import (
        decode_jpeg_features,
        synthesize_jpeg_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    media = synthesize_jpeg_media(docs)
    broken = spark.createDataFrame(
        [(99, bytearray(b"\xff\xd8 definitely not a scan"))],
        "media_id long, payload binary",
    )
    out = {
        r["media_id"]: r
        for r in media.unionByName(broken)
        .transform(decode_jpeg_features)
        .collect()
    }
    assert len(out) == 7
    assert out[99]["width"] is None and out[99]["mean_b"] is None
    for i in range(6):
        assert out[i]["width"] == 16 and out[i]["height"] == 16
        assert out[i]["mean_r"] is not None


def test_bmp_decode_real_parser_and_quirks(spark):
    """The 8th real codec (round 8): decode features must equal the
    closed-form pixel means, the TOP-row feature must prove the
    bottom-up flip happened, and a payload with mangled magic isolates
    to NULLs instead of failing the batch (T8)."""
    from etl_capnz_spark.operators.multimodal import (
        BMP_H,
        BMP_W,
        decode_bmp_features,
        synthesize_bmp_media,
    )

    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    media = synthesize_bmp_media(docs)
    rows = {r["media_id"]: r for r in decode_bmp_features(media).collect()}
    for doc in range(4):
        vals = {
            c: [
                (doc * 11 + (y * BMP_W + x) * 5 + c * 29) % 256
                for y in range(BMP_H)
                for x in range(BMP_W)
            ]
            for c in range(3)
        }
        r = rows[doc]
        assert r["width"] == BMP_W and r["height"] == BMP_H
        assert r["mean_r"] == round(sum(vals[0]) / len(vals[0]), 6)
        assert r["mean_g"] == round(sum(vals[1]) / len(vals[1]), 6)
        assert r["mean_b"] == round(sum(vals[2]) / len(vals[2]), 6)
        top = [
            (doc * 11 + (0 * BMP_W + x) * 5 + 0 * 29) % 256
            for x in range(BMP_W)
        ]
        # row-order-sensitive: equals the IMAGE top row, which is the
        # LAST row in the file — a decoder without the flip fails here
        assert r["top_row_mean_r"] == round(sum(top) / len(top), 6)

    # malformed payload isolates to NULL dims (T8 discipline)
    import pandas as pd

    def corrupt(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                b"XX" + bytes(p)[2:] for p in pdf["payload"]
            ]
            yield pdf

    bad = media.mapInPandas(corrupt, "media_id long, payload binary")
    out = decode_bmp_features(bad).collect()
    assert all(r["width"] is None and r["mean_r"] is None for r in out)
