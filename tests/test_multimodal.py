import hashlib

import pytest
from pyspark.sql import functions as F

from harvester_spark.operators.multimodal import (decode_real,
                                                  extract_features,
                                                  make_media_table,
                                                  resize_images, sample_frames,
                                                  FEATURE_DIM)


@pytest.fixture(scope="module")
def media(spark):
    return make_media_table(spark, n=32).cache()


def test_extract_features_shape_and_determinism(media):
    out = extract_features(media).toPandas().sort_values("media_id")
    assert len(out) == 32
    assert all(len(f) == FEATURE_DIM for f in out["features"])
    # deterministic: re-run gives identical features
    out2 = extract_features(media).toPandas().sort_values("media_id")
    assert all((a == b).all() for a, b in
               zip(out["features"], out2["features"]))
    # sha matches payload
    raw = media.toPandas().sort_values("media_id")
    for sha, p in zip(out["payload_sha256"], raw["payload"]):
        assert sha == hashlib.sha256(bytes(p)).hexdigest()


def test_resize_plumbing(media):
    out = resize_images(media, 224, 224).toPandas()
    assert (out["width"] == 224).all() and (out["height"] == 224).all()
    assert set(out["mime"]) <= {"image/x-portable-pixmap", "image/jpeg",
                                "image/png", "video/x-msvideo",
                                "video/mp4"}
    # AVI rows were genuinely re-encoded: every frame now 224x224
    from harvester_spark.operators.avicodec import decode_avi_mjpeg
    avi = out[out["mime"] == "video/x-msvideo"]
    assert len(avi) >= 1
    frames, meta = decode_avi_mjpeg(bytes(avi.iloc[0]["payload"]))
    assert frames and all(f.shape == (224, 224, 3) for f in frames)


def test_sample_frames(media):
    out = sample_frames(media, every_ms=1000).toPandas()
    assert set(out["media_id"]) == set(
        media.filter("mime like 'video%'").toPandas()["media_id"])
    g = out.groupby("media_id")["frame_idx"].agg(["min", "count"])
    assert (g["min"] == 0).all()
    assert (out["ts_ms"] == out["frame_idx"] * 1000).all()


def test_real_decoder_is_explicit_stub():
    # the declared boundary is codec-level now: an H.26x-coded MP4 track
    # raises NotImplementedError naming the codec (a non-ISO-BMFF payload
    # under video/mp4 is a plain parse error); unknown mimes keep the
    # explicit NotImplementedError contract
    import numpy as np

    from harvester_spark.operators.mp4codec import encode_mp4_mjpeg

    with pytest.raises(ValueError, match="ISO-BMFF"):
        decode_real(b"xx", "video/mp4")
    mp4 = bytearray(encode_mp4_mjpeg(
        [np.zeros((8, 8, 3), dtype=np.uint8)] * 2, fps=10))
    i = mp4.find(b"jpeg", mp4.find(b"stsd"))
    mp4[i:i + 4] = b"avc1"  # same tables, H.264 sample entry
    with pytest.raises(NotImplementedError, match="avc1"):
        decode_real(bytes(mp4), "video/mp4")
    with pytest.raises(NotImplementedError):
        decode_real(b"xx", "audio/mpeg")


def test_ppm_roundtrip_and_real_resize():
    import numpy as np
    from harvester_spark.operators.multimodal import (box_resize, decode_ppm,
                                                      encode_ppm)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(img)) == img).all()
    small = box_resize(img, 8, 5)
    assert small.shape == (5, 8, 3)


def test_wav_roundtrip_features():
    import numpy as np
    from harvester_spark.operators.multimodal import (decode_real, decode_wav,
                                                      encode_wav)
    t = np.arange(16_000)  # 1 second at 16 kHz
    samples = (10_000 * np.sin(2 * np.pi * 440 * t / 16_000)).astype(np.int16)
    x, rate = decode_wav(encode_wav(samples))
    assert rate == 16_000 and x.size == 16_000
    f = decode_real(encode_wav(samples), "audio/wav")
    assert len(f) == FEATURE_DIM
    assert abs(f[0] - 1.0) < 1e-3          # duration_s
    assert abs(f[2] - 10_000 / 32768 / np.sqrt(2)) < 1e-3  # sine RMS


def test_real_image_features(spark, media):
    import numpy as np
    out = extract_features(media, use_stub="auto").toPandas()
    raw = media.toPandas().set_index("media_id")
    for r in out.itertuples(index=False):
        if r.mime == "image/x-portable-pixmap":
            w, h = raw.loc[r.media_id, "width"], raw.loc[r.media_id, "height"]
            assert r.features[0] == w and r.features[1] == h
    # real resize changes payload bytes for PPMs
    rz = resize_images(media, 10, 10, use_stub="auto").toPandas()
    for r in rz.itertuples(index=False):
        if r.mime == "image/x-portable-pixmap":
            from harvester_spark.operators.multimodal import decode_ppm
            assert decode_ppm(bytes(r.payload)).shape == (10, 10, 3)


# ---------------------------------------------------------------------------
# in-engine baseline JPEG codec (operators/jpegcodec.py)
# ---------------------------------------------------------------------------

def test_jpeg_roundtrip_444_and_420():
    import numpy as np
    from harvester_spark.operators.jpegcodec import decode_jpeg, encode_jpeg
    x = np.linspace(0, 4 * np.pi, 70)        # 70x70: not block/MCU aligned
    img = np.zeros((70, 70, 3), dtype=np.uint8)
    img[..., 0] = ((np.outer(np.sin(x), np.cos(x)) + 1) * 120).astype(np.uint8)
    img[..., 1] = ((np.outer(np.cos(x), np.cos(x)) + 1) * 110).astype(np.uint8)
    img[..., 2] = np.linspace(0, 255, 70, dtype=np.uint8)[None, :]
    for sub, min_psnr in ((False, 38.0), (True, 30.0)):
        enc = encode_jpeg(img, quality=90, subsample=sub)
        assert enc[:2] == b"\xff\xd8" and enc[-2:] == b"\xff\xd9"
        dec = decode_jpeg(enc)
        assert dec.shape == img.shape
        err = dec.astype(float) - img.astype(float)
        psnr = 10 * np.log10(255 ** 2 / max((err ** 2).mean(), 1e-9))
        assert psnr > min_psnr, (sub, psnr)


def test_jpeg_roundtrip_property():
    """Smooth random images at assorted sizes/qualities survive the
    round trip within JPEG-typical error."""
    import numpy as np
    from harvester_spark.operators.jpegcodec import decode_jpeg, encode_jpeg
    rng = np.random.default_rng(9)
    for trial in range(6):
        h = int(rng.integers(8, 40))
        w = int(rng.integers(8, 40))
        base = rng.integers(0, 256, size=(3, 3, 3)).astype(np.float64)
        img = np.clip(np.kron(base, np.ones((16, 16, 1)))[:h, :w]
                      + rng.normal(0, 4, size=(h, w, 3)), 0,
                      255).astype(np.uint8)
        q = int(rng.choice([50, 75, 92]))
        sub = bool(rng.integers(0, 2))
        dec = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(float) - img.astype(float)).mean()
        assert err < 24, (trial, h, w, q, sub, err)


def test_jpeg_decode_rejects_non_baseline():
    import pytest as _pytest
    from harvester_spark.operators.jpegcodec import decode_jpeg
    with _pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"nope")
    # progressive SOF2 rejected with a clear message
    import struct
    sof2 = (b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 11)
            + bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    with _pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(sof2)


def test_jpeg_real_features_and_resize(spark, media):
    """image/jpeg rows now take the REAL path: features carry true
    dimensions; resize re-encodes an actual 10x10 JPEG."""
    import numpy as np
    from harvester_spark.operators.jpegcodec import decode_jpeg
    out = extract_features(media, use_stub="auto").toPandas()
    raw = media.toPandas().set_index("media_id")
    n_jpeg = 0
    for r in out.itertuples(index=False):
        if r.mime == "image/jpeg":
            n_jpeg += 1
            w, h = raw.loc[r.media_id, "width"], raw.loc[r.media_id, "height"]
            assert r.features[0] == w and r.features[1] == h
    assert n_jpeg > 0
    rz = resize_images(media, 10, 10, use_stub="auto").toPandas()
    for r in rz.itertuples(index=False):
        if r.mime == "image/jpeg":
            assert decode_jpeg(bytes(r.payload)).shape == (10, 10, 3)


# ---------------------------------------------------------------------------
# in-engine PNG codec (operators/pngcodec.py)
# ---------------------------------------------------------------------------

def test_png_lossless_all_filters():
    import numpy as np
    from harvester_spark.operators.pngcodec import decode_png, encode_png
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(23, 37, 3), dtype=np.uint8)
    for ft in range(5):
        assert (decode_png(encode_png(img, filter_type=ft)) == img).all()
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png")


def test_png_real_features_and_resize(spark, media):
    from harvester_spark.operators.pngcodec import decode_png
    out = extract_features(media, use_stub="auto").toPandas()
    raw = media.toPandas().set_index("media_id")
    n_png = 0
    for r in out.itertuples(index=False):
        if r.mime == "image/png":
            n_png += 1
            w, h = raw.loc[r.media_id, "width"], raw.loc[r.media_id, "height"]
            assert r.features[0] == w and r.features[1] == h
    assert n_png > 0
    rz = resize_images(media, 12, 9, use_stub="auto").toPandas()
    for r in rz.itertuples(index=False):
        if r.mime == "image/png":
            assert decode_png(bytes(r.payload)).shape == (9, 12, 3)


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn layout (error-resilience framing real encoders emit) must
    decode identically to the unframed stream."""
    import numpy as np
    from harvester_spark.operators.jpegcodec import decode_jpeg, encode_jpeg
    x = np.linspace(0, 4 * np.pi, 40)
    img = np.zeros((40, 40, 3), dtype=np.uint8)
    img[..., 0] = ((np.outer(np.sin(x), np.cos(x)) + 1) * 120).astype(np.uint8)
    img[..., 1] = 90
    img[..., 2] = np.linspace(0, 255, 40, dtype=np.uint8)[None, :]
    for sub in (False, True):
        plain = decode_jpeg(encode_jpeg(img, quality=88, subsample=sub))
        for ri in (1, 3):
            framed = decode_jpeg(encode_jpeg(img, quality=88, subsample=sub,
                                             restart_interval=ri))
            assert (framed == plain).all(), (sub, ri)


def test_jpeg_huffman_nonuniform_table():
    """The decoder must handle real-world VARIABLE-length canonical
    tables (our encoder only emits fixed-length ones): write symbols with
    the T.81 K.3-shaped DC table, read them back."""
    from harvester_spark.operators.jpegcodec import (_BitReader, _BitWriter,
                                                     _HuffDecoder,
                                                     _canonical_codes)
    bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]  # K.3 shape
    vals = list(range(12))
    codes = _canonical_codes(bits, vals)
    lengths = {s: ln for s, (c, ln) in codes.items()}
    assert lengths[0] == 2 and lengths[5] == 3 and lengths[11] == 9
    bw = _BitWriter()
    seq = [0, 11, 5, 3, 7, 1, 9, 2, 0, 11]
    for s in seq:
        c, ln = codes[s]
        bw.write(c, ln)
    payload = bw.flush() + b"\xff\xd9"  # terminator so reads can't run off
    dec = _HuffDecoder(bits, vals)
    br = _BitReader(payload, 0)
    assert [dec.decode(br) for _ in seq] == seq


def test_avi_mjpeg_roundtrip():
    import numpy as np

    from harvester_spark.operators.avicodec import (decode_avi_mjpeg,
                                                    encode_avi_mjpeg,
                                                    probe_avi)

    rng = np.random.default_rng(3)
    base = rng.integers(0, 256, (3, 2, 3), dtype=np.uint8)
    # 8x8-aligned flat cells: JPEG loss stays near zero, so the tolerance
    # below actually tests the container framing, not codec noise
    frames = [np.repeat(np.repeat(base, 8, axis=0), 8, axis=1)
              for _ in range(4)]
    avi = encode_avi_mjpeg(frames, fps=8)
    meta = probe_avi(avi)
    assert meta == {"n_frames": 4, "width": 16, "height": 24, "fps": 8,
                    "frame_sizes": meta["frame_sizes"]}
    assert len(meta["frame_sizes"]) == 4
    out, meta2 = decode_avi_mjpeg(avi)
    assert len(out) == 4 and out[0].shape == (24, 16, 3)
    for a, b in zip(frames, out):
        assert np.abs(a.astype(int) - b.astype(int)).mean() < 3.0

    with pytest.raises(ValueError, match="RIFF"):
        probe_avi(b"garbage" * 10)
    with pytest.raises(ValueError, match="one size"):
        encode_avi_mjpeg([frames[0], frames[0][:8]])
    with pytest.raises(ValueError, match="at least one"):
        encode_avi_mjpeg([])


def test_avi_real_features_and_frame_sampling(spark, media):
    import hashlib

    import numpy as np

    from harvester_spark.operators.avicodec import decode_avi_mjpeg
    from harvester_spark.operators.multimodal import (decode_real,
                                                      extract_features)

    avis = media.filter(F.col("mime") == "video/x-msvideo").toPandas()
    assert len(avis) >= 1, "media table must contain real AVI rows"
    r = avis.iloc[0]
    feats = decode_real(bytes(r["payload"]), "video/x-msvideo")
    frames, meta = decode_avi_mjpeg(bytes(r["payload"]))
    assert feats[0] == len(frames)
    assert feats[1] == r["width"] and feats[2] == r["height"]

    # extract_features 'auto' must use the REAL decoder for AVI: its
    # first feature is the frame count, which the sha-derived stub can
    # only hit by 1e-4 chance
    out = (extract_features(media).toPandas()
           .set_index("media_id"))
    got = out.loc[r["media_id"], "features"]
    assert got[0] == len(frames)

    # real frame sampling: sha of the DECODED first frame
    sampled = sample_frames(media, every_ms=1000).toPandas()
    mine = sampled[sampled["media_id"] == r["media_id"]]
    assert len(mine) >= 1
    want_sha = hashlib.sha256(frames[0].tobytes()).hexdigest()
    assert mine.iloc[0]["frame_sha256"] == want_sha


def test_avi_rec_list_and_selective_decode():
    """Frames inside the common 'LIST rec' grouping must be found, and
    decode_avi_frames must decode only the requested indices."""
    import struct

    import numpy as np

    from harvester_spark.operators.avicodec import (decode_avi_frames,
                                                    decode_avi_mjpeg,
                                                    encode_avi_mjpeg,
                                                    probe_avi)

    rng = np.random.default_rng(9)
    base = rng.integers(0, 256, (2, 2, 3), dtype=np.uint8)
    frames = [np.repeat(np.repeat(base + 10 * i, 8, axis=0), 8, axis=1)
              .astype(np.uint8) for i in range(3)]
    avi = bytearray(encode_avi_mjpeg(frames, fps=10))

    # rewrap the movi payload chunks inside a LIST rec (in place):
    # find movi, then wrap its chunk run
    i = avi.find(b"LIST", 12)
    while avi[i + 8:i + 12] != b"movi":
        i = avi.find(b"LIST", i + 1)
    (movi_sz,) = struct.unpack_from("<I", avi, i + 4)
    inner = bytes(avi[i + 12:i + 8 + movi_sz])
    rec = b"LIST" + struct.pack("<I", 4 + len(inner)) + b"rec " + inner
    rewrapped = (bytes(avi[:i + 8]) + b"movi" + rec + bytes(avi[i + 8 + movi_sz:]))
    rewrapped = bytearray(rewrapped)
    struct.pack_into("<I", rewrapped, i + 4, 4 + len(rec))
    struct.pack_into("<I", rewrapped, 4, len(rewrapped) - 8)
    rewrapped = bytes(rewrapped)

    meta = probe_avi(rewrapped)
    assert meta["n_frames"] == 3, meta
    out, _ = decode_avi_mjpeg(rewrapped)
    assert len(out) == 3

    sel = decode_avi_frames(bytes(avi), [0, 2])
    assert sorted(sel) == [0, 2]
    ref, _ = decode_avi_mjpeg(bytes(avi))
    assert (sel[2] == ref[2]).all()


def test_avi_degenerate_payload_clean_error():
    from harvester_spark.operators.avicodec import probe_avi
    from harvester_spark.operators.multimodal import decode_real

    # parseable RIFF with an empty movi list
    import struct
    movi = b"LIST" + struct.pack("<I", 4) + b"movi"
    body = b"AVI " + movi
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    assert probe_avi(payload)["n_frames"] == 0
    with pytest.raises(ValueError, match="no decodable frames"):
        decode_real(payload, "video/x-msvideo")


def test_avi_zero_frame_guards_resize_and_sample(spark):
    """r4 ADVICE: the resize path must fail a 0-frame-but-parseable AVI
    with the same clean per-row error as decode_real (not
    encode_avi_mjpeg's 'need at least one frame'), and sample_frames must
    raise rather than emit fabricated stub shas for a REAL container."""
    import struct

    from harvester_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                      resize_images,
                                                      sample_frames)

    movi = b"LIST" + struct.pack("<I", 4) + b"movi"
    body = b"AVI " + movi
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    media = spark.createDataFrame(
        [(0, "video/x-msvideo", bytearray(payload), None, None, 1000)],
        MEDIA_SCHEMA)
    for op in (lambda: resize_images(media, 8, 8).collect(),
               lambda: sample_frames(media, every_ms=500).collect()):
        with pytest.raises(Exception) as ei:
            op()
        assert "no decodable frames" in str(ei.value) \
            or "no frames to sample" in str(ei.value)


def test_mp4_roundtrip_probe_and_selective_decode():
    """ISO-BMFF Motion-JPEG: encode -> probe (no decode) -> selective
    frame decode -> full decode round-trip within JPEG tolerance."""
    import numpy as np

    from harvester_spark.operators.mp4codec import (decode_mp4_frames,
                                                    decode_mp4_jpeg,
                                                    encode_mp4_mjpeg,
                                                    is_jpeg_coded_mp4,
                                                    probe_mp4)

    rng = np.random.default_rng(5)
    base = rng.integers(0, 256, (2, 2, 3), dtype=np.uint8)
    frames = [np.repeat(np.repeat(base + 11 * i, 8, axis=0), 8, axis=1)
              .astype(np.uint8) for i in range(4)]
    mp4 = encode_mp4_mjpeg(frames, fps=8)

    meta = probe_mp4(mp4)
    assert meta["n_frames"] == 4
    assert meta["width"] == 16 and meta["height"] == 16
    assert meta["fps"] == 8
    assert meta["codec"] == "jpeg"
    assert is_jpeg_coded_mp4(mp4)
    assert not is_jpeg_coded_mp4(b"RIFFxxxxAVI " + b"\x00" * 64)
    assert not is_jpeg_coded_mp4(b"\x00" * 80)

    sel = decode_mp4_frames(mp4, [0, 3])
    assert sorted(sel) == [0, 3]
    full, meta2 = decode_mp4_jpeg(mp4)
    assert len(full) == 4
    assert (sel[3] == full[3]).all()
    for want, got in zip(frames, full):
        assert np.abs(want.astype(int) - got.astype(int)).max() <= 24


def test_mp4_real_features_sampling_resize(spark, media):
    """The media table's real MP4 rows must route through the in-engine
    ISO-BMFF decoder in auto mode (features = frame count, not stub sha),
    sample REAL frame shas, and resize frame-wise; opaque mp4 payloads
    stay on the stub path."""
    import hashlib

    import numpy as np

    from harvester_spark.operators.mp4codec import (decode_mp4_jpeg,
                                                    is_jpeg_coded_mp4,
                                                    probe_mp4)
    from harvester_spark.operators.multimodal import (decode_real,
                                                      extract_features,
                                                      resize_images)

    pdf = media.filter(F.col("mime") == "video/mp4").toPandas()
    real = [r for _, r in pdf.iterrows()
            if is_jpeg_coded_mp4(bytes(r["payload"]))]
    stub = [r for _, r in pdf.iterrows()
            if not is_jpeg_coded_mp4(bytes(r["payload"]))]
    assert real and stub, "media table needs real AND opaque mp4 rows"
    r = real[0]
    frames, meta = decode_mp4_jpeg(bytes(r["payload"]))
    feats = decode_real(bytes(r["payload"]), "video/mp4")
    assert feats[0] == len(frames)
    assert feats[1] == r["width"] and feats[2] == r["height"]

    out = extract_features(media).toPandas().set_index("media_id")
    assert out.loc[r["media_id"], "features"][0] == len(frames)
    # opaque row: stub features (sha-derived, in [0,1) — frame count
    # would be >= 1 at index 0 only by chance; check it's NOT a real
    # decode by verifying determinism against the stub function
    from harvester_spark.operators.multimodal import decode_stub_features
    s = stub[0]
    np.testing.assert_allclose(
        out.loc[s["media_id"], "features"],
        decode_stub_features(bytes(s["payload"]), "video/mp4"), rtol=1e-6)

    sampled = sample_frames(media, every_ms=1000).toPandas()
    mine = sampled[sampled["media_id"] == r["media_id"]]
    assert len(mine) >= 1
    want_sha = hashlib.sha256(frames[0].tobytes()).hexdigest()
    assert mine.iloc[0]["frame_sha256"] == want_sha

    resized = resize_images(media, 8, 8).toPandas().set_index("media_id")
    rp = bytes(resized.loc[r["media_id"], "payload"])
    rframes, rmeta = decode_mp4_jpeg(rp)
    assert len(rframes) == len(frames)
    assert rframes[0].shape == (8, 8, 3)
    # opaque mp4 keeps identity payload in auto mode
    assert bytes(resized.loc[stub[0]["media_id"], "payload"]) \
        == bytes(stub[0]["payload"])


def test_mp4_multichunk_and_co64_demux():
    """The reader must honor stsc runs (samples spread over several
    chunks) and 64-bit co64 offsets — layouts real muxers emit that our
    single-chunk encoder does not. Built by hand from the same boxes."""
    import struct

    import numpy as np

    from harvester_spark.operators.jpegcodec import encode_jpeg
    from harvester_spark.operators.mp4codec import (_box, _full,
                                                    decode_mp4_frames,
                                                    probe_mp4)

    frames = [np.full((8, 8, 3), 40 * i, dtype=np.uint8) for i in range(5)]
    jpegs = [encode_jpeg(f, quality=90) for f in frames]
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom")
    mdat = _box(b"mdat", b"".join(jpegs))
    base = len(ftyp) + 8
    offs = [base]
    for j in jpegs[:-1]:
        offs.append(offs[-1] + len(j))
    # chunks: [s0, s1] [s2, s3] [s4] -> stsc runs (1,2),(3,1... wait spec:
    # run entries are (first_chunk, samples_per_chunk, sdi); chunk 3 has 1
    chunk_offs = [offs[0], offs[2], offs[4]]
    stsd = _full(b"stsd", struct.pack(">I", 1) + _box(
        b"jpeg", struct.pack(">6xH", 1) + struct.pack(">HH12x", 0, 0)
        + struct.pack(">HH", 8, 8) + struct.pack(">II", 0x480000, 0x480000)
        + struct.pack(">IH", 0, 1) + b"\x05mjpeg" + b"\x00" * 26
        + struct.pack(">Hh", 24, -1)))
    stts = _full(b"stts", struct.pack(">III", 1, 5, 100))
    stsc = _full(b"stsc", struct.pack(">I", 2)
                 + struct.pack(">III", 1, 2, 1)    # chunks 1-2: 2 samples
                 + struct.pack(">III", 3, 1, 1))   # chunk 3: 1 sample
    stsz = _full(b"stsz", struct.pack(">II", 0, 5)
                 + b"".join(struct.pack(">I", len(j)) for j in jpegs))
    co64 = _full(b"co64", struct.pack(">I", 3)
                 + b"".join(struct.pack(">Q", c) for c in chunk_offs))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + co64)
    minf = _box(b"minf", _full(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0),
                               flags=1)
                + _box(b"dinf", _full(b"dref", struct.pack(">I", 1)
                                      + _full(b"url ", b"", flags=1)))
                + stbl)
    mdhd = _full(b"mdhd", struct.pack(">IIIIHH", 0, 0, 1000, 500,
                                      0x55C4, 0))
    hdlr = _full(b"hdlr", struct.pack(">I", 0) + b"vide"
                 + struct.pack(">III", 0, 0, 0) + b"V\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", struct.pack(">IIIII", 0, 0, 1, 0, 500)
                 + struct.pack(">8x i H H", 0, 0, 0)
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                 + struct.pack(">II", 8 << 16, 8 << 16), flags=3)
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", struct.pack(">IIII", 0, 0, 1000, 500)
                 + struct.pack(">iH H 8x", 0x00010000, 0x0100, 0)
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                 + struct.pack(">6I", 0, 0, 0, 0, 0, 0)
                 + struct.pack(">I", 2))
    mp4 = ftyp + mdat + _box(b"moov", mvhd + trak)

    meta = probe_mp4(mp4)
    assert meta["n_frames"] == 5 and meta["fps"] == 10
    dec = decode_mp4_frames(mp4)
    assert sorted(dec) == [0, 1, 2, 3, 4]
    for i, f in enumerate(frames):
        assert np.abs(dec[i].astype(int) - f.astype(int)).max() <= 16, i


def test_mp4_corrupt_tables_clean_errors():
    """Review findings: a corrupt stsz count must not allocate (OOM bomb
    inside the cheap dispatch probe), and truncated tables must raise a
    clean ValueError, never a raw struct.error."""
    import struct

    import numpy as np

    from harvester_spark.operators.mp4codec import (encode_mp4_mjpeg,
                                                    is_jpeg_coded_mp4,
                                                    probe_mp4)

    mp4 = bytearray(encode_mp4_mjpeg(
        [np.zeros((8, 8, 3), dtype=np.uint8)] * 2, fps=10))
    # corrupt the stsz: fixed size 1, sample_count 0xFFFFFFFF
    z = mp4.find(b"stsz")
    struct.pack_into(">II", mp4, z + 8, 1, 0xFFFFFFFF)
    with pytest.raises(ValueError, match="stsz declares"):
        probe_mp4(bytes(mp4))
    assert is_jpeg_coded_mp4(bytes(mp4)) is False  # and returns fast

    # truncate mid-tables: clean ValueError (moov box claims more than
    # the remaining bytes -> the walk stops; no trak tables found)
    good = encode_mp4_mjpeg([np.zeros((8, 8, 3), dtype=np.uint8)] * 2)
    with pytest.raises(ValueError):
        probe_mp4(good[:len(good) - 40])
    assert is_jpeg_coded_mp4(good[:len(good) - 40]) is False
