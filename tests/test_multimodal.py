"""Multimodal binary-column plumbing tests (decode is a marked stub)."""

from __future__ import annotations

import hashlib

import pytest

from another_map_reduce_spark.operators.multimodal import (
    attach_binary_payload,
    decode_image_stub,
    extract_image_metadata,
)


def test_stub_contract():
    w, h = decode_image_stub(b"\x89PNG fake bytes")
    assert 1 <= w <= 64 and 1 <= h <= 32
    with pytest.raises(NotImplementedError):
        decode_image_stub(None)


def test_decode_image_fallback_without_pil():
    """No PIL in this container → decode_image ≡ the deterministic stub."""
    from another_map_reduce_spark.operators import multimodal as mm

    blob = b"not an image"
    assert mm.decode_image(blob) == decode_image_stub(blob)
    with pytest.raises(NotImplementedError):
        mm.decode_image(None)


def test_decode_image_uses_pil_when_present(monkeypatch):
    """With a PIL-shaped module present, decode_image returns its real
    dimensions for decodable payloads and still falls back to the stub
    for undecodable ones."""
    from another_map_reduce_spark.operators import multimodal as mm

    class _FakeIm:
        size = (640, 480)

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _FakeImageMod:
        @staticmethod
        def open(fp):
            if fp.read(4) == b"GOOD":
                return _FakeIm()
            raise OSError("cannot identify image file")

    monkeypatch.setattr(mm, "_PIL_IMAGE", _FakeImageMod)
    assert mm.decode_image(b"GOOD...rest") == (640, 480)
    bad = b"not decodable"
    assert mm.decode_image(bad) == decode_image_stub(bad)


def test_extract_metadata_roundtrip(spark):
    rows = [(1, "hello"), (2, "a longer document body"), (3, "")]
    df = attach_binary_payload(
        spark.createDataFrame(rows, "doc_id long, text string")
    )
    got = {r.doc_id: r for r in extract_image_metadata(df).collect()}
    for doc_id, text in rows:
        blob = text.encode()
        assert got[doc_id].n_bytes == len(blob)
        assert got[doc_id].content_md5 == hashlib.md5(blob).hexdigest()
        w, h = decode_image_stub(blob)
        assert (got[doc_id].width, got[doc_id].height) == (w, h)


def test_blob_column_not_in_output(spark):
    df = attach_binary_payload(
        spark.createDataFrame([(1, "x")], "doc_id long, text string")
    )
    out = extract_image_metadata(df)
    assert "payload" not in out.columns  # downstream shuffles metadata only


def test_sample_frames_explode_and_stride(spark):
    """Every stride-th fixed-size window appears with correct sizes and
    fingerprints; trailing partial frame kept; empty blob yields none."""
    import hashlib

    from pyspark.sql import Row

    from another_map_reduce_spark.operators.multimodal import sample_frames

    rows = [
        Row(doc_id=1, payload=bytes(range(0, 10))),   # 3 frames of 4
        Row(doc_id=2, payload=b""),                    # no frames
        Row(doc_id=3, payload=bytes(range(0, 4))),     # exactly 1 frame
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = sample_frames(df, frame_size=4, stride=2).collect()
    got = {(r.doc_id, r.frame_idx): (r.frame_bytes, r.frame_fp) for r in out}
    b1 = bytes(range(0, 10))
    fp = lambda fr: hashlib.md5(fr.hex().upper().encode()).hexdigest()
    assert got == {
        (1, 0): (4, fp(b1[0:4])),
        (1, 2): (2, fp(b1[8:10])),   # stride skips idx 1; partial kept
        (3, 0): (4, fp(bytes(range(0, 4)))),
    }


# ---------------------------------------------------------------------------
# Real decode path: genuine PNG bytes through the pure-stdlib decoder
# ---------------------------------------------------------------------------


def _encode_png(width, height, channels=3, filters=None):
    """Minimal PNG writer (test-side twin of decode_png_pure): 8-bit,
    non-interlaced, deterministic pixel ramp, one chosen filter type
    per scanline so every unfilter branch gets exercised."""
    import struct
    import zlib

    color = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    filters = filters or [0] * height
    stride = width * channels
    pixels = [
        [(x * 7 + y * 13 + c * 29) % 256 for x in range(width) for c in range(channels)]
        for y in range(height)
    ]
    raw = bytearray()
    prev = [0] * stride
    for y, ftype in zip(range(height), filters):
        line = pixels[y]
        out = list(line)
        if ftype == 1:
            for i in range(stride - 1, channels - 1, -1):
                out[i] = (line[i] - line[i - channels]) & 0xFF
        elif ftype == 2:
            out = [(line[i] - prev[i]) & 0xFF for i in range(stride)]
        elif ftype == 3:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                out[i] = (line[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                c = prev[i - channels] if i >= channels else 0
                p = a + prev[i] - c
                pa, pb, pc = abs(p - a), abs(p - prev[i]), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (prev[i] if pb <= pc else c)
                out[i] = (line[i] - pr) & 0xFF
        raw.append(ftype)
        raw += bytes(out)
        prev = line

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_pure_png_decode_all_filters():
    """A real 6x5 RGB PNG using every scanline filter type (None/Sub/
    Up/Average/Paeth) decodes to its true dimensions — the real path,
    no PIL, no monkeypatch."""
    from another_map_reduce_spark.operators import multimodal as mm

    png = _encode_png(6, 5, channels=3, filters=[0, 1, 2, 3, 4])
    assert mm.decode_png_pure(png) == (6, 5)
    assert mm.decode_image(png) == (6, 5)
    # grey and RGBA variants
    assert mm.decode_image(_encode_png(9, 2, channels=1)) == (9, 2)
    assert mm.decode_image(_encode_png(3, 7, channels=4)) == (3, 7)


def test_pure_png_decode_rejects_corruption():
    """Corruption at three layers falls back to the stub instead of
    returning bogus real-looking dims: a CRC mismatch, a damaged
    deflate stream WITH a recomputed (valid) CRC — exercising the
    inflate-layer rejection, not just the checksum — and truncation.
    Layout: signature 0-7, IHDR chunk 8-32, IDAT length 33-36, type
    37-40, payload from 41."""
    import struct
    import zlib

    from another_map_reduce_spark.operators import multimodal as mm

    png = bytearray(_encode_png(6, 5))
    png[45] ^= 0xFF  # inside IDAT payload → CRC mismatch
    assert mm.decode_png_pure(bytes(png)) is None
    assert mm.decode_image(bytes(png)) == decode_image_stub(bytes(png))

    # damage the deflate stream but FIX the CRC so the chunk walk
    # passes and the inflate/length layer must do the rejecting
    png2 = bytearray(_encode_png(6, 5))
    (idat_len,) = struct.unpack(">I", png2[33:37])
    png2[45] ^= 0xFF
    body = bytes(png2[37 : 41 + idat_len])  # type + payload
    png2[41 + idat_len : 45 + idat_len] = struct.pack(
        ">I", zlib.crc32(body) & 0xFFFFFFFF
    )
    assert mm.decode_png_pure(bytes(png2)) is None

    trunc = _encode_png(6, 5)[:30]
    assert mm.decode_png_pure(trunc) is None
    assert mm.decode_image(b"plain text payload") == decode_image_stub(
        b"plain text payload"
    )


def test_pure_png_decode_bounds_hostile_headers():
    """A bomb-shaped PNG (valid CRCs, huge declared dimensions, tiny
    high-ratio IDAT) is rejected by the pixel-count cap BEFORE any
    inflate, and an IDAT inflating past the declared size is cut off
    at max_length rather than expanded."""
    import struct
    import zlib

    from another_map_reduce_spark.operators import multimodal as mm

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 100_000, 100_000, 8, 0, 0, 0, 0)
    bomb = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 10_000_000))
        + chunk(b"IEND", b"")
    )
    assert len(bomb) < 20_000  # the whole point: tiny on disk
    assert mm.decode_png_pure(bomb) is None

    # declared 2x2 grey but IDAT inflates to far more than 2*(1+2)
    ihdr2 = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    overlong = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr2)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 1_000_000))
        + chunk(b"IEND", b"")
    )
    assert mm.decode_png_pure(overlong) is None


def test_pure_wav_decode_rejects_zero_rate():
    """A structurally valid WAV whose fmt chunk declares sample rate 0
    (stdlib wave does not validate) must be rejected, not crash the
    duration computation downstream."""
    import io
    import wave

    from another_map_reduce_spark.operators import multimodal as mm

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(1)  # placeholder; patch the rate field below
        w.writeframes(b"")
    b = bytearray(buf.getvalue())
    at = b.find(b"fmt ") + 12  # sample-rate field offset in fmt chunk
    b[at : at + 4] = (0).to_bytes(4, "little")
    assert mm.decode_wav_pure(bytes(b)) is None
    sr, ch, nf = mm.decode_audio(bytes(b))
    assert sr > 0  # stub path, safe for duration math


def test_extract_metadata_real_png_through_spark(spark):
    """End-to-end real decode on the Spark path: genuine PNG payloads
    flow through the Arrow-batched mapInPandas stage and come back with
    their TRUE dimensions (not the stub formula)."""
    from pyspark.sql import functions as F

    from another_map_reduce_spark.operators import multimodal as mm

    rows = [
        (1, bytearray(_encode_png(6, 5, filters=[0, 1, 2, 3, 4]))),
        (2, bytearray(_encode_png(40, 3, channels=4))),
        (3, bytearray(b"not an image at all")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: (r.width, r.height)
        for r in extract_image_metadata(df, decoder=mm.decode_image).collect()
    }
    assert got[1] == (6, 5)
    assert got[2] == (40, 3)
    assert got[3] == decode_image_stub(b"not an image at all")


# ---------------------------------------------------------------------------
# Real audio decode path: genuine WAV bytes through the stdlib parser
# ---------------------------------------------------------------------------


def _encode_wav(sample_rate=8000, channels=1, n_frames=800):
    """Real WAV writer (stdlib wave module): deterministic 16-bit ramp."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        frames = b"".join(
            struct.pack("<h", (i * 37) % 32768 - 16384)
            for i in range(n_frames * channels)
        )
        w.writeframes(frames)
    return buf.getvalue()


def test_pure_wav_decode_real_audio():
    from another_map_reduce_spark.operators import multimodal as mm

    wav = _encode_wav(8000, 1, 800)
    assert mm.decode_wav_pure(wav) == (8000, 1, 800)
    assert mm.decode_audio(wav) == (8000, 1, 800)
    stereo = _encode_wav(44100, 2, 441)
    assert mm.decode_audio(stereo) == (44100, 2, 441)


def test_pure_wav_decode_rejects_corruption():
    from another_map_reduce_spark.operators import multimodal as mm

    wav = _encode_wav(8000, 1, 800)
    trunc = wav[: len(wav) // 2]  # header intact, frames missing
    assert mm.decode_wav_pure(trunc) is None
    assert mm.decode_audio(trunc) == mm.decode_audio_stub(trunc)
    assert mm.decode_wav_pure(b"plain text") is None
    with pytest.raises(NotImplementedError):
        mm.decode_audio(None)


def test_extract_audio_metadata_real_wav_through_spark(spark):
    """Genuine WAV payloads flow through the Arrow-batched stage and
    come back with their TRUE sample rate / channels / duration."""
    from another_map_reduce_spark.operators import multimodal as mm

    rows = [
        (1, bytearray(_encode_wav(8000, 1, 800))),
        (2, bytearray(_encode_wav(16000, 2, 1600))),
        (3, bytearray(b"not audio")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {
        r.doc_id: (r.sample_rate, r.n_channels, r.n_frames, r.duration_ms)
        for r in mm.extract_audio_metadata(df).collect()
    }
    assert got[1] == (8000, 1, 800, 100)
    assert got[2] == (16000, 2, 1600, 100)
    sr, ch, nf = mm.decode_audio_stub(b"not audio")
    assert got[3] == (sr, ch, nf, nf * 1000 // sr)


def test_pure_png_over_unfilter_budget_reports_true_dims():
    """A structurally-valid PNG above the pure-unfilter pixel budget
    (but under the inflate byte budget) must report its TRUE header
    dimensions — not fall through to the stub's fabricated ones."""
    import struct
    import zlib

    from another_map_reduce_spark.operators import multimodal as mm

    w = h = 1200  # 1.44 Mpx > _PNG_MAX_PIXELS, raw ~1.4 MB << byte budget
    assert w * h > mm._PNG_MAX_PIXELS

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    raw = b"".join(b"\x00" + bytes(w) for _ in range(h))  # grey, filter 0
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    assert mm.decode_png_pure(png) == (w, h)
    # truncated pixel data at the same declared size must still reject
    short = b"".join(b"\x00" + bytes(w) for _ in range(h - 1))
    png_short = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(short))
        + chunk(b"IEND", b"")
    )
    assert mm.decode_png_pure(png_short) is None


# ---------------------------------------------------------------------------
# Perceptual hashing (aHash) + pigeonhole media dedup
# ---------------------------------------------------------------------------


def _ref_ahash(blob: bytes) -> int:
    """Independent pure-Python aHash (no numpy, no shared code path)."""
    n = len(blob)
    if n == 0:
        return 0
    total = sum(blob)
    h = 0
    for i in range(64):
        lo, hi = (i * n) // 64, ((i + 1) * n) // 64
        s = sum(blob[lo:hi])
        if s * n > total * (hi - lo):
            h |= 1 << i
    return h - (1 << 64) if h >= (1 << 63) else h


def test_ahash64_matches_reference():
    from another_map_reduce_spark.operators.multimodal import ahash64

    cases = [
        b"",
        b"x",
        b"short blob",  # n < 64: empty cells
        bytes(range(256)),
        b"\x00" * 100,  # all-equal bytes: no strict winner, hash 0
        hashlib.md5(b"seed").digest() * 40,
    ]
    for blob in cases:
        assert ahash64(blob) == _ref_ahash(blob), blob[:16]
    assert ahash64(b"\x00" * 100) == 0


def test_phash_pairs_planted_neardups_and_bruteforce_parity(spark):
    """A blob with a few flipped bytes lands within hamming ≤ 3 of its
    source and the pigeonhole join finds exactly the pairs a
    brute-force all-pairs scan finds (capture guarantee on real
    hashes)."""
    from pyspark.sql import functions as F

    from another_map_reduce_spark.operators.multimodal import (
        ahash64,
        perceptual_hash_frame,
        phash_pairs,
    )

    base = hashlib.sha256(b"media-blob").digest() * 16  # 512 bytes
    near = bytearray(base)
    near[10] ^= 0xFF  # perturb a couple of cells
    near = bytes(near)
    far = hashlib.sha256(b"other-media").digest() * 16
    blobs = [(1, base), (2, near), (3, far), (4, base)]  # 4 = exact dup
    df = spark.createDataFrame(blobs, "doc_id long, payload binary")

    hashed = perceptual_hash_frame(df)
    got = {(r.d1, r.d2): r.hamming for r in phash_pairs(hashed).collect()}

    # brute force over the same hashes
    hs = {r.doc: r.sh for r in hashed.collect()}
    want = {}
    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin((hs[a] ^ hs[b]) & ((1 << 64) - 1)).count("1")
            if d <= 3:
                want[(a, b)] = d
    assert got == want
    assert (1, 4) in got and got[(1, 4)] == 0  # exact dup found
    assert (1, 2) in got  # planted near-dup found
    assert not any(3 in p for p in got)  # unrelated blob excluded
    # and the UDF hash agrees with the local function on every blob
    for doc, blob in blobs:
        assert hs[doc] == ahash64(blob)


def test_ahash64_bigint_fallback_matches_numpy_path(monkeypatch):
    """Force the arbitrary-precision path with a tiny threshold: both
    paths must produce identical hashes (the int64-overflow guard for
    multi-GB blobs changes arithmetic width, never the result)."""
    from another_map_reduce_spark.operators import multimodal as mm

    blobs = [bytes(range(256)) * 3, hashlib.sha256(b"z").digest() * 10]
    fast = [mm.ahash64(b) for b in blobs]
    monkeypatch.setattr(mm, "_AHASH_NUMPY_MAX_N", 4)
    slow = [mm.ahash64(b) for b in blobs]
    assert fast == slow
    for b, h in zip(blobs, fast):
        assert h == _ref_ahash(b)


# ---------------------------------------------------------------------------
# r10: JPEG header rung + decoded-pixel (cross-encoding) media dedup
# ---------------------------------------------------------------------------


def _encode_jpeg_headers(width, height, progressive=False):
    """Minimal structurally-valid JPEG prefix: SOI, an APP0, a DQT,
    then a SOF frame header carrying the dimensions (entropy data is
    irrelevant to the header walk — truncated after SOF)."""
    import struct

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes(
        [3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    return (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xDB, bytes(65))
        + seg(0xC2 if progressive else 0xC0, sof)
    )


def test_jpeg_header_rung_dimensions():
    from another_map_reduce_spark.operators import multimodal as mm

    assert mm.decode_jpeg_headers(_encode_jpeg_headers(640, 480)) == (640, 480)
    assert mm.decode_jpeg_headers(
        _encode_jpeg_headers(31, 7, progressive=True)
    ) == (31, 7)
    # decode_image falls through PIL(absent)/PNG(not PNG) to the rung
    assert mm.decode_image(_encode_jpeg_headers(640, 480)) == (640, 480)
    # malformed: not JPEG, truncated length, zero dims, DHT-only
    assert mm.decode_jpeg_headers(b"\x89PNG\r\n\x1a\nxxxx") is None
    assert mm.decode_jpeg_headers(b"\xff\xd8\xff\xe0\xff\xff") is None
    assert mm.decode_jpeg_headers(_encode_jpeg_headers(0, 7)) is None
    import struct

    dht_only = b"\xff\xd8" + bytes([0xFF, 0xC4]) + struct.pack(">H", 5) + bytes(3)
    assert mm.decode_jpeg_headers(dht_only) is None


def test_png_luma_hash_is_encoding_invariant():
    """Two byte-disjoint PNG encodings of the SAME pixels (filter-0
    rows vs per-row Sub/Up/Avg/Paeth filters — completely different
    IDAT streams) produce the IDENTICAL decoded-luminance hash, while
    the raw-byte ahash64 of the same payloads differs — the point of
    hashing pixels, not bytes."""
    from another_map_reduce_spark.operators import multimodal as mm

    a = _encode_png(32, 24, channels=3, filters=[0] * 24)
    b = _encode_png(32, 24, channels=3, filters=([1, 2, 3, 4] * 6))
    assert bytes(a) != bytes(b)
    ha, hb = mm.png_luma_hash64(a), mm.png_luma_hash64(b)
    assert ha is not None and ha == hb
    assert mm.ahash64(a) != mm.ahash64(b)
    # ladder routes PNG payloads to the pixel hash
    assert mm.image_phash64(a) == ha == mm.image_phash64(b)
    # grey image exercises the ×1000 luma scaling branch
    g = _encode_png(16, 16, channels=1)
    assert mm.png_luma_hash64(g) is not None


def test_cross_encoding_pair_caught_by_phash_pairs(spark):
    """End-to-end cross-encoding media dedup on the Spark path: the
    planted same-pixels PNG pair (byte-disjoint encodings) is caught
    at hamming 0 by the pigeonhole join over image_phash64 hashes,
    among decoy blobs that match nothing."""
    from pyspark.sql import functions as F

    from another_map_reduce_spark.operators import multimodal as mm
    from another_map_reduce_spark.operators.multimodal import (
        perceptual_hash_frame,
        phash_pairs,
    )

    rows = [
        (1, bytearray(_encode_png(32, 24, filters=[0] * 24))),
        (2, bytearray(_encode_png(32, 24, filters=[1, 2, 3, 4] * 6))),
        (3, bytearray(_encode_png(32, 24, channels=4))),  # different pixels
        (4, bytearray(b"opaque non-image payload, hashed raw " * 40)),
        (5, bytearray(b"another unrelated decoy payload " * 53)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashed = perceptual_hash_frame(df).localCheckpoint(eager=True)
    pairs = {
        (r.d1, r.d2): r.hamming for r in phash_pairs(hashed, 3).collect()
    }
    assert pairs.get((1, 2)) == 0
    # the non-image decoys collide with nothing
    assert all({4, 5}.isdisjoint(p) for p in pairs)
    # brute-force parity: blocked pairs == all-pairs at the same radius
    hs = {r.doc: r.sh for r in hashed.collect()}
    brute = {
        (i, j): bin(hs[i] ^ hs[j]).count("1")
        for i in hs
        for j in hs
        if i < j and bin(hs[i] ^ hs[j]).count("1") <= 3
    }
    assert pairs == brute


def test_cross_format_png_jpeg_pair_with_pil():
    """Cross-FORMAT dedup (PNG vs JPEG of one picture) needs a pixel
    decoder for both formats — the PIL rung.  Skipped where PIL is
    absent (this container); the pure-PNG cross-encoding test above
    covers the no-library rung."""
    import pytest

    pytest.importorskip("PIL")
    import io

    from PIL import Image

    from another_map_reduce_spark.operators import multimodal as mm

    im = Image.new("RGB", (64, 48))
    im.putdata(
        [((x * 7) % 256, (y * 13) % 256, ((x + y) * 29) % 256)
         for y in range(48) for x in range(64)]
    )
    png_buf, jpg_buf = io.BytesIO(), io.BytesIO()
    im.save(png_buf, format="PNG")
    im.save(jpg_buf, format="JPEG", quality=92)
    hp = mm.image_phash64(png_buf.getvalue())
    hj = mm.image_phash64(jpg_buf.getvalue())
    assert bin(hp ^ hj).count("1") <= 3


def test_jpeg_header_rung_tolerates_fill_bytes():
    """Regression (r10 review): ISO 10918-1 B.1.1.2 allows any number
    of 0xFF fill bytes before a marker — a padded but spec-legal JPEG
    must still report true dimensions, not fall to the stub."""
    from another_map_reduce_spark.operators import multimodal as mm

    plain = _encode_jpeg_headers(44, 33)
    assert mm.decode_jpeg_headers(plain) == (44, 33)
    # insert fill bytes before the final (SOF) marker's 0xFF
    sof_at = plain.rindex(b"\xff\xc0")
    padded = plain[:sof_at] + b"\xff\xff\xff" + plain[sof_at:]
    assert mm.decode_jpeg_headers(padded) == (44, 33)
    # and before an intermediate (DQT) marker
    dqt_at = plain.index(b"\xff\xdb")
    padded2 = plain[:dqt_at] + b"\xff" + plain[dqt_at:]
    assert mm.decode_jpeg_headers(padded2) == (44, 33)


def test_mp4_parser_general_tables_beyond_fixture_writer():
    """The box-walk parser must handle layouts the fixture writer
    never emits: TWO chunks with different samples-per-chunk (real
    stsc runs), multi-run stts, fixed-size stsz, largesize mdat,
    and ABSENT stss (=> every sample is a sync sample)."""
    import struct

    from another_map_reduce_spark.operators.multimodal import (
        mp4_keyframe_index,
    )

    def box(t, body):
        return struct.pack(">I", 8 + len(body)) + t + body

    def full(t, body):
        return box(t, b"\x00\x00\x00\x00" + body)

    # 5 samples of 10 bytes each; chunk 1 holds 3 samples @ offset 40,
    # chunk 2 holds 2 samples @ offset 80
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0))
    stsz = full(b"stsz", struct.pack(">II", 10, 5))  # fixed size
    stsc = full(
        b"stsc",
        struct.pack(">I", 2)
        + struct.pack(">III", 1, 3, 1)
        + struct.pack(">III", 2, 2, 1),
    )
    stco = full(b"stco", struct.pack(">III", 2, 40, 80))
    # stts: 2 samples at delta 100, then 3 at delta 7
    stts = full(
        b"stts",
        struct.pack(">I", 2)
        + struct.pack(">II", 2, 100)
        + struct.pack(">II", 3, 7),
    )
    stbl = box(b"stbl", stts + stsz + stsc + stco)  # no stss
    moov = box(b"moov", box(b"trak", box(b"mdia", box(b"minf", stbl))))
    blob = ftyp + moov
    got = mp4_keyframe_index(blob)
    assert got == [
        (1, 40, 10, 0),
        (2, 50, 10, 100),
        (3, 60, 10, 200),
        (4, 80, 10, 207),
        (5, 90, 10, 214),
    ], got

    # 64-bit largesize on the moov container must still parse
    big_moov = (
        struct.pack(">I", 1)
        + b"moov"
        + struct.pack(">Q", 16 + len(moov) - 8)
        + moov[8:]
    )
    assert mp4_keyframe_index(ftyp + big_moov) == got

    # truncated stbl → [] (malformed, no crash)
    assert mp4_keyframe_index((ftyp + moov)[:-10]) in ([], got[:-1])


def test_mp4_fixture_writer_roundtrip_and_video_index(spark, sf_dir):
    from another_map_reduce_spark.operators.multimodal import (
        _MP4_FRAME,
        build_mp4,
        mp4_keyframe_index,
    )
    from another_map_reduce_spark.plans.pipeline import (
        multimodal_video_index,
    )

    payload = b"q" * 800  # 9 samples: sync 1,5,9; sample 9 is short
    kf = mp4_keyframe_index(build_mp4(payload))
    assert [s for s, *_ in kf] == [1, 5, 9]
    assert kf[1][1] == 24 + 4 * _MP4_FRAME
    assert kf[-1][2] == 800 - 8 * _MP4_FRAME  # short tail sync sample

    out = multimodal_video_index(spark, sf_dir)
    rows = out.limit(50).collect()
    assert rows and all(r.sample % 4 == 1 for r in rows)


def test_mp4_roundtrip_property():
    """Hypothesis roundtrip: for ANY payload size the fixture writer's
    container parses back to exactly the sync samples, offsets, sizes
    and dts the layout arithmetic predicts."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from another_map_reduce_spark.operators.multimodal import (
        _MP4_DELTA,
        _MP4_FRAME,
        _MP4_SYNC_EVERY,
        build_mp4,
        mp4_keyframe_index,
    )

    @settings(max_examples=60, deadline=None)
    @given(st.integers(min_value=0, max_value=5000))
    def check(nbytes):
        payload = bytes((i * 31 + 7) % 256 for i in range(nbytes))
        got = mp4_keyframe_index(build_mp4(payload))
        n = max(1, -(-nbytes // _MP4_FRAME))
        want = []
        for s in range(1, n + 1, _MP4_SYNC_EVERY):
            off = 24 + (s - 1) * _MP4_FRAME
            size = len(payload[(s - 1) * _MP4_FRAME: s * _MP4_FRAME])
            want.append((s, off, size, (s - 1) * _MP4_DELTA))
        assert got == want, (nbytes, got[:3], want[:3])

    check()


def _mp4_with_samples(samples):
    """General-layout MP4 writer for re-encoded-clip fixtures: each
    entry of ``samples`` becomes one whole sample (per-sample stsz
    sizes, single chunk, no stss ⇒ every sample is a sync sample per
    ISO 14496-12 8.6.2) — unlike build_mp4's fixed 96-byte chunking,
    so a keyframe can carry one complete PNG blob."""
    import struct

    def box(btype, body):
        return struct.pack(">I", 8 + len(body)) + btype + body

    def full(btype, body):
        return box(btype, b"\x00\x00\x00\x00" + body)

    n = len(samples)
    data = b"".join(bytes(s) for s in samples)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0))
    mdat = box(b"mdat", data)
    stts = full(b"stts", struct.pack(">III", 1, n, 512))
    stsz = full(
        b"stsz", struct.pack(f">II{n}I", 0, n, *[len(s) for s in samples])
    )
    stsc = full(b"stsc", struct.pack(">IIII", 1, 1, n, 1))
    stco = full(b"stco", struct.pack(">II", 1, len(ftyp) + 8))
    stbl = box(b"stbl", stts + stsz + stsc + stco)
    moov = box(b"moov", box(b"trak", box(b"mdia", box(b"minf", stbl))))
    return ftyp + mdat + moov


def test_keyframe_phash_catches_reencoded_clips(spark):
    """Two RE-ENCODED clips — same pictures, byte-disjoint containers
    (every keyframe is a PNG of the same pixels under different
    per-row filter choices, so the IDAT streams share no bytes) —
    collide on every (sample, keyframe hash) pair through the decode
    ladder, while a clip of different pixels and a raw-byte decoy
    match nothing: video near-dup joins the pixel-dedup ladder."""
    from pyspark.sql import functions as F

    from another_map_reduce_spark.operators import multimodal as mm
    from another_map_reduce_spark.operators.multimodal import (
        keyframe_phash,
    )

    frames_a = [
        _encode_png(32, 24, filters=[0] * 24),
        _encode_png(16, 16, channels=1),
    ]
    frames_b = [
        _encode_png(32, 24, filters=[1, 2, 3, 4] * 6),  # same pixels
        _encode_png(16, 16, channels=1),
    ]
    assert bytes(frames_a[0]) != bytes(frames_b[0])
    clips = [
        (1, bytearray(_mp4_with_samples(frames_a))),
        (2, bytearray(_mp4_with_samples(frames_b))),
        # the test ramp's aHash bit pattern is structural (identical
        # across channel counts), so the non-matching clip carries a
        # non-image sample instead of another ramp PNG
        (3, bytearray(_mp4_with_samples([b"unrelated keyframe " * 8]))),
        (4, bytearray(mm.build_mp4(b"raw text payload " * 30))),
    ]
    assert bytes(clips[0][1]) != bytes(clips[1][1])
    df = spark.createDataFrame(clips, "doc_id long, payload binary")
    kf = keyframe_phash(df).localCheckpoint(eager=True)
    rows = {(r.doc, r.sample): r.sh for r in kf.collect()}
    # re-encoded keyframes hash identically at every sync position
    assert rows[(1, 1)] == rows[(2, 1)]
    assert rows[(1, 2)] == rows[(2, 2)]
    # and the hash is the DECODED-pixel hash, not the raw-byte one
    assert rows[(1, 1)] == mm.png_luma_hash64(frames_a[0])
    assert rows[(1, 1)] != mm.ahash64(bytes(frames_a[0]))
    # positioned blocking join: only the re-encoded pair collides
    a, b = kf.alias("a"), kf.alias("b")
    pairs = {
        (r.d1, r.d2)
        for r in a.join(
            b,
            (F.col("a.sample") == F.col("b.sample"))
            & (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("d1"), F.col("b.doc").alias("d2"))
        .distinct()
        .collect()
    }
    assert pairs == {(1, 2)}


def test_wav_roundtrip_and_envelope_gain_invariance():
    """build_wav → wav_samples is lossless, and the envelope hash is
    EXACTLY invariant under integer gain (the re-encode property the
    audio axis rests on) while a genuinely different signal hashes
    differently."""
    import numpy as np

    from another_map_reduce_spark.operators.multimodal import (
        audio_phash64,
        build_wav,
        envelope_hash64_samples,
        wav_samples,
    )

    rng = np.random.default_rng(7)
    s = rng.integers(-8192, 8192, size=3001, dtype=np.int64)
    blob = build_wav(s)
    back = wav_samples(blob)
    assert back is not None and np.array_equal(back, s)
    h1 = envelope_hash64_samples(s)
    assert audio_phash64(blob) == h1
    for gain in (2, 3):
        assert audio_phash64(build_wav(s * gain)) == h1
        # byte-distinct payloads (exact dedup blind)
        assert build_wav(s * gain) != blob
    other = rng.integers(-8192, 8192, size=3001, dtype=np.int64)
    assert envelope_hash64_samples(other) != h1
    # non-WAV payloads take the raw-byte rung deterministically
    from another_map_reduce_spark.operators.multimodal import ahash64

    assert audio_phash64(b"not audio at all") == ahash64(
        b"not audio at all"
    )
    # malformed WAVs (truncated frames) are rejected, not measured
    assert wav_samples(blob[: len(blob) - 3]) is None
    assert envelope_hash64_samples(np.array([], dtype=np.int64)) == 0


def test_audio_phash_planted_reencode_recall(spark, sf_dir):
    """Every doc_id % 41 == 1 row is a 2x-gain re-encode of its
    predecessor's signal: the envelope index must report
    min_hamming == 0 for BOTH halves of every planted pair, and
    phash_pairs must surface each pair."""
    from pyspark.sql import functions as F

    from another_map_reduce_spark.operators.multimodal import (
        attach_wav_payload,
        audio_phash64,
        perceptual_hash_frame,
        phash_candidate_stats,
        phash_pairs,
    )
    from another_map_reduce_spark.sources.tables import load_table

    docs_tbl = load_table(spark, sf_dir, "documents")
    docs = attach_wav_payload(docs_tbl)
    hashed = perceptual_hash_frame(
        docs, hasher=audio_phash64
    ).localCheckpoint(eager=True)
    ids = {
        r.doc_id
        for r in docs_tbl.where(
            F.col("text").isNotNull() & (F.length("text") > 0)
        )
        .select("doc_id")
        .collect()
    }
    planted = {
        (i - 1, i) for i in ids if i % 41 == 1 and (i - 1) in ids
    }
    assert planted, "fixture has no planted pairs — widen the corpus"
    stats = {r.doc: r for r in phash_candidate_stats(hashed).collect()}
    for a, b in planted:
        assert stats[a].min_hamming == 0, (a, stats[a])
        assert stats[b].min_hamming == 0, (b, stats[b])
        assert stats[a].sh == stats[b].sh
    pairs = {
        (r.d1, r.d2) for r in phash_pairs(hashed, max_hamming=0).collect()
    }
    assert planted <= pairs
