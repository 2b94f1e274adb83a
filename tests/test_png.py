"""Pure-numpy PNG codec: roundtrip fidelity for every supported channel
count, decoder inverses for every filter type (including hand-filtered
Average/Paeth scanlines the encoder never emits), and loud failures on
the unsupported subset."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pyrle_spark.functions.multimodal import decode_image
from pyrle_spark.functions.png import _SIG, _chunk, decode_png, encode_png


def _pixels(h, w, c, seed=7):
    n = h * w * c
    return ((seed * 31 + 7 * np.arange(n, dtype=np.int64)) % 256).astype(
        np.uint8
    ).reshape(h, w, c)


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_roundtrip_channels(c):
    px = _pixels(13, 17, c)
    out = decode_png(encode_png(px))
    assert out.shape == (13, 17, c)
    assert np.array_equal(out, px)


@pytest.mark.parametrize("ft", [0, 1, 2])
def test_roundtrip_encoder_filters(ft):
    px = _pixels(9, 11, 3, seed=ft + 1)
    assert np.array_equal(decode_png(encode_png(px, filter_type=ft)), px)


def test_grayscale_2d_input():
    px2d = _pixels(6, 8, 1)[:, :, 0]
    out = decode_png(encode_png(px2d))
    assert np.array_equal(out[:, :, 0], px2d)


def _raw_png(w, h, c, scanlines: bytes) -> bytes:
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(scanlines))
        + _chunk(b"IEND", b"")
    )


def _filter_reference(px: np.ndarray, ftype: int) -> bytes:
    """Reference (spec-literal, per-pixel) filter pass — builds the
    scanline bytes the decoder must invert, independently of the
    encoder's vectorized arithmetic."""
    h, w, c = px.shape
    rows = px.reshape(h, w * c).astype(np.int64)
    out = b""
    for y in range(h):
        line = bytearray([ftype])
        for x in range(w * c):
            cur = int(rows[y, x])
            left = int(rows[y, x - c]) if x >= c else 0
            up = int(rows[y - 1, x]) if y > 0 else 0
            ul = int(rows[y - 1, x - c]) if (x >= c and y > 0) else 0
            if ftype == 0:
                f = cur
            elif ftype == 1:
                f = cur - left
            elif ftype == 2:
                f = cur - up
            elif ftype == 3:
                f = cur - (left + up) // 2
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                if pa <= pb and pa <= pc:
                    pred = left
                elif pb <= pc:
                    pred = up
                else:
                    pred = ul
                f = cur - pred
            line.append(f % 256)
        out += bytes(line)
    return out


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_decoder_inverts_every_filter(ft):
    px = _pixels(7, 5, 3, seed=ft + 11)
    data = _raw_png(5, 7, 3, _filter_reference(px, ft))
    assert np.array_equal(decode_png(data), px)


def test_mixed_filters_per_scanline():
    px = _pixels(5, 6, 4, seed=3)
    h, w, c = px.shape
    rows = px.reshape(h, w * c)
    # build each scanline with a different filter, chained correctly
    # (Up/Paeth reference the RECONSTRUCTED previous row = the original)
    scan = b""
    for y in range(h):
        one = _filter_reference(px[max(0, y - 1):y + 1], (y % 5))
        # take the LAST scanline of the 1-or-2-row reference pass
        stride = w * c + 1
        scan += one[-stride:]
    assert np.array_equal(decode_png(_raw_png(w, h, c, scan)), px)


def test_decode_image_dispatches_png():
    px = _pixels(8, 8, 3)
    assert np.array_equal(decode_image(encode_png(px)), px)


def test_decode_image_still_raises_on_unknown_format():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff\xe0" + b"\x00" * 32)  # JPEG magic


def test_decode_rejects_interlaced():
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)  # interlace=1
    data = (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * (4 * (4 * 3 + 1))))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_png(data)


def test_resize_png_nearest_neighbor():
    from pyrle_spark.functions.multimodal import resize_png

    px = _pixels(10, 14, 3)
    out = decode_png(resize_png(encode_png(px), 6, 6))
    ys = (np.arange(6) * 10) // 6
    xs = (np.arange(6) * 14) // 6
    assert np.array_equal(out, px[ys][:, xs])


def test_wav_roundtrip():
    from pyrle_spark.functions.multimodal import decode_audio, encode_wav

    s = (((31 * 7 + 7 * np.arange(101, dtype=np.int64)) % 4096) - 2048).astype(
        np.int16
    )
    out, rate = decode_audio(encode_wav(s, 22_050))
    assert rate == 22_050
    assert np.array_equal(out, s)


def test_wav_decoder_skips_extra_chunks_and_word_aligns():
    import struct

    from pyrle_spark.functions.multimodal import decode_audio, encode_wav

    s = np.arange(-5, 5, dtype=np.int16)
    base = encode_wav(s, 8000)
    # splice an odd-length LIST chunk between fmt and data: the walker
    # must skip it (with the pad byte) and still find the samples
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    spliced = base[:fmt_end] + extra + base[fmt_end:]
    out, rate = decode_audio(spliced)
    assert rate == 8000 and np.array_equal(out, s)


def test_wav_decoder_rejects_non_wav_and_stereo():
    import struct

    from pyrle_spark.functions.multimodal import decode_audio, encode_wav

    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04" + b"\x00" * 64)  # mp3-ish
    # stereo fmt chunk must raise loudly, not misparse
    mono = encode_wav(np.zeros(4, dtype=np.int16), 8000)
    fmt = struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
    stereo = mono[:16] + fmt[:4] + struct.pack("<HH", 1, 2) + fmt[8:] + mono[36:]
    stereo = (
        mono[:12]
        + b"fmt "
        + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
        + mono[36:]
    )
    with pytest.raises(NotImplementedError, match="mono"):
        decode_audio(stereo)


def test_y4m_roundtrip_and_frame_header_params():
    from pyrle_spark.functions.multimodal import demux_y4m, encode_y4m

    w, h = 6, 4
    fsz = w * h * 3 // 2
    frames = [
        ((31 + 13 * f + 7 * np.arange(fsz, dtype=np.int64)) % 256).astype(
            np.uint8
        )
        for f in range(4)
    ]
    got, gw, gh = demux_y4m(encode_y4m(frames, w, h))
    assert (gw, gh) == (w, h) and len(got) == 4
    for a, b in zip(got, frames):
        assert np.array_equal(a, b)
    # frame markers may carry parameters (FRAME Ixyz\n) — demux must
    # honor the newline, not assume a bare marker
    data = encode_y4m(frames[:1], w, h).replace(b"FRAME\n", b"FRAME Ip\n")
    got2, _, _ = demux_y4m(data)
    assert np.array_equal(got2[0], frames[0])


def test_y4m_rejects_non_y4m_and_bad_colorspace():
    from pyrle_spark.functions.multimodal import demux_y4m, encode_y4m

    with pytest.raises(NotImplementedError):
        demux_y4m(b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 32)  # mp4 magic
    data = encode_y4m(
        [np.zeros(6 * 4 * 3 // 2, dtype=np.uint8)], 6, 4
    ).replace(b"C420", b"C444")
    with pytest.raises(NotImplementedError, match="4:2:0"):
        demux_y4m(data)


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        c=st.sampled_from([1, 2, 3, 4]),
        ft=st.sampled_from([0, 1, 2]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_png_roundtrip_property(h, w, c, ft, seed):
        n = h * w * c
        px = ((seed + 37 * np.arange(n, dtype=np.int64)) % 256).astype(
            np.uint8
        ).reshape(h, w, c)
        assert np.array_equal(decode_png(encode_png(px, filter_type=ft)), px)

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(0, 300),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_wav_roundtrip_property(n, rate, seed):
        from pyrle_spark.functions.multimodal import decode_audio, encode_wav

        s = (
            ((seed + 97 * np.arange(n, dtype=np.int64)) % 65536) - 32768
        ).astype(np.int16)
        out, got_rate = decode_audio(encode_wav(s, rate))
        assert got_rate == rate and np.array_equal(out, s)

    @settings(max_examples=25, deadline=None)
    @given(
        w=st.sampled_from([2, 4, 6, 8]),
        h=st.sampled_from([2, 4, 6]),
        nf=st.integers(0, 5),
        seed=st.integers(0, 2**31 - 1),
    )
    def test_y4m_roundtrip_property(w, h, nf, seed):
        from pyrle_spark.functions.multimodal import demux_y4m, encode_y4m

        fsz = w * h * 3 // 2
        frames = [
            ((seed + 13 * f + 7 * np.arange(fsz, dtype=np.int64)) % 256)
            .astype(np.uint8)
            for f in range(nf)
        ]
        got, gw, gh = demux_y4m(encode_y4m(frames, w, h))
        assert (gw, gh) == (w, h) and len(got) == nf
        for a, b in zip(got, frames):
            assert np.array_equal(a, b)

except ImportError:  # pragma: no cover — hypothesis is baked in here
    pass


def test_decode_rejects_truncated_idat():
    px = _pixels(4, 4, 3)
    h, w, c = px.shape
    short = _raw_png(w, h, c, _filter_reference(px, 0)[: -(w * c + 1)])
    with pytest.raises(ValueError, match="decompressed size"):
        decode_png(short)
