"""Baseline JPEG decoder tests (operators/jpegcodec.py).

Fixture strategy: the sandbox has no PIL, so fixtures are produced by a
minimal TEST-SIDE baseline encoder (grayscale + 4:4:4 / 4:2:0 YCbCr,
T.81 Annex K standard Huffman tables). The encoder is an independent
implementation of the FORWARD path (FDCT → quantize → Huffman), so a
decode that inverts it exercises every decoder stage; with an all-ones
quantization table the transform pair is near-lossless and pixel error
is provably bounded by DCT rounding (±2), which gives hard assertions
without a reference codec. DC-only images additionally give EXACT
hand-computed pixel values (IDCT of a DC-only block is constant
DC·Q/8 + 128).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from wurzel_spark.operators.jpegcodec import ZIGZAG, jpeg_pixels

# ---------------------------------------------------------------- encoder
# T.81 Annex K.3 standard Huffman tables

_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUM_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _codes(counts, values):
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[values[k]] = (code, length)
            k += 1
            code += 1
        code <<= 1
    return out


_DC_CODES = _codes(*_DC_LUM)
_AC_CODES = _codes(_AC_LUM_COUNTS, _AC_LUM_VALS)


def _fdct_matrix():
    u = np.arange(8)
    a = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16) / 2.0
    a[0, :] /= np.sqrt(2.0)
    return a


_A = _fdct_matrix()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)  # pad with 1-bits per spec
        return bytes(self.out)


def _mag(v):
    """(size, magnitude-bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    n = a.bit_length()
    bits = v if v > 0 else v + (1 << n) - 1
    return n, bits


def _encode_block(bw, block, pred, q):
    coef = _A @ (block.astype(np.float64) - 128.0) @ _A.T
    zz = np.round(coef.reshape(64)[ZIGZAG] / q).astype(np.int64)
    diff = int(zz[0]) - pred
    n, bits = _mag(diff)
    c, ln = _DC_CODES[n]
    bw.put(c, ln)
    if n:
        bw.put(bits, n)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = _AC_CODES[0xF0]  # ZRL
            bw.put(c, ln)
            run -= 16
        n, bits = _mag(v)
        c, ln = _AC_CODES[(run << 4) | n]
        bw.put(c, ln)
        bw.put(bits, n)
        run = 0
    if run:
        c, ln = _AC_CODES[0x00]  # EOB
        bw.put(c, ln)
    return int(zz[0])


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _tables_segments(q):
    dqt = _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
    dht = _seg(
        0xC4,
        bytes([0x00]) + bytes(_DC_LUM[0]) + bytes(_DC_LUM[1])
        + bytes([0x10]) + bytes(_AC_LUM_COUNTS) + bytes(_AC_LUM_VALS),
    )
    return dqt + dht


def encode_gray(img, q=None, restart_interval=0):
    """Baseline grayscale JFIF bytes for an (h, w) uint8 array."""
    h, w = img.shape
    q = np.ones(64, dtype=np.int64) if q is None else np.asarray(q, np.int64)
    out = bytearray(b"\xff\xd8")
    out += _tables_segments(q)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    out += _seg(0xC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0]))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    by, bx = -(-h // 8), -(-w // 8)
    padded = np.pad(img, ((0, by * 8 - h), (0, bx * 8 - w)), mode="edge")
    bw = _BitWriter()
    pred = 0
    n_mcu = 0
    for my in range(by):
        for mx in range(bx):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                out_bits = bw.flush()
                out += out_bits
                out += bytes([0xFF, 0xD0 + ((n_mcu // restart_interval - 1) % 8)])
                bw = _BitWriter()
                pred = 0
            pred = _encode_block(
                bw, padded[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], pred, q
            )
            n_mcu += 1
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _rgb_to_ycbcr(rgb):
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return [np.clip(np.round(p), 0, 255) for p in (y, cb, cr)]


def encode_color(rgb, subsample=False, q=None):
    """Baseline color JFIF bytes; 4:4:4 or (subsample=True) 4:2:0.
    For 4:2:2 fixtures see encode_color_422 below."""
    h, w, _ = rgb.shape
    q = np.ones(64, dtype=np.int64) if q is None else np.asarray(q, np.int64)
    y, cb, cr = _rgb_to_ycbcr(rgb)
    out = bytearray(b"\xff\xd8")
    out += _tables_segments(q)
    hv = 0x22 if subsample else 0x11
    out += _seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, hv, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0]),
    )
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    fac = 2 if subsample else 1
    mcux, mcuy = -(-w // (8 * fac)), -(-h // (8 * fac))

    def comp_plane(p, sub):
        if sub:
            hh, ww = p.shape
            p = p[: hh - hh % 2 or hh, : ww - ww % 2 or ww]
            p = np.pad(
                p,
                ((0, hh % 2), (0, ww % 2)),
                mode="edge",
            ) if (hh % 2 or ww % 2) else p
            p = (
                p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2)
                .mean(axis=(1, 3))
                .round()
            )
        return p

    ys = comp_plane(y, False)
    cbs = comp_plane(cb, subsample)
    crs = comp_plane(cr, subsample)

    def pad_to(p, rows, cols):
        return np.pad(
            p, ((0, rows - p.shape[0]), (0, cols - p.shape[1])), mode="edge"
        )

    ys = pad_to(ys, mcuy * 8 * fac, mcux * 8 * fac)
    cbs = pad_to(cbs, mcuy * 8, mcux * 8)
    crs = pad_to(crs, mcuy * 8, mcux * 8)
    bw = _BitWriter()
    preds = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for by in range(fac):
                for bx in range(fac):
                    preds[0] = _encode_block(
                        bw,
                        ys[
                            (my * fac + by) * 8 : (my * fac + by) * 8 + 8,
                            (mx * fac + bx) * 8 : (mx * fac + bx) * 8 + 8,
                        ],
                        preds[0],
                        q,
                    )
            for i, p in ((1, cbs), (2, crs)):
                preds[i] = _encode_block(
                    bw,
                    p[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8],
                    preds[i],
                    q,
                )
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_color_422(rgb, q=None):
    """Baseline 4:2:2 color JFIF bytes (luma 2x1 per MCU, chroma halved
    horizontally only) for an (h, w, 3) array with h%8 == 0, w%16 == 0."""
    h, w, _ = rgb.shape
    assert h % 8 == 0 and w % 16 == 0
    q = np.ones(64, dtype=np.int64) if q is None else np.asarray(q, np.int64)
    y, cb, cr = _rgb_to_ycbcr(rgb)
    out = bytearray(b"\xff\xd8")
    out += _tables_segments(q)
    out += _seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, 0x21, 0]) + bytes([2, 0x11, 0]) + bytes([3, 0x11, 0]),
    )
    out += _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
    mcux, mcuy = w // 16, h // 8
    cbs = cb.reshape(h, w // 2, 2).mean(axis=2).round()
    crs = cr.reshape(h, w // 2, 2).mean(axis=2).round()
    bw = _BitWriter()
    preds = [0, 0, 0]
    for my in range(mcuy):
        for mx in range(mcux):
            for bx in range(2):
                preds[0] = _encode_block(
                    bw,
                    y[my * 8 : my * 8 + 8,
                      (mx * 2 + bx) * 8 : (mx * 2 + bx) * 8 + 8],
                    preds[0],
                    q,
                )
            for i, p in ((1, cbs), (2, crs)):
                preds[i] = _encode_block(
                    bw, p[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8], preds[i], q
                )
    out += bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------- tests


def test_dc_only_grayscale_exact():
    """Constant gray: only DC survives, IDCT of a DC-only block is the
    constant DC·Q[0]/8 + 128 — hand-computable to the exact pixel."""
    for val in (0, 64, 128, 200, 255):
        img = np.full((8, 8), val, dtype=np.uint8)
        px = jpeg_pixels(encode_gray(img))
        assert px.shape == (8, 8, 3)
        assert int(px[0, 0, 0]) == val, (val, px[0, 0, 0])
        assert (px == px[0, 0, 0]).all()


def test_dc_quantized_exact():
    """Q[0]=16: DC quantizes to round((v−128)·8/16), decodes to exactly
    128 + 2·DC — the classic dequantize arithmetic, hand-checked."""
    q = np.ones(64, dtype=np.int64)
    q[0] = 16
    img = np.full((8, 8), 141, dtype=np.uint8)  # (141-128)*8/16 = 6.5 → 6 or 7
    px = jpeg_pixels(encode_gray(img, q=q))
    dc = round((141 - 128) * 8 / 16)
    assert int(px[0, 0, 0]) == 128 + 2 * dc


def test_gradient_roundtrip_near_lossless():
    """All-ones quantization ⇒ transform-pair error bounded by DCT
    rounding: every pixel within ±2 of the source gradient."""
    yy, xx = np.mgrid[0:24, 0:32]
    img = ((yy * 7 + xx * 3) % 256).astype(np.uint8)
    px = jpeg_pixels(encode_gray(img))
    assert px.shape == (24, 32, 3)
    err = np.abs(px[:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 2, err.max()
    assert (px[:, :, 0] == px[:, :, 1]).all()  # gray replicates


def test_non_multiple_of_8_dims_crop():
    """13x11 image: encoder pads to MCU grid, decoder must crop back."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (13, 11), dtype=np.uint8).astype(np.uint8)
    px = jpeg_pixels(encode_gray(img))
    assert px.shape == (13, 11, 3)
    err = np.abs(px[:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 2


def test_color_444_roundtrip():
    """4:4:4 color: YCbCr→RGB→YCbCr error bounded by the two rounding
    layers (color transform + DCT): within ±4 per channel."""
    rng = np.random.default_rng(11)
    rgb = rng.integers(30, 226, (16, 16, 3), dtype=np.uint8).astype(np.uint8)
    px = jpeg_pixels(encode_color(rgb))
    assert px.shape == (16, 16, 3)
    err = np.abs(px.astype(int) - rgb.astype(int))
    assert err.max() <= 4, err.max()


def test_color_420_constant_exact_channel_means():
    """4:2:0 with a CONSTANT color: subsampling is lossless on a
    constant plane, so decode must give the exact color everywhere."""
    rgb = np.zeros((16, 16, 3), dtype=np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 200, 120, 40
    px = jpeg_pixels(encode_color(rgb, subsample=True))
    assert px.shape == (16, 16, 3)
    # the color transform rounds twice (encode + decode): ±2 per channel
    for ch in range(3):
        vals = np.unique(px[..., ch])
        assert len(vals) == 1, (ch, vals)
        assert abs(int(vals[0]) - int(rgb[0, 0, ch])) <= 2


def test_color_420_smooth_bounded():
    """4:2:0 on a smooth ramp: chroma is smooth so box-subsampling error
    stays small; luma stays within the transform bound."""
    yy, xx = np.mgrid[0:16, 0:24]
    rgb = np.stack(
        [
            (80 + yy * 2).astype(np.uint8),
            (60 + xx * 2).astype(np.uint8),
            np.full_like(yy, 90, dtype=np.uint8),
        ],
        axis=2,
    )
    px = jpeg_pixels(encode_color(rgb, subsample=True))
    assert px.shape == (16, 24, 3)
    err = np.abs(px.astype(int) - rgb.astype(int))
    assert err.max() <= 8, err.max()


def test_restart_markers():
    """DRI + RSTn: predictors reset at each interval; stream with
    restarts decodes identically to the same image without them."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (8, 40), dtype=np.uint8).astype(np.uint8)
    a = jpeg_pixels(encode_gray(img))
    b = jpeg_pixels(encode_gray(img, restart_interval=2))
    assert (a == b).all()


def test_byte_stuffing_ff_values():
    """An image engineered to emit 0xFF bytes in the entropy stream
    exercises the FF00 unstuffing path (flush pads with 1-bits, and
    high-contrast blocks produce long all-ones codes)."""
    img = np.zeros((8, 8), dtype=np.uint8)
    img[::2, ::2] = 255
    px = jpeg_pixels(encode_gray(img))
    err = np.abs(px[:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 2


@pytest.mark.parametrize(
    "mutate, reason",
    [
        (lambda b: b[:20], "truncated"),
        (lambda b: b.replace(b"\xff\xc0", b"\xff\xc2", 1), "progressive"),
        (lambda b: b"\x89PNG" + b[4:], "not a JPEG"),
    ],
)
def test_refusals_are_documented(mutate, reason):
    img = np.full((8, 8), 99, dtype=np.uint8)
    payload = mutate(encode_gray(img))
    with pytest.raises(NotImplementedError):
        jpeg_pixels(payload)


def test_refuses_cmyk_and_12bit():
    img = np.full((8, 8), 50, dtype=np.uint8)
    b = encode_gray(img)
    sof_at = b.find(b"\xff\xc0")
    twelve = b[: sof_at + 4] + b"\x0c" + b[sof_at + 5 :]
    with pytest.raises(NotImplementedError):
        jpeg_pixels(twelve)


def test_over_budget_refused():
    """A tiny payload CLAIMING giant dimensions must refuse before any
    allocation, same budget convention as the PNG decoder."""
    img = np.full((8, 8), 10, dtype=np.uint8)
    b = bytearray(encode_gray(img))
    sof_at = b.find(b"\xff\xc0")
    struct.pack_into(">HH", b, sof_at + 5, 30000, 30000)
    with pytest.raises(NotImplementedError, match="caps at"):
        jpeg_pixels(bytes(b))


def test_real_pixels_dispatches_jpeg():
    """multimodal._real_pixels routes FFD8 bytes through the builtin
    decoder and the magic-byte gate agrees on the format name."""
    from wurzel_spark.operators.multimodal import _real_pixels

    img = np.full((10, 12), 77, dtype=np.uint8)
    px = _real_pixels(encode_gray(img))
    assert px.shape == (10, 12, 3)
    assert int(px[3, 3, 1]) == 77


def test_decode_images_real_on_jpeg(spark):
    """End-to-end decode_images(decoder='real') over planted JPEG
    assets: hand-computed channel means for constant-color images."""
    from wurzel_spark.operators.multimodal import decode_images

    rgb = np.zeros((16, 16, 3), dtype=np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 180, 90, 30
    jb = encode_color(rgb)
    gray = encode_gray(np.full((8, 8), 200, dtype=np.uint8))
    df = spark.createDataFrame(
        [
            (1, "image", bytearray(jb), {"width": "16", "height": "16"}),
            (2, "image", bytearray(gray), {"width": "8", "height": "8"}),
        ],
        "asset_id long, kind string, content binary, meta map<string,string>",
    )
    out = {r["asset_id"]: r for r in decode_images(df, decoder="real").collect()}
    assert out[1]["width"] == 16 and out[1]["height"] == 16
    assert abs(out[1]["mean_r"] - 180) <= 2
    assert abs(out[1]["mean_g"] - 90) <= 2
    assert abs(out[1]["mean_b"] - 30) <= 2
    assert out[2]["width"] == 8
    assert abs(out[2]["mean_g"] - 200) <= 1

def test_color_422_constant_exact():
    """4:2:2 with a constant color decodes to the exact color (chroma
    halving is lossless on a constant plane); ±2 for color rounding."""
    rgb = np.zeros((16, 32, 3), dtype=np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 60, 160, 220
    px = jpeg_pixels(encode_color_422(rgb))
    assert px.shape == (16, 32, 3)
    for ch in range(3):
        vals = np.unique(px[..., ch])
        assert len(vals) == 1, (ch, vals)
        assert abs(int(vals[0]) - int(rgb[0, 0, ch])) <= 2


def test_color_422_smooth_bounded():
    yy, xx = np.mgrid[0:16, 0:32]
    rgb = np.stack(
        [
            (70 + yy * 3).astype(np.uint8),
            (50 + xx).astype(np.uint8),
            np.full_like(yy, 110, dtype=np.uint8),
        ],
        axis=2,
    )
    px = jpeg_pixels(encode_color_422(rgb))
    assert px.shape == (16, 32, 3)
    err = np.abs(px.astype(int) - rgb.astype(int))
    assert err.max() <= 8, err.max()


# ------------------------------------------------------------- property

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:

    @settings(max_examples=25, deadline=None)
    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        seed=st.integers(0, 2**31 - 1),
        ri=st.sampled_from([0, 1, 3]),
    )
    def test_property_gray_roundtrip_bounded(h, w, seed, ri):
        """ANY grayscale image of ANY dimensions (MCU padding, crop,
        restart intervals included) roundtrips through encode→decode
        within the ±2 DCT-rounding bound under all-ones quantization —
        and gray always replicates across channels."""
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w), dtype=np.uint8).astype(np.uint8)
        px = jpeg_pixels(encode_gray(img, restart_interval=ri))
        assert px.shape == (h, w, 3)
        err = np.abs(px[:, :, 0].astype(int) - img.astype(int))
        assert err.max() <= 2, (h, w, seed, ri, err.max())
        assert (px[:, :, 0] == px[:, :, 1]).all()
        assert (px[:, :, 1] == px[:, :, 2]).all()


# ----------------------- round-11 ADVICE fixes: speed + refusal gaps


def test_decode_speed_linear_in_entropy_bytes():
    """ADVICE r10 (medium): the bit reader must not accrete consumed
    bytes into one ever-growing bigint — that made decode time quadratic
    in entropy-stream size (minutes for a realistic image). A 256x256
    noise image (~50 KB of entropy data, no restart markers) must decode
    in seconds, and still decode correctly."""
    import time

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (256, 256), dtype=np.uint8).astype(np.uint8)
    payload = encode_gray(img)
    assert len(payload) > 30_000  # noise ⇒ a realistic entropy stream
    t0 = time.monotonic()
    px = jpeg_pixels(payload)
    elapsed = time.monotonic() - t0
    assert elapsed < 60, f"quadratic bit-reader regression: {elapsed:.1f}s"
    err = np.abs(px[:, :, 0].astype(int) - img.astype(int))
    assert err.max() <= 2


def _shrink_segment(payload: bytes, marker: bytes, new_len: int) -> bytes:
    at = payload.find(marker)
    assert at >= 0, marker
    b = bytearray(payload)
    struct.pack_into(">H", b, at + 2, new_len)
    return bytes(b)


@pytest.mark.parametrize(
    "marker, new_len, ri, reason",
    [
        (b"\xff\xc0", 4, 0, "SOF shorter than its fixed header"),
        (b"\xff\xc0", 8, 0, "SOF component list truncated"),
        (b"\xff\xc4", 5, 0, "DHT shorter than counts table"),
        (b"\xff\xdd", 2, 2, "DRI without the interval"),
        (b"\xff\xda", 3, 0, "SOS component list truncated"),
    ],
)
def test_truncated_segments_hit_refusal_convention(marker, new_len, ri, reason):
    """ADVICE r10 (low): malformed/truncated segment headers must raise
    the documented NotImplementedError refusal, never leak a bare
    struct.error / ValueError / IndexError."""
    img = np.full((8, 8), 77, dtype=np.uint8)
    payload = _shrink_segment(encode_gray(img, restart_interval=ri), marker, new_len)
    with pytest.raises(NotImplementedError):
        jpeg_pixels(payload)
