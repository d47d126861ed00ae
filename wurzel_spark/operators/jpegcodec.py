"""Vendored baseline JPEG (JFIF) decoder — pure numpy, no codec library.

JPEG is the dominant format of every real image corpus, and the sandbox
has no PIL/opencv, so the real-decode path (`multimodal._real_pixels` →
decode_images / image_near_dup_pairs; reference ingest anchor:
`wurzel/steps/docling/docling_step.py:92-109`) needs a built-in decoder
beside the PNG/PNM ones. Everything here derives from the public
ITU-T T.81 spec (Annex F baseline process) and the JFIF 1.02 note.

Scope (exactly the baseline process):
  - SOI / APPn / COM / DQT (8-bit) / SOF0+SOF1 / DHT / DRI / SOS / EOI
  - Huffman entropy coding with byte unstuffing and RSTn restarts
  - 8-bit sample precision, 1 (grayscale) or 3 (YCbCr) components
  - any integer sampling factors 1/2/4 (4:4:4, 4:2:2, 4:2:0, …)
  - dequantize → dezigzag → float 2-D IDCT → level shift → clamp
  - chroma upsampling by PIXEL REPLICATION (the spec's box filter;
    libjpeg's default "fancy" triangular filter is a smoothing choice,
    not part of the format — documented convention, deterministic)
  - JFIF YCbCr→RGB (BT.601 constants), floor(x + 0.5) rounding, clamp

Refusal convention (same contract as the PNG/PNM decoders): anything
outside the baseline process — progressive (SOF2) or any other SOFn,
arithmetic coding, 12/16-bit precision or 16-bit DQT, 4-component
(Adobe CMYK) images, truncated or desynced streams, over-budget rasters
— raises NotImplementedError with a reason, never garbage pixels and
never a bare ValueError/KeyError/IndexError.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index i of this array holds the natural (row*8+col)
# position of the i-th coefficient in scan order (T.81 Figure 5)
ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_MAX_JPEG_PIXELS = 1 << 22  # shared budget class with the PNG decoder


def _idct_matrix() -> np.ndarray:
    u = np.arange(8)
    a = np.cos((2 * u[None, :] + 1) * u[:, None] * np.pi / 16) / 2.0
    a[0, :] /= np.sqrt(2.0)
    return a  # spatial = A.T @ coeff @ A


_A = _idct_matrix()


def idct2(block: np.ndarray) -> np.ndarray:
    """Float64 2-D type-III DCT of an 8x8 coefficient block (T.81 A.3.3)."""
    return _A.T @ block @ _A


class _BitReader:
    """MSB-first reader over the entropy-coded segment with FF00
    unstuffing; RSTn markers are surfaced to the caller, any other
    marker mid-scan is a refusal."""

    def __init__(self, data: bytes, start: int):
        self.d = data
        self.p = start
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.p >= len(self.d):
            raise NotImplementedError("truncated JPEG entropy stream")
        b = self.d[self.p]
        self.p += 1
        if b == 0xFF:
            if self.p >= len(self.d):
                raise NotImplementedError("truncated JPEG entropy stream")
            nxt = self.d[self.p]
            if nxt == 0x00:
                self.p += 1  # stuffed byte
            else:
                # a real marker inside bit-fill: the scan data ran out
                raise NotImplementedError("JPEG entropy stream desync")
        # Keep only the still-unread low `nbits` bits before appending:
        # without the mask every consumed byte accretes into one
        # ever-growing bigint and each shift turns O(bytes consumed) —
        # quadratic decode time on any realistically-sized scan.
        self.bits = ((self.bits & ((1 << self.nbits) - 1)) << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, n: int) -> None:
        """Byte-align and consume the RST(n mod 8) marker (T.81 F.2.1.3.1)."""
        self.bits = 0
        self.nbits = 0
        if self.p + 2 > len(self.d):
            raise NotImplementedError("truncated JPEG at restart boundary")
        if self.d[self.p] != 0xFF or self.d[self.p + 1] != 0xD0 + (n % 8):
            raise NotImplementedError("missing JPEG restart marker")
        self.p += 2


def _build_huffman(counts: list[int], values: bytes) -> dict[tuple[int, int], int]:
    """Canonical Huffman per T.81 Annex C: {(length, code) → value}."""
    lut: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            if k >= len(values):
                raise NotImplementedError("malformed JPEG Huffman table")
            lut[(length, code)] = values[k]
            k += 1
            code += 1
        code <<= 1
    return lut


def _decode_symbol(br: _BitReader, lut: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        v = lut.get((length, code))
        if v is not None:
            return v
    raise NotImplementedError("invalid JPEG Huffman code")


def _extend(v: int, n: int) -> int:
    """Sign extension of an n-bit magnitude (T.81 F.2.2.1 EXTEND)."""
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def jpeg_pixels(content: bytes) -> np.ndarray:
    """Decode baseline JFIF bytes → (h, w, 3) uint8 RGB."""
    if content[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG stream")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    while True:
        if pos + 2 > len(content):
            raise NotImplementedError("truncated JPEG before SOS")
        if content[pos] != 0xFF:
            raise NotImplementedError("JPEG marker desync")
        m = content[pos + 1]
        pos += 2
        if m == 0xFF:  # fill byte
            pos -= 1
            continue
        if m == 0x01 or 0xD0 <= m <= 0xD9:
            continue  # TEM / RSTn / SOI / EOI: parameterless
        if pos + 2 > len(content):
            raise NotImplementedError("truncated JPEG segment header")
        (ln,) = struct.unpack(">H", content[pos : pos + 2])
        seg = content[pos + 2 : pos + ln]
        if ln < 2 or len(seg) != ln - 2:
            raise NotImplementedError("truncated JPEG segment")
        pos += ln
        if m == 0xDB:  # DQT
            o = 0
            while o < len(seg):
                pq, tq = seg[o] >> 4, seg[o] & 0x0F
                if pq != 0:
                    raise NotImplementedError(
                        "16-bit JPEG quantization table (non-baseline)"
                    )
                if o + 65 > len(seg):
                    raise NotImplementedError("truncated JPEG DQT")
                qt[tq] = np.frombuffer(
                    seg[o + 1 : o + 65], dtype=np.uint8
                ).astype(np.int64)
                o += 65
        elif m in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. sequential
            # Refusal convention: malformed headers must hit
            # NotImplementedError, never bare struct.error/ValueError.
            if len(seg) < 6:
                raise NotImplementedError("truncated JPEG SOF header")
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            if nc not in (1, 3):
                raise NotImplementedError(
                    f"{nc}-component JPEG (CMYK/unknown) unsupported"
                )
            if h == 0 or w == 0:
                raise NotImplementedError("empty JPEG frame")
            if w * h > _MAX_JPEG_PIXELS:
                raise NotImplementedError(
                    f"builtin JPEG decoder caps at {_MAX_JPEG_PIXELS} pixels"
                )
            if len(seg) < 6 + 3 * nc:
                raise NotImplementedError("truncated JPEG SOF component list")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                hi, vi = hv >> 4, hv & 0x0F
                if hi not in (1, 2, 4) or vi not in (1, 2, 4):
                    raise NotImplementedError(
                        f"JPEG sampling factors {hi}x{vi} unsupported"
                    )
                comps.append({"id": cid, "h": hi, "v": vi, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif 0xC2 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            kind = "progressive" if m == 0xC2 else f"SOF{m - 0xC0}"
            raise NotImplementedError(
                f"{kind} JPEG unsupported — baseline (SOF0/SOF1) only"
            )
        elif m == 0xC8 or m == 0xCC:
            raise NotImplementedError("arithmetic-coded JPEG unsupported")
        elif m == 0xC4:  # DHT
            o = 0
            while o < len(seg):
                if o + 17 > len(seg):
                    raise NotImplementedError("truncated JPEG DHT")
                tc, th = seg[o] >> 4, seg[o] & 0x0F
                counts = list(seg[o + 1 : o + 17])
                n = sum(counts)
                if o + 17 + n > len(seg):
                    raise NotImplementedError("truncated JPEG DHT")
                huff[(tc, th)] = _build_huffman(counts, seg[o + 17 : o + 17 + n])
                o += 17 + n
        elif m == 0xDD:  # DRI
            if len(seg) < 2:
                raise NotImplementedError("truncated JPEG DRI")
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS — entropy data follows the header
            if frame is None:
                raise NotImplementedError("JPEG SOS before SOF")
            if len(seg) < 1:
                raise NotImplementedError("truncated JPEG SOS header")
            ns = seg[0]
            if ns != len(frame["comps"]):
                raise NotImplementedError(
                    "JPEG multi-scan/partial-scan unsupported (non-baseline)"
                )
            if len(seg) < 1 + 2 * ns:
                raise NotImplementedError("truncated JPEG SOS component list")
            scan = []
            for s in range(ns):
                cs, tdta = seg[1 + 2 * s : 3 + 2 * s]
                comp = next(
                    (c for c in frame["comps"] if c["id"] == cs), None
                )
                if comp is None:
                    raise NotImplementedError("JPEG scan names unknown component")
                scan.append((comp, tdta >> 4, tdta & 0x0F))
            return _decode_scan(content, pos, frame, scan, qt, huff, restart_interval)
        # APPn / COM: skipped


def _decode_scan(content, pos, frame, scan, qt, huff, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = {}
    for c in frame["comps"]:
        planes[c["id"]] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64
        )
        if c["tq"] not in qt:
            raise NotImplementedError("JPEG component references missing DQT")
    for c, td, ta in scan:
        if (0, td) not in huff or (1, ta) not in huff:
            raise NotImplementedError("JPEG scan references missing DHT")

    br = _BitReader(content, pos)
    pred = {c["id"]: 0 for c, _, _ in scan}
    rst_n = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.align_and_expect_rst(rst_n)
                rst_n += 1
                pred = {c["id"]: 0 for c, _, _ in scan}
            for c, td, ta in scan:
                dc_lut, ac_lut = huff[(0, td)], huff[(1, ta)]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = _decode_symbol(br, dc_lut)
                        if t > 11:
                            raise NotImplementedError("invalid JPEG DC category")
                        diff = _extend(br.receive(t), t)
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(br, ac_lut)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise NotImplementedError(
                                    "JPEG AC run past block end"
                                )
                            zz[k] = _extend(br.receive(s), s)
                            k += 1
                        blk = np.zeros(64, dtype=np.int64)
                        blk[ZIGZAG] = zz * q
                        px = idct2(blk.reshape(8, 8).astype(np.float64))
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1

    # level shift, upsample by replication, crop, color convert
    out = []
    for c in frame["comps"]:
        p = planes[c["id"]] + 128.0
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1:
            p = np.repeat(p, ry, axis=0)
        if rx > 1:
            p = np.repeat(p, rx, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        g = np.clip(np.floor(out[0] + 0.5), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(g[:, :, None], 3, axis=2))
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
