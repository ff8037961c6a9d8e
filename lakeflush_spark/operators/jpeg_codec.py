"""Pure-Python/numpy baseline JPEG codec — no codec library.

Closes the last image-format gap in the multimodal surface (NetPBM r5,
PNG r6): baseline sequential JFIF (SOF0) decode implemented from the
public ITU-T T.81 spec — marker segments, Huffman entropy decode,
dequantize + un-zigzag, 8x8 IDCT, chroma upsampling, YCbCr→RGB.
Progressive (SOF2), arithmetic coding, and 12-bit precision raise
with the variant named; they are rare in ML corpora and genuinely
different codecs.

ENCODE (r7): baseline 4:4:4 JFIF with the Annex K quantization +
Huffman tables and IJG quality scaling — deterministic, decodable by
any baseline decoder, cross-validated against javax.imageio in both
directions. The resize path still defaults to lossless PNG output;
``jpeg_quality`` opts into JPEG re-encode when storage is the bound.

Spec compliance is cross-validated in tests against the JVM's
``javax.imageio`` (bundled with Java 17, reachable over py4j): images
IT encodes, WE decode, and the pixel planes must agree within the
small inter-decoder IDCT tolerance T.81 permits.

Performance stance: the Huffman loop is interpreted Python — right
for thumbnails and correctness paths, not for bulk decode; real
deployments install PIL/libjpeg and take the C path automatically
(``multimodal._image_codec``). This module is the library-free
fallback, same stance as the Avro and PNG codecs.
"""

from __future__ import annotations

import numpy as np

_ZIGZAG = np.array([
    0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

# 8x8 DCT-II basis (orthonormal); IDCT(X) = C.T @ X @ C
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = (np.sqrt(0.125) if _u == 0 else 0.5) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16
        )


def _build_huff(bits, vals):
    """(length, code) -> symbol map per T.81 C.2."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over an UNSTUFFED entropy segment."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def decode(self, table) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_jpeg(payload: bytes):
    """Baseline JFIF bytes → uint8 array: (h, w, 3) RGB for color,
    (h, w) for grayscale. Raises ``ValueError`` for non-JPEG bytes
    and unsupported variants (progressive, arithmetic, 12-bit)."""
    buf = bytes(payload)
    if buf[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(buf):
        if buf[pos] != 0xFF:
            raise ValueError("bad JPEG marker alignment")
        marker = buf[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0xC2, 0xC6, 0xCA, 0xCE):
            raise ValueError("progressive JPEG not supported (baseline only)")
        if marker in (0xC9, 0xCB, 0xCD):
            raise ValueError("arithmetic-coded JPEG not supported")
        seglen = (buf[pos] << 8) | buf[pos + 1]
        seg = buf[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(
                        np.int32
                    )
                    i += 64
                else:
                    tbl = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(
                        np.int32
                    )
                    i += 128
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huff(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"{precision}-bit JPEG not supported")
            h = (seg[1] << 8) | seg[2]
            w = (seg[3] << 8) | seg[4]
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + c * 3], seg[7 + c * 3], seg[8 + c * 3]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xDD:  # DRI
            restart_interval = (seg[0] << 8) | seg[1]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            sel = {}
            for c in range(ns):
                cs, tt = seg[1 + c * 2], seg[2 + c * 2]
                sel[cs] = (tt >> 4, tt & 0x0F)
            # entropy data runs to the next non-RST marker
            start = pos
            i = pos
            while i + 1 < len(buf):
                if buf[i] == 0xFF and buf[i + 1] not in (0x00,) and not (
                    0xD0 <= buf[i + 1] <= 0xD7
                ):
                    break
                i += 1
            scan = (sel, buf[start:i])
            pos = i
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    sel, entropy = scan
    comps = frame["comps"]
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # split entropy data at restart markers, unstuff each segment
    segments = []
    cur = bytearray()
    i = 0
    while i < len(entropy):
        b = entropy[i]
        if b == 0xFF:
            nxt = entropy[i + 1] if i + 1 < len(entropy) else None
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if nxt is not None and 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), dtype=np.float64)
        for c in comps
    ]
    pred = [0] * len(comps)
    seg_idx = 0
    reader = _BitReader(segments[0])
    mcu_in_seg = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_in_seg == restart_interval:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("truncated JPEG (missing restart segment)")
                reader = _BitReader(segments[seg_idx])
                pred = [0] * len(comps)
                mcu_in_seg = 0
            for ci, comp in enumerate(comps):
                dc_tab, ac_tab = sel[comp["id"]]
                dct, act = huff_dc[dc_tab], huff_ac[ac_tab]
                q = qt[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        s = reader.decode(dct)
                        diff = _extend(reader.receive(s), s) if s else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        coeffs = np.zeros(64, dtype=np.float64)
                        coeffs[_ZIGZAG] = zz * q
                        block = _C.T @ coeffs.reshape(8, 8) @ _C + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_in_seg += 1

    # upsample each component to the full grid and crop. Factor-2 dims
    # use the triangular "fancy" filter (libjpeg convention, which the
    # JVM/libjpeg decoders apply — T.81 leaves the filter open, and
    # matching it keeps the cross-decoder diff at IDCT-rounding level);
    # other factors fall back to sample replication. The filter is
    # separable: out[2i]=(3p[i]+p[i-1])/4, out[2i+1]=(3p[i]+p[i+1])/4
    # with edge replication.
    def _tri2(p, axis):
        a = np.swapaxes(p, 0, axis)
        pad = np.concatenate([a[:1], a, a[-1:]], axis=0)
        left, c, right = pad[:-2], pad[1:-1], pad[2:]
        out = np.empty((a.shape[0] * 2,) + a.shape[1:])
        out[0::2] = (3.0 * c + left) / 4.0
        out[1::2] = (3.0 * c + right) / 4.0
        return np.swapaxes(out, 0, axis)

    full = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        # crop to the component's REAL extent before filtering so MCU
        # padding never bleeds into edge interpolation
        ch = -(-h * comp["v"] // vmax)
        cw = -(-w * comp["h"] // hmax)
        p = p[:ch, :cw]
        for axis, (f_have, f_max) in ((0, (comp["v"], vmax)), (1, (comp["h"], hmax))):
            f = f_max // f_have
            if f == 2:
                p = _tri2(p, axis)
            elif f > 1:
                p = np.repeat(p, f, axis)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
    if len(full) != 3:
        raise ValueError(f"{len(full)}-component JPEG not supported")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Baseline JFIF ENCODER (r7) — the write half of the library-free
# codec: ITU-T T.81 Annex K quantization + Huffman tables, 4:4:4
# sampling (no chroma subsample — simplest spec-compliant layout, and
# the variant every decoder reconstructs without filter ambiguity),
# quality scaled by the public IJG formula. DCT runs vectorized over
# all blocks; only the entropy loop is interpreted Python — the same
# correctness-path stance as the decoder. Cross-validated in tests
# both ways: bytes WE encode, the JVM's javax.imageio must decode to
# the source image (within DCT quantization error), and our own
# decoder must round-trip them.
# ---------------------------------------------------------------------------

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# T.81 Annex K "typical" Huffman tables: (bits[16], ordered symbols)
_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _enc_table(bits, vals):
    """symbol -> (code, length), inverted from the decode builder so
    encode/decode provably share one T.81 C.2 code assignment."""
    return {sym: (code, length) for (length, code), sym in _build_huff(bits, vals).items()}


class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing (T.81 B.1.1.5)."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> per-entry divisors in [1, 255]."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _blocks(plane: np.ndarray) -> np.ndarray:
    """Edge-replicate to 8-multiples, return (n_blocks, 8, 8) in
    raster MCU order (4:4:4 -> one block per MCU per component)."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    p = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    return (
        p.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _encode_plane_coeffs(plane: np.ndarray, q_zz: np.ndarray) -> np.ndarray:
    """(n_blocks, 64) zigzag-ordered quantized coefficients: level
    shift, vectorized 8x8 DCT over every block, divide by the zigzag
    quant table, round half away from zero (the convention hardware
    and libjpeg share; numpy's rint rounds half to even)."""
    b = _blocks(plane).astype(np.float64) - 128.0
    dct = np.einsum("ux,nxy,vy->nuv", _C, b, _C)
    zz = dct.reshape(-1, 64)[:, _ZIGZAG] / q_zz
    return np.where(zz >= 0, np.floor(zz + 0.5), np.ceil(zz - 0.5)).astype(np.int32)


def _mag(v: int) -> tuple[int, int]:
    """(size, value-bits) of a coefficient per T.81 F.1.2.1."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def encode_jpeg(img: np.ndarray, quality: int = 85) -> bytes:
    """uint8 image -> baseline JFIF bytes. ``(h, w)`` encodes a
    1-component grayscale stream; ``(h, w, 3)`` RGB encodes YCbCr
    4:4:4. Deterministic (fixed Annex K tables, no optimization
    passes); decodable by any baseline decoder including
    :func:`decode_jpeg`."""
    a = np.asarray(img)
    if a.dtype != np.uint8:
        raise ValueError(f"encode_jpeg needs uint8 pixels, got {a.dtype}")
    if a.ndim == 2:
        planes = [a.astype(np.float64)]
    elif a.ndim == 3 and a.shape[2] == 3:
        r = a[..., 0].astype(np.float64)
        g = a[..., 1].astype(np.float64)
        b = a[..., 2].astype(np.float64)
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        raise ValueError(f"unsupported image shape {a.shape}")
    h, w = a.shape[:2]
    if h == 0 or w == 0 or h > 0xFFFF or w > 0xFFFF:
        raise ValueError(f"image dimensions {w}x{h} out of JPEG range")
    color = len(planes) == 3

    q_luma_zz = _scaled_q(_Q_LUMA, quality)[_ZIGZAG]
    q_tabs = [q_luma_zz]
    if color:
        q_tabs.append(_scaled_q(_Q_CHROMA, quality)[_ZIGZAG])

    dc_enc = [_enc_table(*_HUFF_DC_LUMA)]
    ac_enc = [_enc_table(*_HUFF_AC_LUMA)]
    if color:
        dc_enc.append(_enc_table(*_HUFF_DC_CHROMA))
        ac_enc.append(_enc_table(*_HUFF_AC_CHROMA))

    coeffs = [
        _encode_plane_coeffs(p, q_tabs[min(ci, len(q_tabs) - 1)])
        for ci, p in enumerate(planes)
    ]

    wtr = _BitWriter()
    pred = [0] * len(planes)
    n_blocks = coeffs[0].shape[0]
    for bi in range(n_blocks):
        for ci in range(len(planes)):
            t = min(ci, 1)
            zz = coeffs[ci][bi]
            diff = int(zz[0]) - pred[ci]
            pred[ci] = int(zz[0])
            s, bitsv = _mag(diff)
            code, length = dc_enc[t][s]
            wtr.write(code, length)
            if s:
                wtr.write(bitsv, s)
            run = 0
            nz = np.nonzero(zz[1:])[0]
            last = nz[-1] + 1 if len(nz) else 0
            for k in range(1, last + 1):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_enc[t][0xF0]  # ZRL
                    wtr.write(code, length)
                    run -= 16
                s, bitsv = _mag(v)
                code, length = ac_enc[t][(run << 4) | s]
                wtr.write(code, length)
                wtr.write(bitsv, s)
                run = 0
            if last < 63:
                code, length = ac_enc[t][0x00]  # EOB
                wtr.write(code, length)
    entropy = wtr.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = bytes([0x00]) + bytes(int(x) for x in q_tabs[0])
    if color:
        dqt += bytes([0x01]) + bytes(int(x) for x in q_tabs[1])
    out += seg(0xDB, dqt)
    ncomp = 3 if color else 1
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, min(ci, 1)])
    out += seg(0xC0, sof)
    dht = b""
    tables = [(0x00, _HUFF_DC_LUMA), (0x10, _HUFF_AC_LUMA)]
    if color:
        tables += [(0x01, _HUFF_DC_CHROMA), (0x11, _HUFF_AC_CHROMA)]
    for tcth, (bits, vals) in tables:
        dht += bytes([tcth]) + bytes(bits) + bytes(vals)
    out += seg(0xC4, dht)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = min(ci, 1)
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)
