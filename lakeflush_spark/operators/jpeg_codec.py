"""Pure-Python/numpy baseline JPEG decoder — no codec library.

Closes the last image-format gap in the multimodal surface (NetPBM r5,
PNG r6): baseline sequential JFIF (SOF0) decode implemented from the
public ITU-T T.81 spec — marker segments, Huffman entropy decode,
dequantize + un-zigzag, 8x8 IDCT, chroma upsampling, YCbCr→RGB.
Progressive (SOF2), arithmetic coding, and 12-bit precision raise
with the variant named; they are rare in ML corpora and genuinely
different codecs.

ENCODE is intentionally absent: the pipeline need is decode (feature
extraction, resize input), and the resize path re-encodes losslessly
as PNG — the same output the PIL path produces.

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
