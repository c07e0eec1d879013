"""Baseline JPEG codec in pure numpy + stdlib (no imaging library).

North-star extension (BASELINE.json): a real multimodal pipeline's image
tables are JPEG, so the decode stage of ext/multimodal gets a genuine
baseline-sequential JFIF codec rather than an honest stub. Supported:
8-bit baseline DCT (SOF0), 1 or 3 components, sampling factors 1 or 2
per axis (4:4:4 / 4:2:2 / 4:2:0), restart markers. NOT supported (raise
``NotImplementedError``): progressive (SOF2), arithmetic coding, 12-bit,
4-component CMYK — inject a codec-library decoder via the multimodal
``decoder=`` hook for those.

Throughput bound: the DCT/quantization stages are vectorized over all
blocks (einsum), but entropy coding walks symbols in Python — ~0.5-2 s
per megapixel. Fine for thumbnails and fixtures; at heavy JPEG volume
inject a real codec, the Spark-side plumbing is identical.

Format reference: ITU-T T.81 (JPEG spec); the Huffman tables below are
the spec's Annex K "typical" tables, the quantization tables Annex K
Tables K.1/K.2 scaled per libjpeg's quality curve.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K)
# ---------------------------------------------------------------------------
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
])
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
])

# (bits per code length 1..16, symbol values) — Annex K.3
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
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# 8-point DCT-II orthonormal matrix (the 2-D DCT is D @ B @ D.T)
_k = np.arange(8)
_DCT = np.sqrt(2.0 / 8.0) * np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16.0)
_DCT[0] /= np.sqrt(2.0)


def _quality_scale(q_table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality curve: 50 → table as-is, 95 → ~10% of it."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q_table * s + 50) // 100, 1, 255).astype(np.int32)


# ---------------------------------------------------------------------------
# Huffman helpers
# ---------------------------------------------------------------------------
def _build_codes(bits, values):
    """symbol -> (code, length) per T.81 C.2 canonical assignment."""
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_table(bits, values):
    """(code, length) -> symbol (dict keyed by (length, code))."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # marker (EOI / RSTn boundary handled by caller):
                    # rewind and feed 1-padding so in-flight reads finish
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
            if self.nbits == 0:
                return 1  # past end: 1-padding
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman stream")

    def align(self) -> None:
        self.nbits = 0
        self.acc = 0


def _magnitude(v: int) -> tuple[int, int]:
    """DC/AC coefficient coding: (category, magnitude bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------
def encode_jpeg(px: np.ndarray, quality: int = 90, subsampling: str = "444") -> bytes:
    """Encode a top-down (h, w) or (h, w, 1|3) uint8 array as a baseline
    JFIF JPEG (quality per the libjpeg curve). ``subsampling``: "444"
    (no chroma subsampling) or "420" (2x2 chroma decimation — the
    dominant real-world layout; exercises the decoder's interleaved-MCU
    and upsample paths)."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, ncomp = px.shape
    if ncomp not in (1, 3):
        raise NotImplementedError("encode_jpeg supports 1 or 3 channels")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be 444 or 420, got {subsampling}")

    if ncomp == 3:
        rgb = px.astype(np.float64)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = 128.0 - 0.168735892 * rgb[..., 0] - 0.331264108 * rgb[..., 1] + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418687589 * rgb[..., 1] - 0.081312411 * rgb[..., 2]
        planes = [y, cb, cr]
    else:
        planes = [px[..., 0].astype(np.float64)]

    # per-component sampling factors
    if ncomp == 3 and subsampling == "420":
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1)] * ncomp
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    qt = [_quality_scale(_Q_LUMA, quality)]
    if ncomp == 3:
        qt.append(_quality_scale(_Q_CHROMA, quality))

    enc_dc = [_build_codes(*_HUFF_DC_LUMA)]
    enc_ac = [_build_codes(*_HUFF_AC_LUMA)]
    if ncomp == 3:
        enc_dc.append(_build_codes(*_HUFF_DC_CHROMA))
        enc_ac.append(_build_codes(*_HUFF_AC_CHROMA))

    def _pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
        out = np.empty((ph, pw), np.float64)
        oh, ow = plane.shape
        out[:oh, :ow] = plane
        if ph > oh:
            out[oh:, :ow] = plane[oh - 1 :, :]
        if pw > ow:
            out[:, ow:] = out[:, ow - 1 : ow]
        return out

    # Per-plane downsample (420 chroma), blocked DCT + quantization
    coefs = []
    for ci, plane in enumerate(planes):
        sh, sv = samp[ci]
        if (sh, sv) != (hmax, vmax):
            # 2x2 box decimation on an even-padded plane
            ry, rx = vmax // sv, hmax // sh
            p = _pad_to(plane, (h + ry - 1) // ry * ry, (w + rx - 1) // rx * rx)
            plane = p.reshape(p.shape[0] // ry, ry, p.shape[1] // rx, rx).mean(axis=(1, 3))
        pb_h, pb_w = mcuy * sv, mcux * sh
        padded = _pad_to(plane, pb_h * 8, pb_w * 8)
        blocks = (
            padded.reshape(pb_h, 8, pb_w, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
            - 128.0
        )
        dct = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
        # quant table is stored zigzag-ordered in the file but applied in
        # natural order here: un-zigzag it to an 8x8 natural matrix
        qnat = np.empty(64, np.int32)
        qnat[_ZIGZAG] = qt[min(ci, len(qt) - 1)]
        quant = np.round(dct / qnat.reshape(8, 8)).astype(np.int32)
        coefs.append(quant.reshape(-1, 64)[:, _ZIGZAG])  # zigzag order

    # Entropy coding, interleaved MCUs in T.81 order: per MCU, each
    # component contributes its v*h blocks row-major
    bw_writer = _BitWriter()
    prev_dc = [0] * ncomp
    for m in range(mcuy * mcux):
        my, mx = divmod(m, mcux)
        for ci in range(ncomp):
            sh, sv = samp[ci]
            ti = min(ci, len(enc_dc) - 1)
            for v_i in range(sv):
                for h_i in range(sh):
                    bx = mx * sh + h_i
                    by = my * sv + v_i
                    zz = coefs[ci][by * (mcux * sh) + bx]
                    diff = int(zz[0]) - prev_dc[ci]
                    prev_dc[ci] = int(zz[0])
                    size, bits = _magnitude(diff)
                    code, length = enc_dc[ti][size]
                    bw_writer.write(code, length)
                    if size:
                        bw_writer.write(bits, size)
                    run = 0
                    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                    for k in range(1, 64):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, length = enc_ac[ti][0xF0]  # ZRL
                            bw_writer.write(code, length)
                            run -= 16
                        size, bits = _magnitude(v)
                        code, length = enc_ac[ti][(run << 4) | size]
                        bw_writer.write(code, length)
                        bw_writer.write(bits, size)
                        run = 0
                    if last_nz < 63:
                        code, length = enc_ac[ti][0x00]  # EOB
                        bw_writer.write(code, length)
    scan = bw_writer.flush()

    # --- markers ---
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for ti, q in enumerate(qt):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([ti]) + bytes(int(x) for x in q)
    comp_spec = b""
    for ci in range(ncomp):
        sh, sv = samp[ci]
        comp_spec += bytes([ci + 1, (sh << 4) | sv, min(ci, len(qt) - 1)])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp) + comp_spec
    tables = [(0x00, _HUFF_DC_LUMA), (0x10, _HUFF_AC_LUMA)]
    if ncomp == 3:
        tables += [(0x01, _HUFF_DC_CHROMA), (0x11, _HUFF_AC_CHROMA)]
    for tc, (bits, values) in tables:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(values)) + bytes([tc])
        out += bytes(bits) + bytes(values)
    sos_comp = b""
    for ci in range(ncomp):
        ti = min(ci, 1)
        sos_comp += bytes([ci + 1, (ti << 4) | ti])
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * ncomp) + bytes([ncomp]) + sos_comp + b"\x00\x3f\x00"
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------
def _jpeg_pixels(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG into a top-down (h, w, ncomp) uint8 array
    (ncomp 1 or 3, RGB for 3)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    scan_comps = None
    scan_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(body, np.uint8, 64, i + 1).astype(np.int32)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                nv = sum(bits)
                values = list(body[i + 17 : i + 17 + nv])
                huff[(tc, th)] = _build_decode_table(bits, values)
                i += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, nc = body[0], *struct.unpack_from(">HH", body, 1), body[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit JPEG supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci], body[7 + 3 * ci], body[8 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/1) supported — inject a "
                "codec-library decoder for progressive/arithmetic files"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = []
            for ci in range(ns):
                cs, tt = body[1 + 2 * ci], body[2 + 2 * ci]
                scan_comps.append({"cs": cs, "td": tt >> 4, "ta": tt & 0xF})
            scan_start = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if frame is None or scan_comps is None:
        raise ValueError("missing SOF/SOS in JPEG stream")

    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not all(c["h"] in (1, 2) and c["v"] in (1, 2) for c in comps):
        raise NotImplementedError("sampling factors beyond 2 unsupported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # per-component coefficient planes (in blocks)
    planes = []
    for c in comps:
        pb_w, pb_h = mcux * c["h"], mcuy * c["v"]
        planes.append(np.zeros((pb_h * pb_w, 64), np.int32))

    by_cs = {c["id"]: i for i, c in enumerate(comps)}
    reader = _BitReader(payload[scan_start:])
    prev_dc = [0] * len(comps)
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            reader.align()
            # skip the RSTn marker bytes
            while reader.pos + 1 < len(reader.data) and reader.data[reader.pos] == 0xFF and 0xD0 <= reader.data[reader.pos + 1] <= 0xD7:
                reader.pos += 2
            prev_dc = [0] * len(comps)
        my, mx = divmod(m, mcux)
        for sc in scan_comps:
            ci = by_cs[sc["cs"]]
            c = comps[ci]
            dc_tab = huff[(0, sc["td"])]
            ac_tab = huff[(1, sc["ta"])]
            for v_i in range(c["v"]):
                for h_i in range(c["h"]):
                    zz = np.zeros(64, np.int32)
                    size = reader.decode_symbol(dc_tab)
                    diff = _extend(reader.read_bits(size), size)
                    prev_dc[ci] += diff
                    zz[0] = prev_dc[ci]
                    k = 1
                    while k < 64:
                        rs = reader.decode_symbol(ac_tab)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC index overflow in JPEG scan")
                        zz[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    bx = mx * c["h"] + h_i
                    by = my * c["v"] + v_i
                    planes[ci][by * (mcux * c["h"]) + bx] = zz

    # dequantize + IDCT per component, vectorized over blocks
    out_planes = []
    for ci, c in enumerate(comps):
        q = qt[c["tq"]]
        nat = np.zeros((len(planes[ci]), 64), np.float64)
        nat[:, _ZIGZAG] = planes[ci] * q[None, :]
        blocks = nat.reshape(-1, 8, 8)
        spatial = np.einsum("ji,njk,kl->nil", _DCT, blocks, _DCT) + 128.0
        pb_w = mcux * c["h"]
        pb_h = mcuy * c["v"]
        plane = (
            spatial.reshape(pb_h, pb_w, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(pb_h * 8, pb_w * 8)
        )
        # upsample to full resolution, then crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes.append(plane[:h, :w])

    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_jpeg(payload: bytes):
    """Multimodal-decoder contract for JPEG: returns
    (width, height, 1, 8-dim feature) — per-channel mean/std over RGB
    (gray replicated), log-area, aspect — matching decode_bmp/decode_png."""
    import math

    px = _jpeg_pixels(payload)
    h, w = px.shape[:2]
    rgb = px[:, :, :3] if px.shape[2] >= 3 else np.repeat(px[:, :, :1], 3, axis=2)
    ch = rgb.reshape(-1, 3).astype(np.float64)
    feat = [
        *(float(x) for x in ch.mean(axis=0)),
        *(float(x) for x in ch.std(axis=0)),
        math.log1p(float(w * h)),
        float(w) / float(h or 1),
    ]
    return int(w), int(h), 1, feat
