"""Baseline JPEG codec, pure numpy + stdlib — the pixel-level decode
the r11/r12 verdicts listed as PIL-blocked, scoped honestly: baseline
DCT (SOF0) for single-component GRAYSCALE and three-component YCbCr
COLOR at 4:4:4 or 4:2:0 (generalized interleaved-MCU loop over ≤2×2
sampling factors, per-component DC predictors, chroma box-average
down / sample-replicate up, the YCbCr↔RGB JFIF transform), tables
read from the file's own DQT/DHT segments, restart intervals
(DRI + RSTn predictor resets — the camera-JPEG convention, r13).
Progressive (SOF2) frames route to operators/jpeg_progressive.py,
lossless (SOF3) to operators/jpeg_lossless.py; sampling beyond the
T.81 Nb=4 shapes and the arithmetic SOFs still route to PIL when
present.

Everything is the ITU T.81 pipeline: 8×8 blocks → level shift →
orthonormal DCT-II → quantize (round) → zigzag → DC differential +
magnitude coding → canonical Huffman → byte-stuffed entropy stream,
and the exact inverse.  The decoder trusts only the payload (its DQT
and DHT segments and SOF sampling factors), so it decodes any
conforming baseline file in these shapes, not just this encoder's
output.

Exactness anchor for oracle gating: a SOLID image whose level-shifted
value is EVEN survives the whole lossy pipeline EXACTLY — the only
nonzero coefficient is DC = 8·(v−128); quantized by the table's
Q[0,0]=16 that is round((v−128)/2), and the IDCT returns
2·round((v−128)/2)+128 = v when v−128 is even.  synth_jpeg_inventory
(operators/multimodal.py) builds its closed-form DuckDB oracle on
exactly this identity.
"""

from __future__ import annotations

import struct

import numpy as np

# ITU T.81 Annex K.1 — standard luminance quantization table.
STD_LUMA_QUANT = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.int64)

# Annex K.3 — luminance DC: code-length counts (BITS) + symbols.
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

# Annex K.3 — luminance AC.
AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_VALS = [
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
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

# Zigzag scan order: _ZZ[i] = (row, col) of the i-th coefficient, per
# ITU T.81 Figure 5: (0,0),(0,1),(1,0),(2,0),(1,1),(0,2),... — even
# diagonals (r+c) are walked with DEcreasing row (sort by col), odd
# diagonals with INcreasing row.
_ZZ = np.array(sorted(
    ((r, c) for r in range(8) for c in range(8)),
    key=lambda rc: (rc[0] + rc[1],
                    rc[0] if (rc[0] + rc[1]) % 2 else rc[1])))

# Orthonormal 8-point DCT-II matrix: block DCT = C @ B @ C.T with the
# JPEG normalization (F(0,0) of a constant-v block = 8·v).
_C = np.zeros((8, 8))
for _u in range(8):
    _cu = (1 / np.sqrt(2)) if _u == 0 else 1.0
    for _x in range(8):
        _C[_u, _x] = 0.5 * _cu * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _canonical_codes(bits, vals):
    """symbol -> (code, length) per the T.81 canonical construction."""
    codes, code = {}, 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:            # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if (self.pos < len(self.data)
                        and self.data[self.pos] == 0x00):
                    self.pos += 1     # un-stuff
                else:
                    raise ValueError("unexpected marker in scan")
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        return v

    def restart(self, m: int):
        """Consume an RSTm marker at a restart boundary: discard the
        byte-alignment padding bits, verify the expected modulo-8
        marker, and clear the accumulator (per T.81 §B.2.1.1 the
        entropy stream byte-aligns before every RSTn)."""
        self.acc = 0
        self.nbits = 0
        if (self.pos + 2 > len(self.data)
                or self.data[self.pos] != 0xFF
                or self.data[self.pos + 1] != 0xD0 + (m & 7)):
            raise ValueError("expected JPEG restart marker")
        self.pos += 2


def _magnitude(v: int):
    """JPEG magnitude coding: (size, extra bits)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def _encode_block(bw, blk, dc_codes, ac_codes, prev_dc: int) -> int:
    """One 8×8 level-shifted block through DCT → quantize → zigzag →
    entropy coding; returns this block's DC for the next predictor."""
    F = _C @ blk @ _C.T
    q = np.round(F / STD_LUMA_QUANT).astype(np.int64)
    zz = q[_ZZ[:, 0], _ZZ[:, 1]]
    s, extra = _magnitude(int(zz[0]) - prev_dc)
    code, ln = dc_codes[s]
    bw.write(code, ln)
    if s:
        bw.write(extra, s)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]           # ZRL
            bw.write(code, ln)
            run -= 16
        s, extra = _magnitude(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.write(code, ln)
        bw.write(extra, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]               # EOB
        bw.write(code, ln)
    return int(zz[0])


def _encode_planes(planes, h: int, w: int, sampling=None,
                   restart_every: int = 0) -> bytes:
    """Shared encoder body: interleaved MCUs over per-component
    sampling factors (default 1×1 for every plane — grayscale SOF0
    or 4:4:4 color; pass ``sampling=[(2, 2), (1, 1), (1, 1)]`` for
    4:2:0).  ``planes[i]`` must already be at its component
    resolution (the caller downsamples chroma).  One quant + one
    Huffman table pair serves every component (a legal table
    mapping — the decoder reads whatever the file declares)."""
    nc = len(planes)
    sampling = sampling or [(1, 1)] * nc
    hmax = max(sx for sx, _ in sampling)
    vmax = max(sy for _, sy in sampling)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    shifted = []
    for p, (sx, sy) in zip(planes, sampling):
        ph, pw = p.shape
        PH, PW = mcus_y * 8 * sy, mcus_x * 8 * sx
        shifted.append(np.pad(p, ((0, PH - ph), (0, PW - pw)),
                              mode="edge").astype(np.float64) - 128.0)
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    prev = [0] * nc
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_every and mcu_i and mcu_i % restart_every == 0:
                # byte-align (1-fill) then the raw RSTn marker —
                # markers are never byte-stuffed
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + ((mcu_i // restart_every
                                                - 1) & 7)])
                prev = [0] * nc
            mcu_i += 1
            for ci, ((sx, sy), plane) in enumerate(
                    zip(sampling, shifted)):
                for by in range(sy):
                    for bx in range(sx):
                        r0 = (my * sy + by) * 8
                        c0 = (mx * sx + bx) * 8
                        prev[ci] = _encode_block(
                            bw, plane[r0:r0 + 8, c0:c0 + 8],
                            dc_codes, ac_codes, prev[ci])
    bw.flush()

    def seg(marker, body):
        return marker + struct.pack(">H", 2 + len(body)) + body

    zz_quant = STD_LUMA_QUANT[_ZZ[:, 0], _ZZ[:, 1]]
    dqt = seg(b"\xff\xdb", b"\x00" + bytes(int(x) for x in zz_quant))
    comp_spec = b"".join(
        bytes([cid + 1, (sx << 4) | sy, 0x00])
        for cid, (sx, sy) in enumerate(sampling))
    sof = seg(b"\xff\xc0", struct.pack(">BHHB", 8, h, w, nc)
              + comp_spec)
    dht = seg(b"\xff\xc4",
              b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)
              + b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    sos = seg(b"\xff\xda", bytes([nc])
              + b"".join(bytes([cid + 1, 0x00])
                         for cid in range(nc))
              + b"\x00\x3f\x00")
    dri = (seg(b"\xff\xdd", struct.pack(">H", restart_every))
           if restart_every else b"")
    return (b"\xff\xd8" + dqt + sof + dht + dri + sos
            + bytes(bw.out) + b"\xff\xd9")


def encode_jpeg_gray(pixels, restart_every: int = 0) -> bytes:
    """Baseline JFIF encoder for an HxW uint8 grayscale array with
    the Annex-K luminance tables — edge-replicated to 8×8 blocks.
    ``restart_every`` emits a DRI segment + RSTn markers every N
    MCUs (the camera-JPEG convention the decoder now handles)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    return _encode_planes([px], h, w, restart_every=restart_every)


def _rgb_to_ycbcr_planes(pixels):
    px = np.asarray(pixels, dtype=np.uint8).astype(np.float64)
    r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return [np.clip(np.round(p), 0, 255).astype(np.uint8)
            for p in (y, cb, cr)]


def encode_jpeg_rgb(pixels, restart_every: int = 0) -> bytes:
    """Baseline 4:4:4 color encoder: JFIF YCbCr conversion, three
    full-resolution planes in interleaved MCUs (no subsampling)."""
    h, w, _ = np.asarray(pixels).shape
    return _encode_planes(_rgb_to_ycbcr_planes(pixels), h, w,
                          restart_every=restart_every)


def encode_jpeg_rgb_420(pixels, restart_every: int = 0) -> bytes:
    """Baseline 4:2:0 color encoder — the dominant real-world JPEG
    shape: full-resolution Y (2×2 sampling), chroma box-averaged
    down 2× each way (1×1), four Y blocks + Cb + Cr per MCU."""
    h, w, _ = np.asarray(pixels).shape
    y, cb, cr = _rgb_to_ycbcr_planes(pixels)

    def _down2(p):
        ph, pw = p.shape
        q = np.pad(p, ((0, ph % 2), (0, pw % 2)), mode="edge") \
            .astype(np.float64)
        return np.clip(np.round(
            (q[0::2, 0::2] + q[1::2, 0::2]
             + q[0::2, 1::2] + q[1::2, 1::2]) / 4.0),
            0, 255).astype(np.uint8)

    return _encode_planes([y, _down2(cb), _down2(cr)], h, w,
                          sampling=[(2, 2), (1, 1), (1, 1)],
                          restart_every=restart_every)


def encode_jpeg_rgb_422(pixels, restart_every: int = 0) -> bytes:
    """Baseline 4:2:2 color encoder — the broadcast-video still
    shape: full-resolution Y (2×1 sampling), chroma box-averaged
    down 2× HORIZONTALLY only (the decoder's generalized MCU loop
    and sample-replicate upsample already handle 2×1 factors)."""
    h, w, _ = np.asarray(pixels).shape
    y, cb, cr = _rgb_to_ycbcr_planes(pixels)

    def _down2h(p):
        ph, pw = p.shape
        q = np.pad(p, ((0, 0), (0, pw % 2)), mode="edge") \
            .astype(np.float64)
        return np.clip(np.round(
            (q[:, 0::2] + q[:, 1::2]) / 2.0), 0, 255) \
            .astype(np.uint8)

    return _encode_planes([y, _down2h(cb), _down2h(cr)], h, w,
                          sampling=[(2, 1), (1, 1), (1, 1)],
                          restart_every=restart_every)


def encode_jpeg_rgb_411(pixels, restart_every: int = 0) -> bytes:
    """Baseline 4:1:1 color encoder — the DV-video still shape:
    full-resolution Y at 4×1 sampling (four horizontally-adjacent Y
    blocks per MCU, the T.81 Nb=4 maximum), chroma box-averaged down
    4× horizontally."""
    h, w, _ = np.asarray(pixels).shape
    y, cb, cr = _rgb_to_ycbcr_planes(pixels)

    def _down4h(p):
        ph, pw = p.shape
        q = np.pad(p, ((0, 0), (0, (-pw) % 4)), mode="edge") \
            .astype(np.float64)
        return np.clip(np.round(
            (q[:, 0::4] + q[:, 1::4] + q[:, 2::4] + q[:, 3::4])
            / 4.0), 0, 255).astype(np.uint8)

    return _encode_planes([y, _down4h(cb), _down4h(cr)], h, w,
                          sampling=[(4, 1), (1, 1), (1, 1)],
                          restart_every=restart_every)


def _parse_dht(body: bytes) -> dict:
    """One or more Huffman tables from a DHT body:
    {(class, id): prefix-decode map {(code, len): symbol}}."""
    tables = {}
    pos = 0
    while pos < len(body):
        tc_th = body[pos]
        bits = list(body[pos + 1:pos + 17])
        n = sum(bits)
        vals = list(body[pos + 17:pos + 17 + n])
        codes = _canonical_codes(bits, vals)
        tables[(tc_th >> 4, tc_th & 0xF)] = {
            (c, ln): sym for sym, (c, ln) in codes.items()}
        pos += 17 + n
    return tables


def _huff_decode(br: _BitReader, table: dict) -> int:
    code, ln = 0, 0
    while ln < 16:               # T.81 max code length is 16 bits
        code = (code << 1) | br.read(1)
        ln += 1
        sym = table.get((code, ln))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in JPEG scan")


def _decode_block(br, dc_tbl, ac_tbl, Q, prev_dc: int):
    """One entropy-coded block → spatial 8×8 floats; returns
    (block, new DC predictor)."""
    zz = np.zeros(64, dtype=np.int64)
    s = _huff_decode(br, dc_tbl)
    prev_dc += _extend(br.read(s), s) if s else 0
    zz[0] = prev_dc
    i = 1
    while i < 64:
        rs = _huff_decode(br, ac_tbl)
        if rs == 0x00:                # EOB
            break
        if rs == 0xF0:                # ZRL
            i += 16
            continue
        i += rs >> 4
        size = rs & 0xF
        if i > 63:
            raise ValueError("AC run past block end")
        zz[i] = _extend(br.read(size), size)
        i += 1
    F = np.zeros((8, 8), dtype=np.float64)
    F[_ZZ[:, 0], _ZZ[:, 1]] = zz * Q[_ZZ[:, 0], _ZZ[:, 1]]
    return _C.T @ F @ _C, prev_dc


def decode_jpeg_pixels(payload: bytes) -> np.ndarray:
    """Decode a JPEG to its uint8 pixel array — HxW for
    single-component (grayscale), HxWx3 RGB for three-component
    YCbCr at any ≤2×2 sampling (4:4:4, 4:2:0, ...) — using the
    payload's own DQT/DHT tables, restart intervals included, so any
    conforming file in these shapes decodes, not just this encoder's
    output.  Progressive (SOF2) frames route to the Annex-G decoder
    in operators/jpeg_progressive.py and lossless (SOF3) frames to
    the Annex-H decoder in operators/jpeg_lossless.py; illegal
    sampling shapes and the arithmetic SOFs raise typed
    NotImplementedError (PIL territory)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos, quant, huff, sof, scan, dri = 2, {}, {}, None, None, 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            break
        size = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4:pos + 2 + size]
        if marker == 0xDB:
            p = 0
            while p < len(body):
                if body[p] >> 4:          # Pq=1: 16-bit big-endian
                    zz = np.frombuffer(body[p + 1:p + 129],
                                       dtype=">u2")
                    step = 129
                else:
                    zz = np.frombuffer(body[p + 1:p + 65],
                                       dtype=np.uint8)
                    step = 65
                t = np.zeros((8, 8), dtype=np.int64)
                t[_ZZ[:, 0], _ZZ[:, 1]] = zz
                quant[body[p] & 0xF] = t
                p += step
        elif marker == 0xC4:
            huff.update(_parse_dht(body))
        elif marker == 0xC0:
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for ci in range(ncomp):
                cid, samp, qid = body[6 + 3 * ci:9 + 3 * ci]
                sx, sy = samp >> 4, samp & 0xF
                if (sx not in (1, 2, 4) or sy not in (1, 2, 4)
                        or sx * sy > 4):
                    # T.81 caps blocks per MCU component at 4 (Nb);
                    # 1/2/4 factors cover 4:4:4, 4:2:2, 4:2:0, 4:1:1
                    raise NotImplementedError(
                        "sampling factors beyond the T.81 Nb<=4 "
                        "shapes need PIL")
                comps.append((cid, qid, sx, sy))
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG needs PIL")
            sof = (h, w, comps)
        elif marker == 0xC2:
            # Progressive frame: the full Annex-G decoder
            # (operators/jpeg_progressive.py) takes the whole payload.
            from data_ingestion_challenge_spark.operators import (
                jpeg_progressive,
            )
            return jpeg_progressive.decode_jpeg_progressive(payload)
        elif marker == 0xC3:
            # Lossless frame: the Annex-H predictive decoder
            # (operators/jpeg_lossless.py) takes the whole payload.
            from data_ingestion_challenge_spark.operators import (
                jpeg_lossless,
            )
            return jpeg_lossless.decode_jpeg_lossless(payload)
        elif 0xC1 <= marker <= 0xCF and marker != 0xC8:
            raise NotImplementedError(
                "non-baseline (extended/arithmetic) JPEG needs PIL")
        elif marker == 0xDA:
            ns = body[0]
            tabs = {body[1 + 2 * i]: (body[2 + 2 * i] >> 4,
                                      body[2 + 2 * i] & 0xF)
                    for i in range(ns)}
            scan = (payload[pos + 2 + size:], tabs)
            break
        elif marker == 0xDD:
            dri = struct.unpack_from(">H", body, 0)[0]
        pos += 2 + size
    if sof is None or scan is None:
        raise ValueError("JPEG payload missing SOF0/SOS")
    h, w, comps = sof
    data, tabs = scan
    hmax = max(sx for _, _, sx, _ in comps)
    vmax = max(sy for _, _, _, sy in comps)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [np.zeros((mcus_y * 8 * sy, mcus_x * 8 * sx),
                       dtype=np.float64)
              for _, _, sx, sy in comps]
    br = _BitReader(data)
    prev = [0] * len(comps)
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_i and mcu_i % dri == 0:
                # restart boundary: byte-align to the RSTn marker and
                # reset every DC predictor (T.81 §E.2.4)
                br.restart(mcu_i // dri - 1)
                prev = [0] * len(comps)
            mcu_i += 1
            for ci, (cid, qid, sx, sy) in enumerate(comps):
                dc_id, ac_id = tabs[cid]
                for by in range(sy):
                    for bx in range(sx):
                        blk, prev[ci] = _decode_block(
                            br, huff[(0, dc_id)], huff[(1, ac_id)],
                            quant[qid], prev[ci])
                        r0 = (my * sy + by) * 8
                        c0 = (mx * sx + bx) * 8
                        planes[ci][r0:r0 + 8, c0:c0 + 8] = blk
    return _planes_to_pixels(planes, comps, h, w, hmax, vmax)


def _planes_to_pixels(planes, comps, h: int, w: int,
                      hmax: int, vmax: int) -> np.ndarray:
    """Shared decoder tail (baseline and progressive): upsample
    subsampled components to full resolution (nearest — sample
    replication, the baseline-decoder convention), crop to the image
    dims, level-shift, and apply the JFIF YCbCr→RGB transform for
    3-component images."""
    up = []
    for (cid, qid, sx, sy), p in zip(comps, planes):
        if sx < hmax:
            p = np.repeat(p, hmax // sx, axis=1)
        if sy < vmax:
            p = np.repeat(p, vmax // sy, axis=0)
        up.append(p[:h, :w] + 128.0)
    planes = up
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                   0, 255).astype(np.uint8)


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Single-component convenience wrapper over
    decode_jpeg_pixels (kept as the grayscale witness entrypoint)."""
    px = decode_jpeg_pixels(payload)
    if px.ndim != 2:
        raise ValueError("not a grayscale JPEG")
    return px
