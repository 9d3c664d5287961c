"""Lossless JPEG codec (SOF3, ITU T.81 Annex H) — pure numpy +
stdlib, closing one of the two JPEG SOF families the earlier rounds
left PIL-gated (the other, arithmetic entropy coding, stays gated:
its 113-row Qe state table can't be reproduced from memory with
conformance confidence, and no external fixture source exists in this
container to verify against — a self-consistent-but-wrong table would
be exactly the hazard the r12 zigzag advice flagged).

Lossless JPEG is the predictive DPCM process: no DCT, no
quantization.  Each sample is predicted from its causal neighbors

        c  b
        a  x

via one of seven integer predictors selected by the scan header's Ss
field (1: a, 2: b, 3: c, 4: a+b-c, 5: a+((b-c)>>1), 6: b+((a-c)>>1),
7: (a+b)>>1), the difference x-Px is coded modulo 2**16 with the
SAME magnitude-category + extra-bits scheme baseline uses for DC
coefficients (SSSS 16 codes the no-extra-bits 32768 case), and the
entropy stream is canonical Huffman read from the file's own DHT.
Positional rules (T.81 H.1.2): the scan's first sample is predicted
as 2**(P-Pt-1); the rest of the first line uses predictor 1; each
later line starts with predictor 2; a restart boundary restores the
scan-start state — default prediction for the next sample, then the
one-dimensional predictor for the remainder of that line.  The decoder trusts only the
payload (its DHT, SOF3 precision/components, SOS predictor + point
transform), so any conforming single-scan file with 1x1 sampling
decodes — not just this encoder's output; interleaving with 1x1
sampling makes the MCU one sample per component.

Exactness anchor for oracle gating: the process is LOSSLESS, so a
decoded image equals the synthesized one bit-for-bit — any closed
form over synthesized pixels (mean of a horizontal ramp, say) is a
driver-checkable oracle on the decoded output for EVERY predictor
and both precisions.
"""

from __future__ import annotations

import struct

import numpy as np

from data_ingestion_challenge_spark.operators.jpeg_codec import (
    _BitReader,
    _BitWriter,
    _canonical_codes,
    _extend,
    _huff_decode,
    _magnitude,
    _parse_dht,
)

# Canonical Huffman table for difference categories 0..16: Annex K.3
# DC luminance lengths (sym 0 at 2 bits, 1-5 at 3, then one per
# length) extended one-per-length through SSSS 16.  Kraft sum < 1 so
# the all-1-bits code stays reserved per the spec.
LL_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0]
LL_VALS = list(range(17))


def _predict(ra: int, rb: int, rc: int, sel: int) -> int:
    """T.81 Table H.1 — the seven lossless predictors."""
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    if sel == 7:
        return (ra + rb) >> 1
    raise ValueError(f"invalid lossless predictor {sel}")


def encode_jpeg_lossless(pixels, predictor: int = 1,
                         point_transform: int = 0,
                         restart_every: int = 0) -> bytes:
    """Lossless JPEG (SOF3) encoder: HxW (one component) or HxWxN
    (N interleaved 1x1 components) uint8 or uint16 in, conforming
    single-scan bytes out.  ``predictor`` is the scan's Ss selector
    (1-7); ``point_transform`` divides samples by 2**Pt before
    coding; ``restart_every`` emits DRI + RSTn every N MCUs with the
    scan-start prediction reset."""
    px = np.asarray(pixels)
    if not 1 <= predictor <= 7:
        raise ValueError(f"invalid lossless predictor {predictor}")
    prec = 16 if px.dtype == np.uint16 else 8
    if px.dtype not in (np.uint8, np.uint16):
        raise ValueError("lossless encoder takes uint8 or uint16")
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, nc = px.shape
    if not 1 <= nc <= 4:
        raise ValueError(
            f"{nc}-component scan exceeds the T.81 B.2.3 Ns<=4 limit")
    pt = point_transform
    if not 0 <= pt < prec:
        raise ValueError("point transform out of range")
    samples = (px.astype(np.int64) >> pt)
    default = 1 << (prec - pt - 1)
    codes = _canonical_codes(LL_BITS, LL_VALS)
    bw = _BitWriter()
    # T.81 H.1.2: the first sample of the scan AND of every restart
    # interval predicts from the default; the REST OF THAT LINE uses
    # the one-dimensional predictor (Ra); later lines start with Rb
    # then run the selected predictor.
    reset = True                     # scan start == restart state
    line1d_y = 0                     # row where the last reset fired
    mcu = 0
    for y in range(h):
        for x in range(w):
            if restart_every and mcu and mcu % restart_every == 0:
                bw.flush()
                bw.out += bytes(
                    [0xFF, 0xD0 + ((mcu // restart_every - 1) & 7)])
                reset = True
                line1d_y = y
            mcu += 1
            for ci in range(nc):
                v = int(samples[y, x, ci])
                if reset:
                    p = default
                elif y == line1d_y:
                    p = int(samples[y, x - 1, ci])
                elif x == 0:
                    p = int(samples[y - 1, x, ci])
                else:
                    p = _predict(int(samples[y, x - 1, ci]),
                                 int(samples[y - 1, x, ci]),
                                 int(samples[y - 1, x - 1, ci]),
                                 predictor)
                d = (v - p) & 0xFFFF
                if d >= 0x8000:
                    d -= 0x10000
                if d == -32768:      # SSSS 16: no extra bits
                    code, ln = codes[16]
                    bw.write(code, ln)
                else:
                    s, extra = _magnitude(d)
                    code, ln = codes[s]
                    bw.write(code, ln)
                    if s:
                        bw.write(extra, s)
            reset = False
    bw.flush()

    def seg(marker, body):
        return marker + struct.pack(">H", 2 + len(body)) + body

    sof = seg(b"\xff\xc3", struct.pack(">BHHB", prec, h, w, nc)
              + b"".join(bytes([ci + 1, 0x11, 0x00])
                         for ci in range(nc)))
    dht = seg(b"\xff\xc4",
              b"\x00" + bytes(LL_BITS) + bytes(LL_VALS))
    dri = (seg(b"\xff\xdd", struct.pack(">H", restart_every))
           if restart_every else b"")
    sos = seg(b"\xff\xda", bytes([nc])
              + b"".join(bytes([ci + 1, 0x00]) for ci in range(nc))
              + bytes([predictor, 0x00, pt]))
    return (b"\xff\xd8" + sof + dht + dri + sos
            + bytes(bw.out) + b"\xff\xd9")


def decode_jpeg_lossless(payload: bytes) -> np.ndarray:
    """Decode a lossless (SOF3) JPEG to its sample array — HxW for
    one component, HxWxN for N interleaved 1x1 components — uint8
    when the frame precision is <= 8, uint16 otherwise, using the
    payload's own DHT tables, predictor, point transform, and
    restart interval.  Sampling factors other than 1x1 (the rare
    multi-MCU lossless interleave) raise typed NotImplementedError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos, huff, sof, scan, dri = 2, {}, None, None, 0
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
        if marker == 0xC4:
            huff.update(_parse_dht(body))
        elif marker == 0xC3:
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if h == 0:
                raise ValueError("JPEG DNL-deferred height")
            comps = []
            for ci in range(ncomp):
                cid, samp, _q = body[6 + 3 * ci:9 + 3 * ci]
                if samp != 0x11:
                    raise NotImplementedError(
                        "lossless JPEG with subsampled components "
                        "needs PIL")
                comps.append(cid)
            sof = (prec, h, w, comps)
        elif marker == 0xDD:
            dri = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:
            ns = body[0]
            tabs = {body[1 + 2 * i]: body[2 + 2 * i] >> 4
                    for i in range(ns)}
            sel = body[1 + 2 * ns]           # Ss = predictor
            pt = body[3 + 2 * ns] & 0xF      # Al = point transform
            scan = (payload[pos + 2 + size:], tabs, sel, pt)
            break
        pos += 2 + size
    if sof is None or scan is None:
        raise ValueError("JPEG payload missing SOF3/SOS")
    prec, h, w, comps = sof
    data, tabs, sel, pt = scan
    if not 1 <= sel <= 7:
        raise ValueError(f"invalid lossless predictor {sel}")
    nc = len(comps)
    out = np.zeros((h, w, nc), dtype=np.int64)
    tables = [huff[(0, tabs[cid])] for cid in comps]
    br = _BitReader(data)
    default = 1 << (prec - pt - 1)
    # positional rules mirror the encoder (T.81 H.1.2): default at
    # scan/restart start, Ra for the rest of the reset row, Rb at
    # line starts, the selected predictor elsewhere
    reset = True
    line1d_y = 0
    mcu = 0
    for y in range(h):
        for x in range(w):
            if dri and mcu and mcu % dri == 0:
                br.restart(mcu // dri - 1)
                reset = True
                line1d_y = y
            mcu += 1
            for ci in range(nc):
                s = _huff_decode(br, tables[ci])
                if s == 16:
                    d = 32768
                else:
                    d = _extend(br.read(s), s) if s else 0
                if reset:
                    p = default
                elif y == line1d_y:
                    p = int(out[y, x - 1, ci])
                elif x == 0:
                    p = int(out[y - 1, x, ci])
                else:
                    p = _predict(int(out[y, x - 1, ci]),
                                 int(out[y - 1, x, ci]),
                                 int(out[y - 1, x - 1, ci]),
                                 sel)
                out[y, x, ci] = (p + d) & 0xFFFF
            reset = False
    px = out << pt
    dtype = np.uint8 if prec <= 8 else np.uint16
    px = px.astype(dtype)
    return px[:, :, 0] if nc == 1 else px
