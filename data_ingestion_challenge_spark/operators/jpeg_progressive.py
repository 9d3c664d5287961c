"""Progressive JPEG codec (ITU T.81 Annex G), pure numpy + stdlib —
the last named PIL-gated JPEG shape, now native: SOF2 frames decoded
through BOTH progressive dimensions (spectral selection bands AND
successive approximation with point transforms), plus a real
progressive ENCODER emitting a libjpeg-style scan script (DC first at
Al=1 → DC refinement, per-component AC bands 1-5 / 6-63 at Al=1 →
full-band AC refinement to Al=0) so round-trip tests drive every
decoder path: EOB runs, ZRL-in-refinement, buffered correction bits,
newly-significant placement, and the sign-magnitude vs
two's-complement split between AC and DC point transforms.

Algorithm notes (the spec's trickiest corners, mirrored from T.81
figures G.2/G.7 and pinned by tests):

- DC point transform is an ARITHMETIC shift of the signed value
  (v >> Al); the refinement bit is simply OR-ed in — Python's
  floor-semantics `>>`/`|` on negative ints reproduce this exactly.
- AC point transform is SIGN-MAGNITUDE (sign · (|v| >> Al)); a
  refinement scan appends one magnitude bit per already-nonzero
  coefficient (moving it AWAY from zero) and places newly-significant
  ±1·2^Al coefficients via (run, size=1) codes whose runs count only
  ZERO-HISTORY positions.
- Correction bits are buffered by the encoder and emitted after the
  next Huffman code + sign bit; the decoder consumes them in position
  order during that code's coefficient walk — the interleave is
  bit-exact both ways (torture-tested on random images).
- EOB runs: EOBRUN includes the current block and decrements as each
  block completes; the tail of an EOB-terminated refinement block
  still consumes correction bits for its remaining nonzero-history
  coefficients.

Scope: 8-bit Huffman progressive, ≤2×2 sampling factors, restart
intervals included (DRI + RSTn per scan: byte-align, modulo-8 marker
verify, DC-predictor AND EOB-run resets at every boundary — an EOB
run cannot span a restart, §G.1.2.2).  Used automatically:
jpeg_codec.decode_jpeg_pixels routes SOF2 payloads here, so
decode_real / decode_media / media_inventory pick it up with no
caller change.
"""

from __future__ import annotations

import struct

import numpy as np

from data_ingestion_challenge_spark.operators.jpeg_codec import (
    AC_BITS, AC_VALS, DC_BITS, DC_VALS, STD_LUMA_QUANT, _BitReader,
    _BitWriter, _C, _ZZ, _canonical_codes, _extend, _huff_decode,
    _magnitude, _parse_dht, _planes_to_pixels,
)

_ZZ_FLAT = (_ZZ[:, 0] * 8 + _ZZ[:, 1])

# Progressive AC Huffman table: the Annex-K baseline table carries no
# EOBn (n>1) symbols, so an encoder using it can never produce
# multi-block EOB runs — and the decoder's EOBRUN>1 paths would ride
# untested.  This flat 8-bit canonical table carries every symbol a
# progressive AC scan can emit: (run 0-15, size 1-10), ZRL, and EOB0-14
# (176 codes ≤ 256, all-ones code unused per the spec).
_PROG_AC_VALS = sorted(
    {(r << 4) | s for r in range(16) for s in range(1, 11)}
    | {r << 4 for r in range(15)} | {0xF0})
_PROG_AC_BITS = [0] * 7 + [len(_PROG_AC_VALS)] + [0] * 8
_EOBRUN_CAP = 0x7FFF          # largest run EOB14 + 14 bits can carry


# ------------------------------------------------------------ decode


def _scan_end(payload: bytes, start: int) -> int:
    """First non-stuffed, non-RST marker position at/after start —
    the end of one scan's entropy-coded data."""
    p = start
    n = len(payload)
    while p < n:
        if payload[p] == 0xFF:
            if p + 1 >= n:
                return n
            nxt = payload[p + 1]
            if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:
                p += 2
                continue
            return p
        p += 1
    return n


def _decode_dc_scan(br, scomps, geom, coefs, huff, Ah, Al,
                    interleaved, dri=0):
    preds = {cid: 0 for cid, _, _ in scomps}
    if interleaved:
        mcus_x, mcus_y = geom["mcus"]
        mcus = []
        for my in range(mcus_y):
            for mx in range(mcus_x):
                mcu = []
                for cid, dc_id, _ in scomps:
                    sx, sy = geom["samp"][cid]
                    for by in range(sy):
                        for bx in range(sx):
                            mcu.append((cid, dc_id,
                                        my * sy + by, mx * sx + bx))
                mcus.append(mcu)
    else:
        cid, dc_id, _ = scomps[0]
        bh, bw = geom["blocks"][cid]
        mcus = [[(cid, dc_id, by, bx)]
                for by in range(bh) for bx in range(bw)]
    for mi, mcu in enumerate(mcus):
        if dri and mi and mi % dri == 0:
            br.restart(mi // dri - 1)
            preds = {cid: 0 for cid, _, _ in scomps}
        for cid, dc_id, by, bx in mcu:
            blk = coefs[cid][by, bx]
            if Ah == 0:
                s = _huff_decode(br, huff[(0, dc_id)])
                diff = _extend(br.read(s), s) if s else 0
                preds[cid] += diff
                blk[0] = preds[cid] << Al
            else:
                if br.read(1):
                    blk[0] |= 1 << Al
            coefs[cid][by, bx] = blk


def _decode_ac_first(br, blocks, ac_tbl, Ss, Se, Al, dri=0):
    eobrun = 0
    for bi, blk in enumerate(blocks):
        if dri and bi and bi % dri == 0:
            # EOB runs cannot span a restart (T.81 §G.1.2.2)
            br.restart(bi // dri - 1)
            eobrun = 0
        if eobrun > 0:
            eobrun -= 1
            continue
        k = Ss
        while k <= Se:
            rs = _huff_decode(br, ac_tbl)
            r, s = rs >> 4, rs & 15
            if s:
                k += r
                if k > Se:
                    raise ValueError("AC coefficient beyond band")
                blk[k] = _extend(br.read(s), s) << Al
                k += 1
            else:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read(r)
                    eobrun -= 1
                    break
                k += 16


def _decode_ac_refine(br, blocks, ac_tbl, Ss, Se, Al, dri=0):
    p1, m1 = 1 << Al, -(1 << Al)
    eobrun = 0
    for bi, blk in enumerate(blocks):
        if dri and bi and bi % dri == 0:
            br.restart(bi // dri - 1)
            eobrun = 0
        k = Ss
        if eobrun == 0:
            while k <= Se:
                rs = _huff_decode(br, ac_tbl)
                r, s = rs >> 4, rs & 15
                newval = 0
                if s:
                    if s != 1:
                        raise ValueError(
                            "AC refinement size must be 1")
                    newval = p1 if br.read(1) else m1
                elif r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read(r)
                    break
                # walk: corrections for nonzero-history coefficients,
                # r skippable zero-history ones, then place newval
                while k <= Se:
                    if blk[k] != 0:
                        if br.read(1) and (blk[k] & p1) == 0:
                            blk[k] += p1 if blk[k] >= 0 else m1
                    else:
                        r -= 1
                        if r < 0:
                            break
                    k += 1
                if newval and k <= Se:
                    blk[k] = newval
                k += 1
        if eobrun > 0:
            while k <= Se:      # tail corrections of an EOB block
                if blk[k] != 0:
                    if br.read(1) and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                k += 1
            eobrun -= 1


def decode_jpeg_progressive(payload: bytes) -> np.ndarray:
    """Full progressive (SOF2) decode: walk every segment in order
    (Huffman tables may be redefined between scans), accumulate
    coefficients across DC/AC first+refinement scans, then
    dequantize + IDCT + upsample + color-transform once at the end.
    Returns HxW grayscale or HxWx3 RGB uint8."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos, quant, huff, dri = 2, {}, {}, 0
    sof = None
    coefs = {}
    geom = {}
    while pos + 2 <= len(payload):
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
                quant[body[p] & 0xF] = zz.astype(np.int64)
                p += step
        elif marker == 0xC4:
            huff.update(_parse_dht(body))
        elif marker == 0xC2:
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    f"{ncomp}-component JPEG needs PIL")
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
            hmax = max(sx for _, _, sx, _ in comps)
            vmax = max(sy for _, _, _, sy in comps)
            mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
            mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
            geom = {"mcus": (mcus_x, mcus_y),
                    "samp": {cid: (sx, sy)
                             for cid, _, sx, sy in comps},
                    "blocks": {}}
            for cid, qid, sx, sy in comps:
                cw = (w * sx + 8 * hmax - 1) // (8 * hmax)
                ch_ = (h * sy + 8 * vmax - 1) // (8 * vmax)
                geom["blocks"][cid] = (ch_, cw)
                # padded to the interleaved MCU grid; non-interleaved
                # scans only touch the true (ch_, cw) prefix
                coefs[cid] = np.zeros(
                    (mcus_y * sy, mcus_x * sx, 64), dtype=np.int64)
            sof = (h, w, comps, hmax, vmax, mcus_x, mcus_y)
        elif marker in (0xC0, 0xC1, 0xC3) or 0xC5 <= marker <= 0xCF:
            raise ValueError(
                "decode_jpeg_progressive expects an SOF2 frame")
        elif marker == 0xDD:
            dri = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:
            if sof is None:
                raise ValueError("SOS before SOF2")
            ns = body[0]
            scomps = []
            for i in range(ns):
                cid = body[1 + 2 * i]
                scomps.append((cid, body[2 + 2 * i] >> 4,
                               body[2 + 2 * i] & 0xF))
            Ss, Se = body[1 + 2 * ns], body[2 + 2 * ns]
            Ah, Al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0xF
            data_end = _scan_end(payload, pos + 2 + size)
            br = _BitReader(payload[pos + 2 + size:data_end])
            if Ss == 0:
                if Se != 0:
                    raise ValueError("DC scan must have Se=0")
                _decode_dc_scan(br, scomps, geom, coefs, huff,
                                Ah, Al, interleaved=ns > 1,
                                dri=dri)
            else:
                if ns != 1:
                    raise ValueError("AC scans are single-component")
                cid, _, ac_id = scomps[0]
                bh, bw = geom["blocks"][cid]
                blocks = [coefs[cid][by, bx]
                          for by in range(bh) for bx in range(bw)]
                if Ah == 0:
                    _decode_ac_first(br, blocks, huff[(1, ac_id)],
                                     Ss, Se, Al, dri=dri)
                else:
                    _decode_ac_refine(br, blocks, huff[(1, ac_id)],
                                      Ss, Se, Al, dri=dri)
            pos = data_end
            continue
        pos += 2 + size
    if sof is None:
        raise ValueError("JPEG payload missing SOF2")
    h, w, comps, hmax, vmax, mcus_x, mcus_y = sof
    planes = []
    for cid, qid, sx, sy in comps:
        zz = coefs[cid] * quant[qid]              # dequantize
        BH, BW = zz.shape[0], zz.shape[1]
        F = np.zeros((BH, BW, 64), dtype=np.float64)
        F[:, :, _ZZ_FLAT] = zz                    # zigzag → natural
        F = F.reshape(BH, BW, 8, 8)
        plane = np.zeros((BH * 8, BW * 8), dtype=np.float64)
        for by in range(BH):
            for bx in range(BW):
                # same matmul order as the baseline _decode_block so
                # the two decoders are float-identical on identical
                # coefficients (einsum reassociates and can round a
                # .5 boundary differently)
                plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = \
                    _C.T @ F[by, bx] @ _C
        planes.append(plane)
    return _planes_to_pixels(planes, comps, h, w, hmax, vmax)


# ------------------------------------------------------------ encode


def _quantized_zz(plane: np.ndarray) -> np.ndarray:
    """(H, W) uint8 plane → (bh, bw, 64) int64 quantized zigzag
    coefficient blocks (edge-padded, level-shifted, Annex-K quant)."""
    h, w = plane.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    p = np.pad(plane.astype(np.float64),
               ((0, bh * 8 - h), (0, bw * 8 - w)),
               mode="edge") - 128.0
    out = np.zeros((bh, bw, 64), dtype=np.int64)
    for by in range(bh):
        for bx in range(bw):
            # same matmul order as the baseline _encode_block so a
            # coefficient sitting exactly on a rounding boundary
            # quantizes identically in both encoders
            F = _C @ p[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] @ _C.T
            q = np.round(F / STD_LUMA_QUANT).astype(np.int64)
            out[by, bx] = q[_ZZ[:, 0], _ZZ[:, 1]]
    return out


def _emit_rst(bw_, n: int):
    """Byte-align (1-fill) then the raw RSTn marker — markers are
    never byte-stuffed."""
    bw_.flush()
    bw_.out += bytes([0xFF, 0xD0 + (n & 7)])


def _emit_dc_first(bw_, zzs, Al, dc_codes, dri=0):
    """Interleaved (our encoder is 1×1-sampled, so MCU order is plain
    raster with components inner-most) DC-first scan at point
    transform Al."""
    bh, bwid = zzs[0].shape[0], zzs[0].shape[1]
    preds = [0] * len(zzs)
    mi = 0
    for by in range(bh):
        for bx in range(bwid):
            if dri and mi and mi % dri == 0:
                _emit_rst(bw_, mi // dri - 1)
                preds = [0] * len(zzs)
            mi += 1
            for ci, zz in enumerate(zzs):
                v = int(zz[by, bx, 0]) >> Al      # arithmetic shift
                s, bits = _magnitude(v - preds[ci])
                preds[ci] = v
                code, ln = dc_codes[s]
                bw_.write(code, ln)
                if s:
                    bw_.write(bits, s)


def _emit_dc_refine(bw_, zzs, Al, dri=0):
    bh, bwid = zzs[0].shape[0], zzs[0].shape[1]
    mi = 0
    for by in range(bh):
        for bx in range(bwid):
            if dri and mi and mi % dri == 0:
                _emit_rst(bw_, mi // dri - 1)
            mi += 1
            for zz in zzs:
                bw_.write((int(zz[by, bx, 0]) >> Al) & 1, 1)


def _flush_eobrun(bw_, ac_codes, eobrun: int, br_bits) -> int:
    """Emit a pending EOBn run (plus the correction bits buffered
    across the run's blocks, refinement scans only) and reset it."""
    if eobrun:
        r = eobrun.bit_length() - 1
        code, ln = ac_codes[r << 4]
        bw_.write(code, ln)
        if r:
            bw_.write(eobrun - (1 << r), r)
    for b in br_bits:
        bw_.write(b, 1)
    br_bits.clear()
    return 0


def _emit_ac_first(bw_, zz, Ss, Se, Al, ac_codes, dri=0):
    bh, bwid = zz.shape[0], zz.shape[1]
    eobrun, none_ = 0, []
    mi = 0
    for by in range(bh):
        for bx in range(bwid):
            if dri and mi and mi % dri == 0:
                # an EOB run cannot span a restart: flush, align, mark
                eobrun = _flush_eobrun(bw_, ac_codes, eobrun, none_)
                _emit_rst(bw_, mi // dri - 1)
            mi += 1
            blk = zz[by, bx]
            run = 0
            emitted = False
            for k in range(Ss, Se + 1):
                v = int(blk[k])
                t = (abs(v) >> Al) * (1 if v >= 0 else -1)
                if t == 0:
                    run += 1
                    continue
                if not emitted:
                    eobrun = _flush_eobrun(bw_, ac_codes, eobrun,
                                           none_)
                    emitted = True
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    bw_.write(code, ln)
                    run -= 16
                s, bits = _magnitude(t)
                code, ln = ac_codes[(run << 4) | s]
                bw_.write(code, ln)
                bw_.write(bits, s)
                run = 0
            if run:                   # trailing zeros join an EOB run
                eobrun += 1
                if eobrun == _EOBRUN_CAP:
                    eobrun = _flush_eobrun(bw_, ac_codes, eobrun,
                                           none_)
    _flush_eobrun(bw_, ac_codes, eobrun, none_)


def _emit_ac_refine(bw_, zz, Ss, Se, Al, ac_codes, dri=0):
    """T.81 G.7 / libjpeg encode_mcu_AC_refine: (run, 1) codes whose
    runs count zero-history positions only, correction bits buffered
    and flushed after the next emitted code, ZRLs not emitted past
    the last newly-significant coefficient, and EOBs accumulated
    ACROSS blocks (the run's correction bits stay buffered until the
    EOBn flush — the decoder's run-tail consumes them in block then
    position order)."""
    bh, bwid = zz.shape[0], zz.shape[1]
    eobrun, pend = 0, []              # run + its buffered corrections
    mi = 0
    for by in range(bh):
        for bx in range(bwid):
            if dri and mi and mi % dri == 0:
                eobrun = _flush_eobrun(bw_, ac_codes, eobrun, pend)
                _emit_rst(bw_, mi // dri - 1)
            mi += 1
            blk = zz[by, bx]
            absv = [abs(int(blk[k])) >> Al
                    for k in range(Ss, Se + 1)]
            eob = 0                   # band-relative: last new ±1
            for i, t in enumerate(absv):
                if t == 1:
                    eob = i + 1
            if eob == 0:              # no new coefficients: EOB block
                eobrun += 1
                pend.extend(t & 1 for t in absv if t > 1)
                if eobrun == _EOBRUN_CAP:
                    eobrun = _flush_eobrun(bw_, ac_codes, eobrun,
                                           pend)
                continue
            eobrun = _flush_eobrun(bw_, ac_codes, eobrun, pend)
            r, br_bits = 0, []
            for i, t in enumerate(absv):
                if t == 0:
                    r += 1
                    continue
                while r > 15 and i < eob:
                    code, ln = ac_codes[0xF0]
                    bw_.write(code, ln)
                    r -= 16
                    for b in br_bits:
                        bw_.write(b, 1)
                    br_bits = []
                if t > 1:             # history nonzero: correction
                    br_bits.append(t & 1)
                    continue
                code, ln = ac_codes[(r << 4) | 1]
                bw_.write(code, ln)
                r = 0
                bw_.write(1 if int(blk[Ss + i]) >= 0 else 0, 1)
                for b in br_bits:
                    bw_.write(b, 1)
                br_bits = []
            if r or br_bits:          # leftover joins a new EOB run
                eobrun += 1
                pend.extend(br_bits)
    _flush_eobrun(bw_, ac_codes, eobrun, pend)


def _seg(marker: bytes, body: bytes) -> bytes:
    return marker + struct.pack(">H", 2 + len(body)) + body


def encode_jpeg_progressive(planes, h: int, w: int,
                            restart_every: int = 0) -> bytes:
    """Progressive encoder for 1×1-sampled planes (grayscale or
    YCbCr 4:4:4) with a libjpeg-style scan script: interleaved DC at
    Al=1, per-component AC bands 1-5 then 6-63 at Al=1, DC
    refinement, then full-band AC refinements to Al=0 — every
    progressive decode path exercised in one file."""
    zzs = [_quantized_zz(p) for p in planes]
    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(_PROG_AC_BITS, _PROG_AC_VALS)
    nc = len(planes)
    zz_quant = STD_LUMA_QUANT[_ZZ[:, 0], _ZZ[:, 1]]
    out = bytearray(b"\xff\xd8")
    out += _seg(b"\xff\xdb",
                b"\x00" + bytes(int(x) for x in zz_quant))
    comp_spec = b"".join(bytes([cid + 1, 0x11, 0x00])
                         for cid in range(nc))
    out += _seg(b"\xff\xc2", struct.pack(">BHHB", 8, h, w, nc)
                + comp_spec)
    out += _seg(b"\xff\xc4",
                b"\x00" + bytes(DC_BITS) + bytes(DC_VALS)
                + b"\x10" + bytes(_PROG_AC_BITS)
                + bytes(_PROG_AC_VALS))
    if restart_every:
        out += _seg(b"\xff\xdd", struct.pack(">H", restart_every))

    def sos(comp_ids, Ss, Se, Ah, Al, emit):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid + 1, 0x00])
        body += bytes([Ss, Se, (Ah << 4) | Al])
        bw_ = _BitWriter()
        emit(bw_)
        bw_.flush()
        return _seg(b"\xff\xda", body) + bytes(bw_.out)

    ri = restart_every
    # 1. interleaved DC first at Al=1
    out += sos(list(range(nc)), 0, 0, 0, 1,
               lambda b: _emit_dc_first(b, zzs, 1, dc_codes, dri=ri))
    # 2-3. per-component AC bands at Al=1
    for band in ((1, 5), (6, 63)):
        for ci in range(nc):
            out += sos([ci], band[0], band[1], 0, 1,
                       lambda b, ci=ci, bd=band: _emit_ac_first(
                           b, zzs[ci], bd[0], bd[1], 1, ac_codes,
                           dri=ri))
    # 4. DC refinement to Al=0
    out += sos(list(range(nc)), 0, 0, 1, 0,
               lambda b: _emit_dc_refine(b, zzs, 0, dri=ri))
    # 5. per-component full-band AC refinement to Al=0
    for ci in range(nc):
        out += sos([ci], 1, 63, 1, 0,
                   lambda b, ci=ci: _emit_ac_refine(
                       b, zzs[ci], 1, 63, 0, ac_codes, dri=ri))
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_progressive_gray(pixels) -> bytes:
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    return encode_jpeg_progressive([px], h, w)


def encode_jpeg_progressive_rgb(pixels) -> bytes:
    from data_ingestion_challenge_spark.operators.jpeg_codec import (
        _rgb_to_ycbcr_planes,
    )
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[:2]
    return encode_jpeg_progressive(_rgb_to_ycbcr_planes(px), h, w)