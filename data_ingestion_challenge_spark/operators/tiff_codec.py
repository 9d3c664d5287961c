"""Baseline TIFF 6.0 codec + EXIF (APP1) metadata parser — pure
numpy + stdlib, extending the native media-decode surface to the
scanner/camera intake formats: strip-based grayscale and RGB TIFF in
BOTH byte orders, Compression 1 (none), 32773 (PackBits) and 5 (TIFF
LZW — MSB-first bit packing with the early-change code-width rule,
i.e. NOT the GIF LZW variant already in multimodal.py), plus the
horizontal-differencing Predictor (tag 317) LZW pairs with.  EXIF is
structurally an embedded little/big-endian TIFF after the
``Exif\\0\\0`` APP1 preamble, so the same IFD walker extracts
orientation / capture timestamp / camera make from JPEGs — the
metadata a real media-inventory pipeline keys on.

Scope is honest: chunky (PlanarConfiguration 1) 8-bit samples, 1 or
3 samples per pixel, strip-organized files — the shapes scanners and
exporters actually emit; tiles, planar configuration 2, 16-bit
samples, and the JPEG-in-TIFF compressions raise typed
NotImplementedError (PIL territory).

Everything is driven by the file's own IFD tags; the decoder never
assumes this encoder's layout, so any conforming baseline file in
these shapes decodes.  TIFF is LOSSLESS in every supported
compression, so decoded pixels equal the synthesized image exactly —
the closed-form oracle hook the synth witnesses use.
"""

from __future__ import annotations

import struct

import numpy as np

# Tag ids (TIFF 6.0 / EXIF 2.3)
_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_ORIENTATION = 274
_TAG_SAMPLES = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317
_TAG_COLORMAP = 320
_TAG_MAKE = 271
_TAG_MODEL = 272
_TAG_DATETIME = 306
_TAG_EXIF_IFD = 34665
_TAG_DT_ORIGINAL = 36867

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2,
              9: 4, 10: 8, 16: 8, 17: 8, 18: 8}


def _read_ifd(buf: bytes, off: int, bo: str,
              big: bool = False) -> tuple[dict, int]:
    """One IFD at ``off``: {tag: list-of-values} plus the offset of
    the next IFD (0 = none).  Values are resolved through the
    inline-vs-offset rule.  ``big`` selects the BigTIFF layout
    (8-byte entry counts / offsets / inline capacity, 20-byte
    entries, the LONG8/SLONG8/IFD8 types)."""
    cnt_fmt, cnt_sz = ("Q", 8) if big else ("H", 2)
    off_fmt, stride, inline = (("Q", 20, 8) if big
                               else ("I", 12, 4))
    if off + cnt_sz > len(buf):
        raise ValueError("TIFF IFD offset out of range")
    n = struct.unpack_from(bo + cnt_fmt, buf, off)[0]
    entries = {}
    pos = off + cnt_sz
    if pos + stride * n + (8 if big else 4) > len(buf):
        raise ValueError("TIFF IFD runs off the payload")
    for _ in range(n):
        if big:
            tag, typ = struct.unpack_from(bo + "HH", buf, pos)
            cnt = struct.unpack_from(bo + "Q", buf, pos + 4)[0]
        else:
            tag, typ, cnt = struct.unpack_from(bo + "HHI", buf, pos)
        size = _TYPE_SIZE.get(typ, 0) * cnt
        if size == 0:
            pos += stride
            continue
        vfield = pos + (12 if big else 8)
        if size <= inline:
            voff = vfield
        else:
            voff = struct.unpack_from(bo + off_fmt, buf, vfield)[0]
            if voff + size > len(buf):
                raise ValueError(f"TIFF tag {tag} value out of range")
        if typ == 2:                       # ASCII (NUL-terminated)
            raw = buf[voff:voff + cnt]
            entries[tag] = raw.split(b"\x00", 1)[0].decode(
                "ascii", "replace")
        elif typ in (1, 6, 7):             # BYTE-ish
            entries[tag] = list(buf[voff:voff + cnt])
        elif typ in (3, 8):                # SHORT
            entries[tag] = list(struct.unpack_from(
                bo + f"{cnt}{'H' if typ == 3 else 'h'}", buf, voff))
        elif typ in (4, 9):                # LONG
            entries[tag] = list(struct.unpack_from(
                bo + f"{cnt}{'I' if typ == 4 else 'i'}", buf, voff))
        elif typ in (16, 17, 18):          # LONG8/SLONG8/IFD8
            entries[tag] = list(struct.unpack_from(
                bo + f"{cnt}{'q' if typ == 17 else 'Q'}", buf, voff))
        elif typ in (5, 10):               # RATIONAL: (num, den)
            flat = struct.unpack_from(
                bo + f"{2 * cnt}{'I' if typ == 5 else 'i'}",
                buf, voff)
            entries[tag] = [(flat[2 * i], flat[2 * i + 1])
                            for i in range(cnt)]
        pos += stride
    nxt = struct.unpack_from(bo + off_fmt, buf, pos)[0]
    return entries, nxt


def _tiff_layout(buf: bytes) -> tuple[str, bool, int]:
    """(byte order, is_bigtiff, first IFD offset).  Classic headers
    carry version 42 and a 4-byte IFD pointer at offset 4; BigTIFF
    (version 43) declares an 8-byte offset size and parks a 64-bit
    pointer at offset 8."""
    if buf[:4] == b"II*\x00":
        if len(buf) < 8:
            raise ValueError("TIFF header truncated")
        return "<", False, struct.unpack_from("<I", buf, 4)[0]
    if buf[:4] == b"MM\x00*":
        if len(buf) < 8:
            raise ValueError("TIFF header truncated")
        return ">", False, struct.unpack_from(">I", buf, 4)[0]
    for bo, magic in (("<", b"II"), (">", b"MM")):
        if (len(buf) >= 4 and buf[:2] == magic
                and struct.unpack_from(bo + "H", buf, 2)[0] == 43):
            if len(buf) < 16:
                raise ValueError("BigTIFF header truncated")
            osz, pad = struct.unpack_from(bo + "HH", buf, 4)
            if osz != 8 or pad != 0:
                raise ValueError("malformed BigTIFF header")
            return bo, True, struct.unpack_from(bo + "Q", buf, 8)[0]
    raise ValueError("not a TIFF payload")


def _tiff_byte_order(buf: bytes) -> str:
    """Classic-TIFF byte-order probe (EXIF APP1 is always classic)."""
    if buf[:4] == b"II*\x00":
        return "<"
    if buf[:4] == b"MM\x00*":
        return ">"
    raise ValueError("not a TIFF payload")


def _packbits_decode(data: bytes, expected: int) -> bytes:
    """Apple PackBits RLE (TIFF 6.0 §9)."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:                        # literal run of n+1
            out += data[i:i + n + 1]
            i += n + 1
        elif n > 128:                      # replicate next 257-n times
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # n == 128: no-op
    if len(out) < expected:
        raise ValueError("PackBits strip truncated")
    return bytes(out[:expected])


def _packbits_encode(data: bytes) -> bytes:
    """PackBits encoder: replicate runs >= 3, literals otherwise."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        j = i
        while (j + 1 < n and data[j + 1] == data[j]
               and j - i < 127):
            j += 1
        if j - i >= 2:                     # run of (j-i+1) equal bytes
            out += bytes([257 - (j - i + 1), data[i]])
            i = j + 1
            continue
        # literal: extend until a 3-run starts, 128 bytes, or the end
        j = i + 1
        while j < n and j - i < 128:
            if (j + 2 < n and data[j + 1] == data[j]
                    and data[j + 2] == data[j]):
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def _lzw_decode_tiff(data: bytes, expected: int) -> bytes:
    """TIFF LZW (TIFF 6.0 §13): MSB-first bit packing, Clear=256,
    EOI=257, 9-bit start, and the EARLY-CHANGE rule — the code width
    bumps when the NEXT table entry would overflow the current width
    (one code earlier than the GIF variant)."""
    out = bytearray()
    acc = nbits = pos = 0

    def _read(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return 257                 # treat truncation as EOI
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        v = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        return v

    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    while len(out) < expected:
        code = _read(width)
        if code == 256:                    # Clear
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width, prev = 9, None
            continue
        if code == 257:                    # EOI
            break
        if prev is None and not table:
            # spec-legal streams lead with Clear; tolerate its absence
            table = [bytes([i]) for i in range(256)] + [b"", b""]
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]        # KwKwK
        else:
            raise ValueError("invalid TIFF LZW code")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        # early change: widen when the next ADDED code would not fit
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1
    if len(out) < expected:
        raise ValueError("TIFF LZW strip truncated")
    return bytes(out[:expected])


def _lzw_encode_tiff(data: bytes) -> bytes:
    """TIFF LZW encoder (matching the early-change decoder; emits
    Clear up front and at the 12-bit table ceiling, EOI at the end)."""
    out = bytearray()
    acc = nbits = 0

    def _write(code: int, width: int):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    def _flush():
        nonlocal acc, nbits
        if nbits:
            out.append((acc << (8 - nbits)) & 0xFF)
            acc = nbits = 0

    table = {bytes([i]): i for i in range(256)}
    nxt = 258
    width = 9
    _write(256, width)                     # leading Clear
    w = b""
    for b in data:
        wb = w + bytes([b])
        if wb in table:
            w = wb
            continue
        _write(table[w], width)
        table[wb] = nxt
        nxt += 1
        # early-change bookkeeping: mid-stream the encoder table runs
        # ONE entry ahead of the decoder's (the decoder learns an
        # entry only on the NEXT code), so the decoder's bump at
        # free-slot 2**w - 1 lands here at free-slot 2**w
        if nxt >= (1 << width) and width < 12:
            width += 1
        if nxt >= 4094:                    # reset before overflow
            _write(256, width)
            table = {bytes([i]): i for i in range(256)}
            nxt, width = 258, 9
        w = bytes([b])
    if w:
        _write(table[w], width)
        # before EOI the tables are LEVEL (no entry follows the final
        # code), so the decoder's pre-EOI bump lands at 2**w - 1 here
        if nxt >= (1 << width) - 1 and width < 12:
            width += 1
    _write(257, width)                     # EOI
    _flush()
    return bytes(out)


def encode_tiff(pixels, compression: int = 1,
                byte_order: str = "<",
                rows_per_strip: int = 8,
                predictor: int = 1,
                bigtiff: bool = False) -> bytes:
    """Strip-organized baseline TIFF: HxW grayscale or HxWx3 RGB
    uint8 in, conforming bytes out.  ``compression``: 1 none,
    32773 PackBits, 5 LZW (optionally with ``predictor=2``
    horizontal differencing).  ``byte_order``: '<' II, '>' MM.
    ``bigtiff`` emits the version-43 layout (16-byte header,
    8-byte IFD counts/offsets, 20-byte entries)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, spp = px.shape
    if spp not in (1, 3):
        raise ValueError("encode_tiff takes 1 or 3 samples per pixel")
    if compression not in (1, 5, 32773):
        raise ValueError(f"unsupported TIFF compression {compression}")
    if predictor not in (1, 2):
        raise ValueError(f"unsupported TIFF predictor {predictor}")
    if predictor == 2 and compression == 1:
        raise ValueError("predictor requires a compressed strip")
    bo = byte_order
    if bo not in ("<", ">"):
        raise ValueError("byte_order must be '<' or '>'")
    strips = []
    for r0 in range(0, h, rows_per_strip):
        rows = px[r0:r0 + rows_per_strip]
        if predictor == 2:
            rows = rows.astype(np.int16)
            rows[:, 1:, :] -= rows[:, :-1, :]
            rows = rows.astype(np.uint8)
        raw = rows.tobytes()
        if compression == 32773:
            strips.append(_packbits_encode(raw))
        elif compression == 5:
            strips.append(_lzw_encode_tiff(raw))
        else:
            strips.append(raw)
    n_strips = len(strips)

    # layout: header | pixel strips | IFD | out-of-line values
    if bigtiff:
        header = ((b"II" if bo == "<" else b"MM")
                  + struct.pack(bo + "HHH", 43, 8, 0))
        data_off = 16
    else:
        header = (b"II*\x00" if bo == "<" else b"MM\x00*")
        data_off = 8
    offsets, counts = [], []
    blob = bytearray()
    for s in strips:
        offsets.append(data_off + len(blob))
        counts.append(len(s))
        blob += s
    ifd_off = data_off + len(blob)

    tags = [
        (_TAG_WIDTH, 3, [w]),
        (_TAG_HEIGHT, 3, [h]),
        (_TAG_BITS, 3, [8] * spp),
        (_TAG_COMPRESSION, 3, [compression]),
        (_TAG_PHOTOMETRIC, 3, [1 if spp == 1 else 2]),
        (_TAG_STRIP_OFFSETS, 4, offsets),
        (_TAG_SAMPLES, 3, [spp]),
        (_TAG_ROWS_PER_STRIP, 3, [rows_per_strip]),
        (_TAG_STRIP_COUNTS, 4, counts),
        (_TAG_PLANAR, 3, [1]),
    ]
    if predictor == 2:
        tags.append((_TAG_PREDICTOR, 3, [2]))
    tags.sort()
    cnt_sz, stride, inline, off_fmt = \
        (8, 20, 8, "Q") if bigtiff else (2, 12, 4, "I")
    entry_bytes = bytearray()
    overflow = bytearray()
    overflow_base = (ifd_off + cnt_sz + stride * len(tags)
                     + _TYPE_SIZE[16 if bigtiff else 4])
    for tag, typ, vals in tags:
        fmt = "H" if typ == 3 else "I"
        size = _TYPE_SIZE[typ] * len(vals)
        packed = struct.pack(bo + fmt * len(vals), *vals)
        if bigtiff:
            entry_bytes += struct.pack(bo + "HHQ", tag, typ,
                                       len(vals))
        else:
            entry_bytes += struct.pack(bo + "HHI", tag, typ,
                                       len(vals))
        if size <= inline:
            entry_bytes += packed + b"\x00" * (inline - size)
        else:
            entry_bytes += struct.pack(
                bo + off_fmt, overflow_base + len(overflow))
            overflow += packed
    ifd = (struct.pack(bo + ("Q" if bigtiff else "H"), len(tags))
           + bytes(entry_bytes)
           + struct.pack(bo + off_fmt, 0))
    return (header + struct.pack(bo + off_fmt, ifd_off)
            + bytes(blob) + ifd + bytes(overflow))


def decode_tiff_pixels(payload: bytes, page: int = 0) -> np.ndarray:
    """Decode a baseline strip-organized TIFF to uint8 pixels (HxW
    grayscale or HxWx3 RGB), honoring byte order, compression
    (none / PackBits / LZW), the horizontal predictor, and
    PhotometricInterpretation — 0 (WhiteIsZero, the fax/scanner
    default) inverts, 3 (palette) maps indices through the ColorMap
    tag to RGB.  ``page`` walks the multi-page IFD chain (scanned
    documents); past-the-end raises ValueError.  BigTIFF (version
    43, 8-byte offsets) decodes through the same path.  Tiled,
    planar, >8-bit, and JPEG-compressed TIFFs raise typed
    NotImplementedError."""
    bo, big, off = _tiff_layout(payload)
    seen: set = set()
    for _skip in range(page):
        if off in seen:
            raise ValueError("TIFF IFD chain cycles")
        if not off:
            raise ValueError(f"TIFF has no page {page}")
        seen.add(off)
        # light walk: skipped pages need only the next pointer
        off = _next_ifd(payload, off, bo, big)
    if not off:
        raise ValueError(f"TIFF has no page {page}")
    tags, _ = _read_ifd(payload, off, bo, big)
    if 322 in tags or 324 in tags:
        raise NotImplementedError("tiled TIFF needs PIL")
    w = tags[_TAG_WIDTH][0]
    h = tags[_TAG_HEIGHT][0]
    spp = tags.get(_TAG_SAMPLES, [1])[0]
    bits = tags.get(_TAG_BITS, [8] * spp)
    comp = tags.get(_TAG_COMPRESSION, [1])[0]
    planar = tags.get(_TAG_PLANAR, [1])[0]
    pred = tags.get(_TAG_PREDICTOR, [1])[0]
    photometric = tags.get(_TAG_PHOTOMETRIC,
                           [1 if spp == 1 else 2])[0]
    if any(b != 8 for b in bits):
        raise NotImplementedError(f"{bits}-bit TIFF needs PIL")
    if spp not in (1, 3):
        raise NotImplementedError(
            f"{spp}-sample TIFF needs PIL")
    if planar != 1:
        raise NotImplementedError("planar TIFF needs PIL")
    if comp not in (1, 5, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} needs PIL")
    if pred not in (1, 2):
        raise NotImplementedError(f"TIFF predictor {pred} needs PIL")
    if photometric not in (0, 1, 2, 3):
        raise NotImplementedError(
            f"TIFF photometric {photometric} needs PIL")
    if (photometric == 2) != (spp == 3) and photometric != 3:
        raise ValueError(
            f"TIFF photometric {photometric} with {spp} samples")
    if photometric == 3 and spp != 1:
        raise ValueError("palette TIFF must be single-sample")
    offsets = tags[_TAG_STRIP_OFFSETS]
    counts = tags.get(_TAG_STRIP_COUNTS)
    if counts is None:
        raise ValueError("TIFF missing StripByteCounts")
    rps = tags.get(_TAG_ROWS_PER_STRIP, [h])[0]
    rows = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        n_rows = min(rps, h - si * rps)
        if n_rows <= 0:
            break
        expected = n_rows * w * spp
        raw = payload[off:off + cnt]
        if len(raw) < cnt:
            raise ValueError("TIFF strip out of range")
        if comp == 32773:
            raw = _packbits_decode(raw, expected)
        elif comp == 5:
            raw = _lzw_decode_tiff(raw, expected)
        elif len(raw) < expected:
            raise ValueError("TIFF strip truncated")
        arr = np.frombuffer(raw[:expected], dtype=np.uint8) \
            .reshape(n_rows, w, spp)
        if pred == 2:
            arr = np.cumsum(arr.astype(np.int64), axis=1) \
                .astype(np.uint8)
        rows.append(arr)
    if not rows:
        raise ValueError("TIFF holds no strips")
    px = np.concatenate(rows, axis=0)
    if px.shape[0] != h:
        raise ValueError("TIFF strips do not cover the image")
    if photometric == 0:                   # WhiteIsZero: invert
        px = (255 - px.astype(np.int64)).astype(np.uint8)
    elif photometric == 3:                 # palette via ColorMap
        cmap = tags.get(_TAG_COLORMAP)
        if cmap is None or len(cmap) != 3 * 256:
            raise ValueError("palette TIFF missing 8-bit ColorMap")
        # ColorMap is 16-bit R|G|B blocks; fold to 8-bit channels
        table = (np.asarray(cmap, dtype=np.int64)
                 .reshape(3, 256).T >> 8).astype(np.uint8)
        return table[px[:, :, 0]]
    return px[:, :, 0] if spp == 1 else px


def _next_ifd(payload: bytes, off: int, bo: str,
              big: bool) -> int:
    """Next-IFD pointer of the IFD at ``off`` WITHOUT resolving tag
    values — the light walk chain counting and page skipping need
    (read the entry count, hop over the entries, read the
    pointer)."""
    cnt_fmt, cnt_sz = ("Q", 8) if big else ("H", 2)
    off_fmt, stride = ("Q", 20) if big else ("I", 12)
    ptr_sz = 8 if big else 4
    if off + cnt_sz > len(payload):
        raise ValueError("TIFF IFD offset out of range")
    n = struct.unpack_from(bo + cnt_fmt, payload, off)[0]
    pos = off + cnt_sz + stride * n
    if pos + ptr_sz > len(payload):
        raise ValueError("TIFF IFD runs off the payload")
    return struct.unpack_from(bo + off_fmt, payload, pos)[0]


def _count_chain(payload: bytes, off: int, bo: str,
                 seen: set, big: bool = False) -> int:
    """Pages in the IFD chain starting at ``off`` (0 = end),
    cycle-guarded; ``seen`` carries already-visited offsets."""
    pages = 0
    while off:
        if off in seen:
            raise ValueError("TIFF IFD chain cycles")
        seen.add(off)
        off = _next_ifd(payload, off, bo, big)
        pages += 1
    return pages


def count_tiff_pages(payload: bytes) -> int:
    """Walk the IFD chain (multi-page TIFF — scanned-document
    convention): number of linked IFDs, cycle-guarded."""
    bo, big, off = _tiff_layout(payload)
    return _count_chain(payload, off, bo, set(), big)


def decode_tiff(payload: bytes) -> dict:
    """Structure-level TIFF probe in the decode_media dict shape —
    header-bounded like the JPEG/GIF structure parses (an intake
    audit over a 100 TB crawl must not pay a full strip decode per
    payload): dims/channels from page 0's IFD tags, n_frames from
    the IFD chain (page 0's already-parsed next pointer seeds the
    walk — one IFD parse per page, not two).  Garbage tag values
    (zero / absurd dims, bad channel counts) raise ValueError so
    decode_media classifies the payload as opaque bytes instead of
    poisoning the batch's typed columns.  Pixel decode is
    decode_tiff_pixels; a palette page reports channels=3 — what the
    pixel decode actually returns after the ColorMap mapping."""
    bo, big, first_ifd = _tiff_layout(payload)
    tags, nxt = _read_ifd(payload, first_ifd, bo, big)
    if _TAG_WIDTH not in tags or _TAG_HEIGHT not in tags:
        raise ValueError("TIFF IFD missing image dimensions")
    w, h = int(tags[_TAG_WIDTH][0]), int(tags[_TAG_HEIGHT][0])
    spp = int(tags.get(_TAG_SAMPLES, [1])[0])
    photometric = tags.get(_TAG_PHOTOMETRIC,
                           [1 if spp == 1 else 2])[0]
    if not (0 < w <= 0x7FFFFFFF and 0 < h <= 0x7FFFFFFF):
        raise ValueError(f"TIFF dimensions out of range: {w}x{h}")
    if not 1 <= spp <= 16:
        raise ValueError(f"TIFF SamplesPerPixel out of range: {spp}")
    return {"mime": "image/tiff",
            "n_frames": 1 + _count_chain(payload, nxt, bo,
                                         {first_ifd}, big),
            "rate": None,
            "channels": 3 if photometric == 3 else spp,
            "width": w, "height": h, "pcm_rms": None}


# --------------------------------------------------------------- #
# EXIF: the APP1-embedded TIFF inside a JPEG.                       #
# --------------------------------------------------------------- #

def parse_exif(payload: bytes) -> dict:
    """Extract the intake-relevant EXIF fields from a JPEG's APP1
    segment: orientation, camera make/model, capture timestamps.
    Returns {} when the JPEG carries no EXIF APP1; raises ValueError
    on a malformed one (truncated IFD, bad byte-order mark) — the
    caller decides whether malformed metadata quarantines the doc."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    app1 = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            break
        # T.81 B.1.1.2 allows 0xFF fill bytes before a marker code —
        # skip them like the pixel decoders do
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(payload):
            break
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xDA, 0xD9):         # entropy data: stop
            break
        size = struct.unpack_from(">H", payload, pos + 2)[0]
        if marker == 0xE1 and payload[pos + 4:pos + 10] == b"Exif\x00\x00":
            app1 = payload[pos + 10:pos + 2 + size]
            break
        pos += 2 + size
    if app1 is None:
        return {}
    try:
        bo = _tiff_byte_order(app1)
        ifd0_off = struct.unpack_from(bo + "I", app1, 4)[0]
        ifd0, _ = _read_ifd(app1, ifd0_off, bo)
    except struct.error as exc:   # truncated header/IFD
        raise ValueError(f"malformed EXIF APP1: {exc}") from exc
    out = {}
    if _TAG_ORIENTATION in ifd0:
        out["orientation"] = int(ifd0[_TAG_ORIENTATION][0])
    if _TAG_MAKE in ifd0:
        out["make"] = ifd0[_TAG_MAKE]
    if _TAG_MODEL in ifd0:
        out["model"] = ifd0[_TAG_MODEL]
    if _TAG_DATETIME in ifd0:
        out["datetime"] = ifd0[_TAG_DATETIME]
    if _TAG_EXIF_IFD in ifd0:
        sub, _ = _read_ifd(app1, ifd0[_TAG_EXIF_IFD][0], bo)
        if _TAG_DT_ORIGINAL in sub:
            out["datetime_original"] = sub[_TAG_DT_ORIGINAL]
    return out


def build_exif_app1(orientation: int = 1, make: str = "",
                    model: str = "", datetime_str: str = "",
                    byte_order: str = "<") -> bytes:
    """A minimal conforming EXIF APP1 segment (for tests and the
    synth witnesses): IFD0 with Orientation / Make / Model /
    DateTime.  Returns the full FFE1 segment bytes ready to splice
    after a JPEG SOI."""
    bo = byte_order
    tags = [(_TAG_ORIENTATION, 3, struct.pack(bo + "H", orientation)
             + b"\x00\x00")]
    ascii_tags = [(t, s) for t, s in
                  ((_TAG_MAKE, make), (_TAG_MODEL, model),
                   (_TAG_DATETIME, datetime_str)) if s]
    n = len(tags) + len(ascii_tags)
    ifd0_off = 8
    overflow_base = ifd0_off + 2 + 12 * n + 4
    entries = []
    overflow = bytearray()
    for tag, typ, packed4 in tags:
        entries.append((tag, typ, 1, packed4))
    for tag, s in ascii_tags:
        raw = s.encode("ascii") + b"\x00"
        if len(raw) <= 4:
            entries.append((tag, 2, len(raw),
                            raw + b"\x00" * (4 - len(raw))))
        else:
            entries.append((tag, 2, len(raw), struct.pack(
                bo + "I", overflow_base + len(overflow))))
            overflow += raw
    entries.sort()
    body = bytearray()
    body += (b"II*\x00" if bo == "<" else b"MM\x00*")
    body += struct.pack(bo + "I", ifd0_off)
    body += struct.pack(bo + "H", n)
    for tag, typ, cnt, val4 in entries:
        body += struct.pack(bo + "HHI", tag, typ, cnt) + val4
    body += struct.pack(bo + "I", 0)
    body += overflow
    seg = b"Exif\x00\x00" + bytes(body)
    return b"\xff\xe1" + struct.pack(">H", 2 + len(seg)) + seg
