"""Pure stdlib+numpy baseline JPEG codec — the third always-available
real decode tier next to the BMP and PNG readers
(operators/multimodal.py). jpg/jpeg are on the reference's extension
list (ref: app/Commands.java:74, decoded there via ImageIO,
core/ImageLoader.java:7-12); this container ships no codec libraries,
so the reader is implemented from the public JPEG spec (ITU-T T.81 /
ISO 10918-1, baseline sequential DCT process).

Decoder (``decode_jpeg``): baseline sequential (SOF0/SOF1), 8-bit,
grayscale or YCbCr with ANY sampling factors (generic h/v up-sample),
canonical Huffman reconstruction from the file's DHT segments, restart
markers, 0xFF00 byte-unstuffing. Returns (width, height, gray float64)
where gray is the luminance plane — for JFIF YCbCr the Y component IS
BT.601 luma, so no color conversion is needed (chroma blocks are still
entropy-decoded to keep the bitstream in sync, their IDCT is skipped).
Progressive (SOF2), arithmetic coding and 12-bit precision raise
ValueError — per-row error isolation is the caller's job, same
contract as decode_bmp/decode_png.

Encoder (``encode_jpeg``): grayscale baseline writer used by fixtures
and tests — FDCT, flat-16 quantization table scaled by the IJG quality
curve (quality=100 -> all-ones table, near-lossless round-trip bounded
by DCT float rounding), custom VALID canonical Huffman tables (written
into DHT, so any spec-conforming decoder reads them; optimality is a
non-goal). The encoder is deliberately simple: its job is to produce
real, spec-conforming JPEG payloads in-container, not to compete with
libjpeg.
"""

from __future__ import annotations

import struct

import numpy as np

#: JPEG zig-zag scan order (T.81 Figure 5), index -> (row, col) flat pos
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix: B @ block @ B.T is the FDCT,
    B.T @ coef @ B the IDCT."""
    n = np.arange(8, dtype=np.float64)
    basis = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16)
    basis[0] *= np.sqrt(1.0 / 8.0)
    basis[1:] *= np.sqrt(2.0 / 8.0)
    return basis


_B = _dct_matrix()


def _build_decode_table(bits: list[int], vals: bytes) -> dict:
    """Canonical Huffman reconstruction (T.81 Annex C): (length, code)
    -> symbol."""
    table = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over an already-unstuffed entropy segment."""

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.buf):
            raise ValueError("truncated JPEG entropy stream")
        b = (self.buf[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the raw `size`-bit magnitude to its
    signed value."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def decode_jpeg(data: bytes) -> tuple[int, int, np.ndarray]:
    """Baseline-sequential JPEG -> (width, height, luminance float64).
    Raises ValueError on anything that is not a well-formed supported
    JPEG — including structurally-lying payloads whose segment lengths
    would otherwise surface as struct.error/IndexError deep in the
    parser (normalized here so the per-row isolation contract is one
    exception type; pinned by tests/test_codec_fuzz.py)."""
    try:
        return _decode_jpeg_impl(data)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"malformed JPEG structure: {exc}") from exc


def _decode_jpeg_impl(data: bytes) -> tuple[int, int, np.ndarray]:
    if data is None or len(data) < 4 or bytes(data[:2]) != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    data = bytes(data)
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    frame = None
    restart_interval = 0
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated JPEG (no SOS)")
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1  # FF fill bytes before a marker are legal
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD8:  # stray SOI
            continue
        (seg_len,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    qt[tq] = np.frombuffer(
                        seg, np.uint8, 64, p
                    ).astype(np.float64)
                    p += 64
                elif pq == 1:
                    qt[tq] = np.frombuffer(
                        seg, ">u2", 64, p
                    ).astype(np.float64)
                    p += 128
                else:
                    raise ValueError(f"bad DQT precision {pq}")
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline sequential
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (SOF marker 0xFF{marker:02X}); "
                "only baseline sequential is supported"
            )
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = seg[p + 17 : p + 17 + n]
                huff[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            break
        pos += seg_len
    if frame is None:
        raise ValueError("JPEG SOS before SOF")
    ns = seg[0]
    scan = []
    for i in range(ns):
        cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
        comp = next((c for c in frame["comps"] if c["id"] == cs), None)
        if comp is None:
            raise ValueError("JPEG scan references unknown component")
        scan.append({**comp, "dc": tt >> 4, "ac": tt & 15})
    if len(scan) != len(frame["comps"]):
        raise ValueError("non-interleaved JPEG scans unsupported")
    pos += seg_len

    # split the entropy stream into restart segments, unstuffing FF00
    segments, cur = [], bytearray()
    while pos < len(data):
        b = data[pos]
        if b == 0xFF:
            nxt = data[pos + 1] if pos + 1 < len(data) else None
            if nxt == 0x00:
                cur.append(0xFF)
                pos += 2
                continue
            if nxt is not None and 0xD0 <= nxt <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                pos += 2
                continue
            break  # EOI or next marker
        cur.append(b)
        pos += 1
    segments.append(bytes(cur))

    if len(scan) == 1:
        # T.81 A.2.2: a single-component scan is NON-interleaved — the
        # MCU is one data unit and the component's blocks are coded in
        # raster order, regardless of its declared sampling factors
        # (e.g. jpegtran -grayscale keeps the Y factors at 2x2). Treat
        # it as 1x1 so the geometry below degenerates to that raster.
        scan[0] = {**scan[0], "h": 1, "v": 1}
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    if hmax < 1 or vmax < 1 or any(
        c["h"] < 1 or c["v"] < 1 for c in scan
    ):
        raise ValueError("bad JPEG sampling factors")
    w, h = frame["w"], frame["h"]
    if w == 0 or h == 0:
        raise ValueError("bad JPEG dimensions")
    if w * h > (1 << 26):
        # fingerprint-decode bound (a 64M-pixel float64 luma plane is
        # 512 MB): a tiny crafted SOF declaring 65535x65535 must fail
        # as a ValueError, not as an executor-killing MemoryError
        # (decode_bmp has the same declared-vs-actual guard shape)
        raise ValueError(f"JPEG dimensions {w}x{h} exceed decode bound")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    blocks_total = mcus_x * mcus_y * sum(c["h"] * c["v"] for c in scan)
    entropy_bytes = sum(len(s) for s in segments)
    # every coded block costs >= 2 bits (shortest DC code + EOB);
    # a payload declaring far more blocks than its entropy stream
    # could possibly hold is structurally lying — reject before
    # allocating planes
    if entropy_bytes * 8 < blocks_total * 2:
        raise ValueError(
            f"JPEG entropy stream ({entropy_bytes} bytes) cannot hold "
            f"{blocks_total} declared blocks"
        )
    luma_idx = 0  # first scan component is Y (or the only gray plane)
    for c in scan:
        if c["tq"] not in qt:
            raise ValueError(f"missing JPEG quant table {c['tq']}")
        if (0, c["dc"]) not in huff or (1, c["ac"]) not in huff:
            raise ValueError("missing JPEG Huffman table")
    # only the luminance plane is ever materialized — chroma blocks are
    # entropy-decoded for bitstream sync but never IDCT'd or stored
    yc = scan[luma_idx]
    planes = {luma_idx: np.zeros(
        (mcus_y * yc["v"] * 8, mcus_x * yc["h"] * 8), dtype=np.float64
    )}

    seg_i = 0
    reader = _BitReader(segments[0])
    preds = [0] * len(scan)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            mcu_i = my * mcus_x + mx
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                seg_i += 1
                if seg_i >= len(segments):
                    raise ValueError("missing JPEG restart segment")
                reader = _BitReader(segments[seg_i])
                preds = [0] * len(scan)
            for ci, c in enumerate(scan):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coefs = np.zeros(64, dtype=np.float64)
                        t = reader.read_symbol(huff[(0, c["dc"])])
                        diff = _extend(reader.read_bits(t), t)
                        preds[ci] += diff
                        coefs[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = reader.read_symbol(huff[(1, c["ac"])])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run overflow")
                            coefs[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        if ci != luma_idx:
                            continue  # chroma: sync only, skip IDCT
                        block64 = np.zeros(64, dtype=np.float64)
                        block64[ZIGZAG] = coefs * qt[c["tq"]]
                        px = _B.T @ block64.reshape(8, 8) @ _B + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
    y = scan[luma_idx]
    plane = planes[luma_idx]
    if y["h"] != hmax or y["v"] != vmax:
        plane = np.repeat(
            np.repeat(plane, vmax // y["v"], axis=0), hmax // y["h"], axis=1
        )
    gray = np.clip(plane[:h, :w], 0.0, 255.0)
    return w, h, gray


def _build_encode_table(bits: list[int], vals: bytes) -> dict:
    """symbol -> (code, length) for the encoder side."""
    dec = _build_decode_table(bits, vals)
    return {sym: (code, length) for (length, code), sym in dec.items()}


# encoder Huffman spec: custom VALID canonical tables (written to DHT,
# so any decoder reconstructs them) — 12 DC categories at 4/5 bits
# (Kraft 4/16 + 8/32 = 0.5), all 162 AC symbols at 9 bits (162/512).
_ENC_DC_BITS = [0, 0, 0, 4, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_VALS = bytes(range(12))
_AC_SYMS = bytes(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
)
_ENC_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, len(_AC_SYMS), 0, 0, 0, 0, 0, 0, 0]


def _quant_table(quality: int) -> np.ndarray:
    """Flat-16 base scaled by the IJG quality curve: quality=100 ->
    all-ones (near-lossless), 50 -> 16s, lower -> coarser."""
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((16 * scale + 50) // 100, 1, 255) * np.ones(
        64, dtype=np.int64
    )


class _BitWriter:
    def __init__(self) -> None:
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
            self.write(0x7F, 8 - self.nbits)  # 1-pad to byte boundary
        return bytes(self.out)


def _csize(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 100,
    restart_interval: int = 0,
    subsampling: str = "gray",
) -> bytes:
    """(h, w) grayscale or (h, w, 3) RGB uint8 -> baseline JFIF JPEG
    bytes. Lossy: round-trip error is bounded by quantization (at
    quality=100 the table is all ones and the error is DCT float
    rounding, a few levels). ``restart_interval`` > 0 emits DRI + RSTn
    markers every that many MCUs (resets the DC predictions and
    byte-aligns). ``subsampling``: "gray" (default — RGB input is
    collapsed to BT.601 luminance, one component), "444" (YCbCr, all
    components full resolution) or "420" (YCbCr, chroma 2x2 box-mean
    at half resolution — the interleaved-MCU layout real camera JPEGs
    use). The color modes exist chiefly so the DECODER's
    multi-component path (chroma bitstream sync, generic sampling
    factors, luma-only IDCT) has in-container test vectors."""
    px = np.asarray(pixels)
    if subsampling not in ("gray", "444", "420"):
        raise ValueError(f"unknown subsampling {subsampling!r}")
    if subsampling == "gray":
        if px.ndim == 3 and px.shape[2] == 3:
            # encode the BT.601 luminance of RGB input (the decode path
            # produces luminance anyway)
            px = (0.299 * px[..., 0] + 0.587 * px[..., 1]
                  + 0.114 * px[..., 2])
        if px.ndim != 2 or px.shape[0] == 0 or px.shape[1] == 0:
            raise ValueError(
                f"encode_jpeg wants (h, w[, 3]), got {px.shape}"
            )
    elif px.ndim != 3 or px.shape[2] != 3 or px.shape[0] == 0 \
            or px.shape[1] == 0:
        raise ValueError(
            f"encode_jpeg subsampling={subsampling!r} wants (h, w, 3), "
            f"got {px.shape}"
        )
    h, w = px.shape[:2]
    if h > 0xFFFF or w > 0xFFFF:
        raise ValueError("image too large for JPEG dimensions")
    q = _quant_table(quality)

    # components: (plane float64, h_factor, v_factor) — JFIF YCbCr
    if subsampling == "gray":
        comps = [(px.astype(np.float64), 1, 1)]
    else:
        r, g, b = (px[..., i].astype(np.float64) for i in range(3))
        yy = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "444":
            comps = [(yy, 1, 1), (cb, 1, 1), (cr, 1, 1)]
        else:  # 420: chroma = 2x2 box mean at half resolution
            def half(p: np.ndarray) -> np.ndarray:
                p = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                           mode="edge")
                return (p[0::2, 0::2] + p[0::2, 1::2]
                        + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
            comps = [(yy, 2, 2), (half(cb), 1, 1), (half(cr), 1, 1)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = []
    for plane, ch, cv in comps:
        th, tw = mcus_y * cv * 8, mcus_x * ch * 8
        planes.append((np.pad(
            plane, ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        ), ch, cv))

    dc_enc = _build_encode_table(_ENC_DC_BITS, _ENC_DC_VALS)
    ac_enc = _build_encode_table(_ENC_AC_BITS, _AC_SYMS)
    bw = _BitWriter()
    preds = [0] * len(planes)
    body = bytearray()

    def put_block(block: np.ndarray, ci: int) -> None:
        # q is a flat (single-valued) table, so its zigzag reordering is
        # the identity — the DQT segment below is spec-correct (zigzag)
        coefs = (_B @ (block - 128.0) @ _B.T).reshape(64)[ZIGZAG]
        qcoefs = np.round(coefs / q).astype(np.int64)
        diff = int(qcoefs[0]) - preds[ci]
        preds[ci] = int(qcoefs[0])
        s = _csize(diff)
        code, ln = dc_enc[s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        run = 0
        nz = np.nonzero(qcoefs[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(qcoefs[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_enc[0xF0]
                bw.write(code, ln)
                run -= 16
            s = _csize(v)
            if s > 10:
                raise ValueError("AC coefficient out of range")
            code, ln = ac_enc[(run << 4) | s]
            bw.write(code, ln)
            bw.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < 63:
            code, ln = ac_enc[0x00]  # EOB
            bw.write(code, ln)

    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                body += bw.flush()
                body += bytes([0xFF, 0xD0 + ((mcu_i // restart_interval - 1)
                                             % 8)])
                bw = _BitWriter()
                preds = [0] * len(planes)
            mcu_i += 1
            for ci, (plane, ch, cv) in enumerate(planes):
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        put_block(plane[y0 : y0 + 8, x0 : x0 + 8], ci)
    body += bw.flush()
    body = bytes(body)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    nc = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, nc) + b"".join(
        bytes([ci + 1, (ch << 4) | cv, 0])
        for ci, (_, ch, cv) in enumerate(planes)
    )
    sos = bytes([nc]) + b"".join(
        bytes([ci + 1, 0x00]) for ci in range(nc)
    ) + bytes([0, 63, 0])
    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(int(v) for v in q))
    out += seg(0xC0, sof)
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(_ENC_DC_BITS) + _ENC_DC_VALS
        + bytes([0x10]) + bytes(_ENC_AC_BITS) + _AC_SYMS,
    )
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, sos)
    out += body + b"\xff\xd9"
    return out
