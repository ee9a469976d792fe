"""Pure-stdlib baseline JPEG codec (numpy math, zero external deps).

Closes the last env-gated image format: like the PNG codec in
``operators.multimodal`` (reference parity: the reference treats media
as opaque blobs; we make the decode stage REAL), this implements the
baseline sequential DCT process of ITU-T T.81 from the public spec:

- encoder: RGB->YCbCr (JFIF), optional 4:2:0 chroma subsampling, 8x8
  orthonormal DCT (identical to the spec's FDCT - proven in tests
  against the O(N^4) definition), Annex-K-style quantization tables
  scaled by quality, per-image canonical Huffman tables built with the
  Annex K.2 algorithm (dummy symbol reserves the all-ones code,
  16-bit length limit via BITS adjustment) and DECLARED in DHT - any
  spec decoder can read the output;
- decoder: full marker parse (DQT/SOF0/DHT/SOS/DRI + restart markers),
  general sampling factors (4:4:4, 4:2:0, 4:2:2, grayscale), Huffman +
  DPCM + run-length entropy decode with byte-unstuffing, dequantize,
  IDCT, nearest-neighbor chroma upsample, YCbCr->RGB.

Lossy by design: round-trip tests assert PSNR bounds and exactness on
DC-only (uniform) images, where the closed form is analytic.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MIME = "image/jpeg"

# ---------------------------------------------------------------------------
# 8x8 DCT (orthonormal matrix form == T.81 FDCT/IDCT, see tests)
# ---------------------------------------------------------------------------

_C = np.zeros((8, 8))
for _k in range(8):
    _a = np.sqrt(1.0 / 8.0) if _k == 0 else np.sqrt(2.0 / 8.0)
    for _n in range(8):
        _C[_k, _n] = _a * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


def dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


# Annex K base quantization tables (public spec, Tables K.1/K.2)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])
_UNZIGZAG = np.argsort(_ZIGZAG)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    qt = np.floor((base * s + 50) / 100).astype(np.int32)
    return np.clip(qt, 1, 255)


# ---------------------------------------------------------------------------
# color transforms (JFIF)
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0].astype(np.float64), rgb[..., 1].astype(np.float64), rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Huffman (Annex K.2 table construction + canonical codes)
# ---------------------------------------------------------------------------


def _build_huffman_table(freqs: np.ndarray) -> tuple[list[int], list[int]]:
    """freq[257] (index 256 = reserved dummy) -> (BITS[1..16], HUFFVAL).

    The Annex K.2 flow: repeatedly merge the two least-frequent live
    symbols (ties to the HIGHER index - keeps the dummy deepest, so the
    all-ones code is never assigned to a real symbol), track code sizes
    via chained OTHERS, then fold code sizes > 16 down (Figure K.3)."""
    freq = freqs.astype(np.int64).copy()
    freq[256] = 1  # reserve the all-ones code
    codesize = np.zeros(257, dtype=np.int64)
    others = np.full(257, -1, dtype=np.int64)

    def _least(exclude: int) -> int:
        best, bv = -1, None
        for i in range(257):
            if freq[i] > 0 and i != exclude and (bv is None or freq[i] <= bv):
                # <= : prefer the LARGEST index among minima (spec)
                best, bv = i, freq[i]
        return best

    while True:
        v1 = _least(-1)
        v2 = _least(v1)
        if v2 == -1:
            break
        freq[v1] += freq[v2]
        freq[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = others[v2]
            codesize[v2] += 1

    bits = np.zeros(33, dtype=np.int64)
    for i in range(257):
        if codesize[i]:
            bits[min(32, codesize[i])] += 1
    # Figure K.3: fold lengths > 16
    i = 32
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    # remove the dummy's slot from the longest non-empty length
    for i in range(16, 0, -1):
        if bits[i] > 0:
            bits[i] -= 1
            break
    huffval = [s for sz in range(1, 33) for s in np.nonzero(codesize == sz)[0] if s != 256]
    return bits[1:17].tolist(), [int(v) for v in huffval]


def _canonical_codes(bits: list[int], huffval: list[int]) -> dict[int, tuple[int, int]]:
    """DHT (BITS, HUFFVAL) -> {symbol: (code, length)} canonical codes."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s (spec)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG: entropy data ended mid-symbol")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            nxt = self.data[self.pos] if self.pos < len(self.data) else None
            if nxt == 0x00:
                self.pos += 1  # unstuff
            else:
                # a bare marker (EOI, unexpected RSTn, anything else)
                # inside the counted entropy stream is corruption; the
                # caller consumes legitimate RSTn via sync_restart()
                raise ValueError(
                    f"corrupt JPEG: marker 0xFF{nxt:02X} inside entropy data"
                    if nxt is not None
                    else "truncated JPEG: dangling 0xFF at end of data"
                )
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Skip to just past the next RSTn marker and reset bit state."""
        self.nbits = 0
        while True:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated JPEG: expected RSTn marker")
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                break
            self.pos += 1
        self.pos += 2


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (SSSS category, appended bits) per T.81 F.1.4.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    ssss = a.bit_length()
    bits = v if v > 0 else v + (1 << ssss) - 1
    return ssss, bits


def _extend(bits: int, ssss: int) -> int:
    if ssss == 0:
        return 0
    return bits if bits >= (1 << (ssss - 1)) else bits - (1 << ssss) + 1


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    """Edge-pad a plane to 8-multiples and split into 8x8 blocks
    (row-major block order), shape (n_blocks, 8, 8)."""
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    p = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    bh, bw = p.shape[0] // 8, p.shape[1] // 8
    return p.reshape(bh, 8, bw, 8).swapaxes(1, 2).reshape(-1, 8, 8), bh, bw


def _quantize_plane(plane: np.ndarray, qt: np.ndarray):
    blocks, bh, bw = _blocks_of(plane.astype(np.float64) - 128.0)
    coefs = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
    q = np.round(coefs / qt[None, :, :]).astype(np.int32)
    return q, bh, bw


def _rle_block(zz: np.ndarray, dc_pred: int):
    """Zigzagged int block -> (dc_diff, [(run, val), ...], new_pred)."""
    dc = int(zz[0])
    acs = []
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
        else:
            while run > 15:
                acs.append((15, 0))  # ZRL
                run -= 16
            acs.append((run, v))
            run = 0
    eob = last < 63
    return dc - dc_pred, acs, dc, eob


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode HxW (grayscale) or HxWx3 (RGB) uint8 to baseline JPEG.

    ``subsample=True`` writes 4:2:0 chroma (2x2 averaged); default is
    4:4:4. ``restart_interval`` > 0 emits DRI + RSTn markers every N
    MCUs (the error-resilience / parallel-decode feature). Huffman
    tables are built per-image and declared in DHT."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(arr)
        y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
        if subsample:
            ph, pw = (-h) % 2, (-w) % 2
            cbp = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
            crp = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
            cb = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
        planes = [y, cb, cr]

    qt_l = _scaled_qt(_QT_LUMA, quality)
    qt_c = _scaled_qt(_QT_CHROMA, quality)
    qts = [qt_l] + ([qt_c, qt_c] if not gray else [])

    # quantized zigzag coefficient blocks per component
    comp_zz = []
    comp_dims = []
    for plane, qt in zip(planes, qts if not gray else [qt_l]):
        q, bh, bw = _quantize_plane(plane, qt)
        comp_zz.append(q.reshape(-1, 64)[:, _ZIGZAG])
        comp_dims.append((bh, bw))

    # MCU ordering: 4:4:4/gray = one block per component per MCU;
    # 4:2:0 = 4 luma + 1 cb + 1 cr per MCU
    if gray:
        samp = [(1, 1)]
    elif subsample:
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    def comp_block(ci: int, by: int, bx: int) -> np.ndarray:
        bh, bw = comp_dims[ci]
        by, bx = min(by, bh - 1), min(bx, bw - 1)  # edge-replicated pad blocks
        return comp_zz[ci][by * bw + bx]

    # entropy symbol stream (two passes: freq count, then write)
    dc_freq = [np.zeros(257), np.zeros(257)]
    ac_freq = [np.zeros(257), np.zeros(257)]
    mcus = []  # per MCU: [(tbl, dc_diff, acs, eob), ...]
    preds = [0] * len(planes)
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                preds = [0] * len(planes)  # DC prediction resets at RSTn
            mcu_index += 1
            mcu = []
            for ci, (sh, sv) in enumerate(samp):
                tbl = 0 if ci == 0 else 1
                for v in range(sv):
                    for u in range(sh):
                        zz = comp_block(ci, my * sv + v, mx * sh + u)
                        diff, acs, dc, eob = _rle_block(zz, preds[ci])
                        preds[ci] = dc
                        mcu.append((tbl, diff, acs, eob))
                        dc_freq[tbl][_magnitude(diff)[0]] += 1
                        for run, val in acs:
                            s = _magnitude(val)[0]
                            ac_freq[tbl][(run << 4) | s] += 1
                        if eob:
                            ac_freq[tbl][0x00] += 1
            mcus.append(mcu)

    ntbl = 1 if gray else 2
    dc_tables = [_build_huffman_table(dc_freq[t]) for t in range(ntbl)]
    ac_tables = [_build_huffman_table(ac_freq[t]) for t in range(ntbl)]
    dc_codes = [_canonical_codes(*t) for t in dc_tables]
    ac_codes = [_canonical_codes(*t) for t in ac_tables]

    bw_ = _BitWriter()
    for i, mcu in enumerate(mcus):
        if restart_interval and i and i % restart_interval == 0:
            bw_.flush()
            bw_.out += bytes([0xFF, 0xD0 + ((i // restart_interval - 1) % 8)])
        for tbl, diff, acs, eob in mcu:
            ssss, bits = _magnitude(diff)
            code, ln = dc_codes[tbl][ssss]
            bw_.write(code, ln)
            if ssss:
                bw_.write(bits, ssss)
            for run, val in acs:
                s, vb = _magnitude(val)
                code, ln = ac_codes[tbl][(run << 4) | s]
                bw_.write(code, ln)
                if s:
                    bw_.write(vb, s)
            if eob:
                code, ln = ac_codes[tbl][0x00]
                bw_.write(code, ln)
    bw_.flush()

    # ---- marker segments ----
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, bytes([0]) + bytes(qt_l.flatten()[_ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xFFDB, bytes([1]) + bytes(qt_c.flatten()[_ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += seg(0xFFC0, sof)
    for t in range(ntbl):
        bits, vals = dc_tables[t]
        out += seg(0xFFC4, bytes([t]) + bytes(bits) + bytes(vals))
        bits, vals = ac_tables[t]
        out += seg(0xFFC4, bytes([0x10 | t]) + bytes(bits) + bytes(vals))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw_.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _HuffDecoder:
    def __init__(self, bits: list[int], vals: list[int]) -> None:
        # mincode/maxcode per length (T.81 F.2.2.3)
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for length in range(1, 17):
            if bits[length - 1] == 0:
                self.maxcode[length] = -1
            else:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = br.read_bit()
        length = 1
        while self.maxcode[length] < code or self.maxcode[length] == -1:
            code = (code << 1) | br.read_bit()
            length += 1
            if length > 16:
                raise ValueError("invalid Huffman code")
        return self.vals[self.valptr[length] + code - self.mincode[length]]


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG to uint8 HxW (grayscale) or
    HxWx3 (RGB). Supports general sampling factors and restart markers."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    dc_h: dict[int, _HuffDecoder] = {}
    ac_h: dict[int, _HuffDecoder] = {}
    comps = []  # (id, sh, sv, qt_id)
    h = w = 0
    restart_interval = 0
    while True:
        if data[pos] != 0xFF:
            raise ValueError(f"marker expected at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("no scan data before EOI")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        body = data[pos + 2:pos + seglen]
        if marker == 0xDB:  # DQT (possibly multiple tables per segment)
            b = body
            while b:
                pq, tq = b[0] >> 4, b[0] & 0xF
                n = 64 * (2 if pq else 1)
                raw = np.frombuffer(b[1:1 + n], dtype=">u2" if pq else np.uint8).astype(np.int32)
                qts[tq] = raw[_UNZIGZAG].reshape(8, 8)
                b = b[1 + n:]
        elif marker == 0xC0:  # SOF0 baseline
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            for i in range(ncomp):
                cid, sf, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append((cid, sf >> 4, sf & 0xF, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"unsupported SOF{marker - 0xC0} (baseline only)")
        elif marker == 0xC4:  # DHT (possibly multiple)
            b = body
            while b:
                tc, th = b[0] >> 4, b[0] & 0xF
                bits = list(b[1:17])
                n = sum(bits)
                vals = list(b[17:17 + n])
                (dc_h if tc == 0 else ac_h)[th] = _HuffDecoder(bits, vals)
                b = b[17 + n:]
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                ci = next(i for i, c in enumerate(comps) if c[0] == cs)
                scan.append((ci, tt >> 4, tt & 0xF))
            pos += seglen
            break
        pos += seglen

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    planes = []
    for _, sh, sv, _ in comps:
        planes.append(np.zeros((mcuy * sv * 8, mcux * sh * 8)))

    br = _BitReader(data[pos:])
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_restart()
                preds = [0] * len(comps)
            mcu_count += 1
            for ci, tdc, tac in scan:
                _, sh, sv, tq = comps[ci]
                for v in range(sv):
                    for u in range(sh):
                        zz = np.zeros(64, dtype=np.int32)
                        ssss = dc_h[tdc].decode(br)
                        diff = _extend(br.receive(ssss), ssss)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = ac_h[tac].decode(br)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run overflow")
                            zz[k] = _extend(br.receive(s), s)
                            k += 1
                        coef = zz[_UNZIGZAG].reshape(8, 8) * qts[tq]
                        blk = idct2(coef) + 128.0
                        y0, x0 = (my * sv + v) * 8, (mx * sh + u) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = blk

    # upsample to full resolution and crop
    full = []
    for (_, sh, sv, _), plane in zip(comps, planes):
        if sh != hmax or sv != vmax:
            plane = np.repeat(np.repeat(plane, vmax // sv, axis=0), hmax // sh, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    return _ycbcr_to_rgb(np.stack(full, axis=-1))
