"""Pure-numpy baseline JPEG (JFIF) codec for the multimodal feature
kernels — closes the most common real-world image format without PIL
(absent in this container). Reference parity note: the reference engine has
no media decode at all; this backs the driver-mandated multimodal extension
(SURVEY.md §2 extensions).

Scope (the honest contract, same as decode_png):
 - DECODE: baseline DCT (SOF0), 8-bit, grayscale or YCbCr with 1x1/2x1/
   1x2/2x2 sampling factors (4:4:4, 4:2:2, 4:4:0, 4:2:0), restart
   intervals. Huffman + quantization tables are read from the FILE (DHT/
   DQT), so files from any conforming encoder decode. Progressive (SOF2),
   arithmetic coding, 12-bit precision, lossless and malformed streams
   return None — the corrupt-blob-never-kills-the-stage contract.
 - ENCODE (test harness): baseline, 4:4:4 or 4:2:0, quality-scaled Annex-K
   style quantization, canonical Huffman tables embedded in DHT (so the
   decoder's table handling — not a shared constant — is what round-trips).

Everything is vectorized per 8x8-block batch: the FDCT/IDCT are two GEMMs
over the whole block stack, and entropy decode builds a 16-bit prefix LUT
per Huffman table so the bit loop does O(1) work per symbol.
"""

from __future__ import annotations

import numpy as np

# zigzag order: index i of the scan -> (row, col) flat position in the 8x8
_ZZ = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# base quantization tables (the widely published example tables; scaled by
# quality below — the decoder never uses these, it reads DQT from the file)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# orthonormal DCT-II matrix: FDCT of block B is C @ B @ C.T, IDCT is C.T@F@C
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = 0.5 * (1.0 / np.sqrt(2.0) if _u == 0 else 1.0) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16.0
        )


def _quality_scale(q_base: np.ndarray, quality: int) -> np.ndarray:
    quality = max(1, min(100, quality))
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    t = np.floor((q_base * s + 50) / 100)
    return np.clip(t, 1, 255)


# ---------------------------------------------------------------------------
# Huffman: canonical code construction shared by encoder (build) and
# decoder (DHT parse); the decoder additionally builds a 16-bit prefix LUT.
# ---------------------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for a JPEG BITS/HUFFVAL spec. Raises on an
    over-full tree (invalid table)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("huffman tree over-full")
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_lut(bits: list[int], vals: list[int]) -> tuple[np.ndarray, np.ndarray]:
    """(symbol, length) arrays of size 2^16 indexed by the next 16 bits of
    the stream; length 0 marks an invalid prefix."""
    sym = np.zeros(1 << 16, dtype=np.int16)
    ln = np.zeros(1 << 16, dtype=np.int8)
    codes = _canonical_codes(bits, vals)
    for v, (code, length) in codes.items():
        lo = code << (16 - length)
        hi = lo + (1 << (16 - length))
        sym[lo:hi] = v
        ln[lo:hi] = length
    return sym, ln


def _extend(v: int, size: int) -> int:
    """JPEG EXTEND: map a `size`-bit magnitude to its signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


class _BitReader:
    """MSB-first bit reader over pre-unstuffed scan bytes."""

    __slots__ = ("data", "pos", "buf", "nbits", "pad_bits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0
        self.pad_bits = 0

    def _fill(self) -> None:
        while self.nbits <= 48:
            if self.pos < len(self.data):
                self.buf = (self.buf << 8) | self.data[self.pos]
                self.pos += 1
            else:
                self.buf <<= 8  # zero padding past the end
                self.pad_bits += 8
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        return (self.buf >> (self.nbits - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.nbits -= n
        self.buf &= (1 << self.nbits) - 1 if self.nbits else 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        v = (self.buf >> (self.nbits - n)) & ((1 << n) - 1)
        self.skip(n)
        return v

    def overran(self) -> bool:
        """True when decoding CONSUMED synthesized pad bits beyond the last
        real byte (a truncated entropy stream) — up to 7 trailing pad bits
        inside the final byte are legitimate encoder flush, anything past
        one full pad byte is corruption."""
        return self.pad_bits - self.nbits > 7


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg_baseline(b: bytes) -> np.ndarray | None:
    """Baseline JFIF/JPEG -> uint8 image ((h, w) grayscale or (h, w, 3)
    RGB). None for progressive/arithmetic/12-bit/unsupported-sampling or
    malformed input — never raises on hostile bytes."""
    try:
        return _decode_jpeg(b)
    except Exception:
        return None


_MAX_PIXELS = 64_000_000  # same hostile-header cap class as decode_png


def _decode_jpeg(b: bytes) -> np.ndarray | None:
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:  # SOI
        return None
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}
    frame = None
    restart_interval = 0
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # stray SOI/RST
            i += 2
            continue
        if marker == 0xD9:  # EOI before SOS
            return None
        seg_len = (b[i + 2] << 8) | b[i + 3]
        if seg_len < 2 or i + 2 + seg_len > n:
            return None
        seg = b[i + 4 : i + 2 + seg_len]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:  # 16-bit tables: out of baseline scope
                    return None
                if j + 65 > len(seg):
                    return None
                tbl = np.frombuffer(seg[j + 1 : j + 65], dtype=np.uint8).astype(
                    np.float64
                )
                dq = np.empty(64)
                dq[_ZZ] = tbl  # stored in zigzag order
                qt[tq] = dq
                j += 65
        elif marker == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                if j + 17 + nv > len(seg):
                    return None
                vals = list(seg[j + 17 : j + 17 + nv])
                huff[(tc, th)] = _decode_lut(bits, vals)
                j += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # baseline / ext. sequential
            if seg[0] != 8:  # bit precision
                return None
            h = (seg[1] << 8) | seg[2]
            w = (seg[3] << 8) | seg[4]
            nc = seg[5]
            if h == 0 or w == 0 or h * w > _MAX_PIXELS or nc not in (1, 3):
                return None
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # progressive / arithmetic / hierarchical / lossless
        elif marker == 0xDD:  # DRI
            restart_interval = (seg[0] << 8) | seg[1]
        elif marker == 0xDA:  # SOS — scan follows
            if frame is None:
                return None
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_comps.append((cs, tables >> 4, tables & 0x0F))
            return _decode_scan(
                b, i + 2 + seg_len, frame, scan_comps, qt, huff, restart_interval
            )
        # all other markers (APPn, COM): skip
        i += 2 + seg_len
    return None


def _split_unstuff(b: bytes, start: int) -> list[bytes]:
    """Entropy-coded segments between restart markers, 0xFF00-unstuffed.
    Stops at EOI or any non-RST marker."""
    segs: list[bytes] = []
    cur = bytearray()
    i = start
    n = len(b)
    while i < n:
        byte = b[i]
        if byte != 0xFF:
            cur.append(byte)
            i += 1
            continue
        if i + 1 >= n:
            break
        nxt = b[i + 1]
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or next segment
            break
    segs.append(bytes(cur))
    return segs


def _decode_scan(b, start, frame, scan_comps, qt, huff, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        return None
    for c in comps:
        if c["h"] not in (1, 2) or c["v"] not in (1, 2) or c["tq"] not in qt:
            return None
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan_comps:
        if cs not in by_id or (0, td) not in huff or (1, ta) not in huff:
            return None
        order.append((by_id[cs], huff[(0, td)], huff[(1, ta)]))
    if len(order) != len(comps):  # multi-scan baseline: out of scope
        return None

    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy
    # per-component coefficient storage (blocks in MCU raster order)
    planes = []
    for c, _, _ in order:
        bw, bh = mcux * c["h"], mcuy * c["v"]
        planes.append(np.zeros((bh * bw, 64), dtype=np.float64))

    segs = _split_unstuff(b, start)
    seg_idx = 0
    reader = _BitReader(segs[0])
    pred = [0] * len(order)

    for mcu in range(n_mcu):
        if mcu and restart_interval and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segs):
                return None
            reader = _BitReader(segs[seg_idx])
            pred = [0] * len(order)
        my, mx = divmod(mcu, mcux)
        for ci, (c, (dsym, dlen), (asym, alen)) in enumerate(order):
            for v in range(c["v"]):
                for hh in range(c["h"]):
                    blk = _decode_block(reader, dsym, dlen, asym, alen)
                    if blk is None:
                        return None
                    dc, coefs = blk
                    pred[ci] += dc
                    coefs[0] = pred[ci]
                    bw = mcux * c["h"]
                    planes[ci][(my * c["v"] + v) * bw + (mx * c["h"] + hh)] = coefs

    # dequantize + IDCT per component, vectorized over all blocks
    out_comps = []
    for ci, (c, _, _) in enumerate(order):
        coefs = planes[ci] * qt[c["tq"]][None, :]
        blocks = coefs.reshape(-1, 8, 8)
        pix = np.einsum("ux,nuv,vy->nxy", _C, blocks, _C) + 128.0
        bw, bh = mcux * c["h"], mcuy * c["v"]
        img = (
            pix.reshape(bh, bw, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # upsample to full MCU-padded resolution by pixel replication
        if c["h"] < hmax:
            img = np.repeat(img, hmax // c["h"], axis=1)
        if c["v"] < vmax:
            img = np.repeat(img, vmax // c["v"], axis=0)
        out_comps.append(img[:h, :w])

    if len(out_comps) == 1:
        return np.clip(out_comps[0].round(0), 0, 255).astype(np.uint8)
    Y, Cb, Cr = out_comps
    r = Y + 1.402 * (Cr - 128.0)
    g = Y - 0.344136 * (Cb - 128.0) - 0.714136 * (Cr - 128.0)
    bl = Y + 1.772 * (Cb - 128.0)
    return np.clip(np.stack([r, g, bl], axis=-1).round(0), 0, 255).astype(np.uint8)


def _decode_block(reader, dsym, dlen, asym, alen):
    """One 8x8 block: returns (dc_diff, zigzag-ordered natural coefs) with
    coefs[0] left 0 (caller writes the DC prediction), None on bad stream."""
    p = reader.peek16()
    ln = int(dlen[p])
    if ln == 0:
        return None
    reader.skip(ln)
    size = int(dsym[p])
    if size > 15:
        return None
    dc = _extend(reader.read(size), size)
    coefs = np.zeros(64)
    k = 1
    while k < 64:
        p = reader.peek16()
        ln = int(alen[p])
        if ln == 0:
            return None
        reader.skip(ln)
        rs = int(asym[p])
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            return None
        coefs[_ZZ[k]] = _extend(reader.read(s), s)
        k += 1
    if reader.overran():
        return None
    return dc, coefs


# ---------------------------------------------------------------------------
# encoder (test harness)
# ---------------------------------------------------------------------------


def _build_huffman(freqs: dict[int, int]) -> tuple[list[int], list[int]]:
    """Length-limited (16-bit) canonical Huffman spec (BITS, HUFFVAL) from
    symbol frequencies — the JPEG Annex-K flavor: reserve one code so no
    symbol gets the all-ones code."""
    freqs = dict(freqs)
    freqs[256] = 1  # the reserved symbol that absorbs the all-ones code
    # plain Huffman by merging; depth capped afterwards by the standard
    # "adjust BITS" procedure
    nodes = [(f, [s]) for s, f in freqs.items()]
    lengths: dict[int, int] = {s: 0 for s in freqs}
    while len(nodes) > 1:
        # tie-break: the node holding the reserved symbol 256 merges FIRST
        # at equal frequency, so 256 always ends at the deepest code length
        # and the all-1-bits code (reserved by ISO 10918-1 for baseline
        # tables) is guaranteed to land on it, never on a real symbol —
        # libjpeg's "V=256 takes the longest code" guarantee
        nodes.sort(key=lambda t: (t[0], 0 if 256 in t[1] else 1))
        (f1, s1), (f2, s2) = nodes[0], nodes[1]
        for s in s1 + s2:
            lengths[s] += 1
        nodes = nodes[2:] + [(f1 + f2, s1 + s2)]
    bits = [0] * 33
    for s, ln in lengths.items():
        bits[max(ln, 1)] += 1
    # K.3 adjust: fold codes deeper than 16 back up
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
    # drop the reserved symbol from the longest used length
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1
    by_len = sorted(
        (ln, s) for s, ln in lengths.items() if s != 256
    )
    huffval = [s for _, s in by_len]
    out_bits = bits[1:17]
    # recompute exact per-symbol lengths from the adjusted BITS
    return out_bits, huffval


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | code
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.buf >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.buf &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _block_symbols(blocks_q: np.ndarray, preds: np.ndarray):
    """Yield per-block (dc_size, dc_bits, [(rs, s, bits)...]) symbol streams
    from quantized zigzag blocks; preds carries the running DC predictor."""
    out = []
    for i in range(len(blocks_q)):
        zz = blocks_q[i][_ZZ]
        diff = int(zz[0]) - int(preds[0])
        preds[0] = int(zz[0])
        s = _size_cat(diff)
        dc_bits = diff if diff >= 0 else diff + (1 << s) - 1
        acs = []
        run = 0
        nz = np.nonzero(zz[1:])[0]
        last = nz[-1] + 1 if len(nz) else 0
        for k in range(1, last + 1):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                acs.append((0xF0, 0, 0))
                run -= 16
            sz = _size_cat(v)
            bits = v if v >= 0 else v + (1 << sz) - 1
            acs.append(((run << 4) | sz, sz, bits))
            run = 0
        if last < 63:
            acs.append((0x00, 0, 0))  # EOB
        out.append((s, dc_bits, acs))
    return out


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float64 (multiple of 8) -> (n, 8, 8) in raster block order."""
    H, W = plane.shape
    return (
        plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def encode_jpeg_baseline(
    img: np.ndarray, quality: int = 85, subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB -> baseline JFIF bytes.
    ``subsampling``: "444" (one MCU = one block per component) or "420"
    (2x2 luma blocks per MCU, chroma averaged 2x2). Huffman tables are
    built from the image's own symbol frequencies and embedded in DHT."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nch = img.shape
    gray = nch == 1
    f = img.astype(np.float64)
    if gray:
        comps_full = [f[:, :, 0]]
    else:
        r, g, bl = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        Y = 0.299 * r + 0.587 * g + 0.114 * bl
        Cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * bl
        Cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * bl
        comps_full = [Y, Cb, Cr]
    sub = (2, 2) if (subsampling == "420" and not gray) else (1, 1)
    hmax, vmax = (sub if not gray else (1, 1))
    if gray:
        samp = [(1, 1)]
    elif subsampling == "420":
        samp = [(2, 2), (1, 1), (1, 1)]
    else:
        samp = [(1, 1), (1, 1), (1, 1)]
        hmax = vmax = 1

    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    pw, ph = -(-w // mcu_w) * mcu_w, -(-h // mcu_h) * mcu_h

    def pad(p: np.ndarray, th: int, tw: int) -> np.ndarray:
        return np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")

    qluma = _quality_scale(_Q_LUMA, quality)
    qchroma = _quality_scale(_Q_CHROMA, quality)
    qtabs = [qluma] + ([] if gray else [qchroma])

    comp_blocks = []
    for ci, plane in enumerate(comps_full):
        ch, cv = samp[ci]
        if ch < hmax or cv < vmax:
            # average-pool chroma down by the sampling ratio
            fy, fx = vmax // cv, hmax // ch
            p = pad(plane, ph, pw)
            p = p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx).mean(axis=(1, 3))
        else:
            p = pad(plane, ph * cv // vmax, pw * ch // hmax)
        q = qtabs[0] if ci == 0 else qtabs[1]
        blocks = _to_blocks(p - 128.0)
        F = np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)
        comp_blocks.append(np.round(F.reshape(-1, 64) / q[None, :]).astype(np.int64))

    # MCU-ordered symbol streams (per component, raster of its own blocks
    # re-walked in MCU order)
    mcux, mcuy = pw // mcu_w, ph // mcu_h
    streams = []  # per component: list of per-block symbol tuples in MCU order
    for ci, blocks_q in enumerate(comp_blocks):
        ch, cv = samp[ci]
        bw = mcux * ch
        order = [
            (my * cv + v) * bw + (mx * ch + hh)
            for my in range(mcuy)
            for mx in range(mcux)
            for v in range(cv)
            for hh in range(ch)
        ]
        # restart intervals reset the DC predictor: regenerate symbols per
        # restart segment
        blocks_mcu = blocks_q[order]
        streams.append(blocks_mcu)

    n_mcu = mcux * mcuy
    blocks_per_mcu = [cv * ch for (ch, cv) in samp]

    def symbolize():
        """Per-component symbol lists in MCU order, predictors resetting at
        restart boundaries."""
        preds = [np.zeros(1, dtype=np.int64) for _ in samp]
        offs = [0] * len(samp)
        all_syms: list[list] = [[] for _ in samp]
        for mcu in range(n_mcu):
            if restart_interval and mcu and mcu % restart_interval == 0:
                preds = [np.zeros(1, dtype=np.int64) for _ in samp]
            for ci in range(len(samp)):
                nb = blocks_per_mcu[ci]
                blk = streams[ci][offs[ci] : offs[ci] + nb]
                all_syms[ci].extend(_block_symbols(blk, preds[ci]))
                offs[ci] += nb
        return all_syms

    all_syms = symbolize()

    # frequencies -> two table pairs (luma: component 0; chroma: the rest)
    def freqs_for(cis):
        dc: dict[int, int] = {}
        ac: dict[int, int] = {}
        for ci in cis:
            for s, _, acs in all_syms[ci]:
                dc[s] = dc.get(s, 0) + 1
                for rs, _, _ in acs:
                    ac[rs] = ac.get(rs, 0) + 1
        if not dc:
            dc = {0: 1}
        if not ac:
            ac = {0: 1}
        return dc, ac

    luma_dc_f, luma_ac_f = freqs_for([0])
    tables = {(0, 0): _build_huffman(luma_dc_f), (1, 0): _build_huffman(luma_ac_f)}
    if not gray:
        chroma_dc_f, chroma_ac_f = freqs_for([1, 2])
        tables[(0, 1)] = _build_huffman(chroma_dc_f)
        tables[(1, 1)] = _build_huffman(chroma_ac_f)
    enc = {k: _canonical_codes(list(bits), list(vals)) for k, (bits, vals) in tables.items()}

    # ---- emit segments ----
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in enumerate(qtabs):
        out += bytes([0xFF, 0xDB, 0x00, 0x43, tq])
        out += bytes(int(x) for x in q[_ZZ])
    # SOF0
    nc = 1 if gray else 3
    sof = bytearray([0xFF, 0xC0, 0x00, 8 + 3 * nc, 8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, nc])
    for ci in range(nc):
        ch, cv = samp[ci]
        sof += bytes([ci + 1, (ch << 4) | cv, 0 if ci == 0 else 1])
    out += sof
    for (tc, th), (bits, vals) in sorted(tables.items()):
        out += bytes([0xFF, 0xC4]) + (19 + len(vals)).to_bytes(2, "big")
        out += bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    if restart_interval:
        out += bytes([0xFF, 0xDD, 0x00, 0x04]) + restart_interval.to_bytes(2, "big")
    sos = bytearray([0xFF, 0xDA, 0x00, 6 + 2 * nc, nc])
    for ci in range(nc):
        th = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (th << 4) | th])
    sos += bytes([0, 63, 0])
    out += sos

    # entropy-coded data
    offs = [0] * len(samp)
    writer = _BitWriter()
    rst = 0
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            writer.flush()
            out += writer.out
            out += bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            writer = _BitWriter()
        for ci in range(len(samp)):
            th = 0 if ci == 0 else 1
            dc_codes, ac_codes = enc[(0, th)], enc[(1, th)]
            for _ in range(blocks_per_mcu[ci]):
                s, dc_bits, acs = all_syms[ci][offs[ci]]
                offs[ci] += 1
                code, ln = dc_codes[s]
                writer.write(code, ln)
                if s:
                    writer.write(dc_bits, s)
                for rs, sz, bits_v in acs:
                    code, ln = ac_codes[rs]
                    writer.write(code, ln)
                    if sz:
                        writer.write(bits_v, sz)
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
