"""DCT JPEG codec from scratch on stdlib + numpy — no PIL/cv2.

Closes the last media-codec gap vs the reference, which loads JPEG through
PIL/cv2 (``utils/image/image_io.py:68-137``).  This container ships neither,
so both directions are implemented directly from the public ITU-T T.81
(JPEG) spec:

- :func:`decode_jpeg` — decodes baseline sequential (SOF0/1), interleaved
  or multi-scan non-interleaved, AND progressive Huffman (SOF2) with both
  spectral selection and successive approximation: marker/segment parse,
  DQT/DHT table load, byte-destuffed bit reader, per-scan Huffman decode
  into per-component coefficient grids (DC diff + AC run/size with
  EOB/ZRL; progressive DC first/refine and AC first/refine with EOB-run
  coding), then ONE vectorized dequantize + 8x8 IDCT pass (einsum over
  the whole block grid), restart-marker handling, nearest-neighbor chroma
  upsampling for 4:2:0/4:2:2, JFIF full-range YCbCr -> RGB.  Grayscale
  (1 component) returns ``[h, w]``; color returns ``[h, w, 3]`` uint8.
  Lossless Huffman (SOF3, Annex H) decodes bit-exactly: per-sample
  category + difference bits over predictors 1-7, mod-2^16
  reconstruction, restart-reset prediction (:func:`encode_jpeg_lossless`
  is the matching writer).  Arithmetic coding and hierarchical SOFs
  raise ``NotImplementedError``.
- :func:`encode_jpeg` — baseline encoder: 4:4:4 / 4:2:0 (or
  single-component grayscale), Annex-K quantization tables scaled by the
  IJG quality curve, Annex-K Huffman tables, forward DCT, run-length +
  Huffman entropy coding with 0xFF byte stuffing.
- :func:`encode_jpeg_progressive` / :func:`encode_jpeg_multiscan` —
  progressive (libjpeg-style scan script) and non-interleaved sequential
  encoders.  Exist so tests can round-trip every decoder path without any
  external codec.

The huffman/quant constants below are the public Annex-K example tables;
they are written into DQT/DHT segments so any standard decoder can read
our output, and our decoder reads whatever tables the file declares (it is
not hardwired to these).
"""

from __future__ import annotations

import struct

import numpy as np

# --- constants (ITU-T T.81 Annex K, public) --------------------------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# (bits-per-length[1..16], symbol values) per Annex K
HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUMA = (
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
HUFF_AC_CHROMA = (
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

# 8x8 DCT-II basis matrix: dct = M @ block @ M.T, idct = M.T @ coeff @ M
_k = np.arange(8)
_DCT_M = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * 0.5
_DCT_M[0, :] *= 1.0 / np.sqrt(2.0)


def _canonical_codes(bits, values):
    """(bits[1..16], values) -> list of (length, code, symbol)."""
    out = []
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((length, code, values[i]))
            code += 1
            i += 1
        code <<= 1
    return out


# --- bit IO -----------------------------------------------------------------


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 de-stuffing and
    restart-marker awareness."""

    def __init__(self, data: bytes, start: int):
        self.data = data
        self.pos = start
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.bitbuf = (self.bitbuf << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:
                    # restart marker: caller consumes via sync_restart()
                    self.bitbuf = (self.bitbuf << 8) | 0
                    self.nbits += 8
                    continue
                else:
                    # EOI or next segment: pad with zeros
                    self.bitbuf = (self.bitbuf << 8) | 0
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.bitbuf = (self.bitbuf << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self):
        """Discard padding bits and consume an RSTn marker."""
        self.bitbuf = 0
        self.nbits = 0
        while self.pos + 1 < len(self.data):
            if self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("JPEG: expected restart marker")


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nacc += 1
            if self.nacc == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nacc = 0

    def flush(self):
        if self.nacc:
            self.acc = (self.acc << (8 - self.nacc)) | ((1 << (8 - self.nacc)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nacc = 0


def _extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude per T.81 F.2.2.1."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --- decoder ----------------------------------------------------------------


class _HuffDecoder:
    """Canonical Huffman decode table: (length -> {code: symbol})."""

    def __init__(self, bits, values):
        self.by_len = [dict() for _ in range(17)]
        for length, code, sym in _canonical_codes(bits, values):
            self.by_len[length][code] = sym

    def decode(self, reader: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            sym = self.by_len[length].get(code)
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid huffman code")


def _parse_jpeg(payload: bytes):
    """Marker/segment parse -> (frame, qt, scans, progressive).

    ``frame`` = (h, w, [(cid, hs, vs, tq)]); ``scans`` is one record per
    SOS with the Huffman-table and restart-interval state SNAPSHOT at
    that point (DHT/DRI may legally be redefined between scans):
    (sel=[(comp_idx, td, ta)], ss, se, ah, al, dc_tabs, ac_tabs, ri,
    data_start).  Entropy-coded data after each SOS is skipped by the
    same marker loop (0xFF00 stuffing, RSTn, 0xFF fill handled)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt = {}
    huff_dc, huff_ac = {}, {}
    restart_interval = 0
    frame = None
    progressive = False
    lossless = False
    precision = 8
    scans = []
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            # jump straight to the next 0xFF instead of stepping one byte
            # per Python iteration through entropy-coded data
            nxt = payload.find(b"\xff", pos)
            if nxt < 0:
                break
            pos = nxt
            continue
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte: extra 0xFF padding before a marker
            pos += 1  # (T.81 B.1.1.2) — never a marker id itself
            continue
        if marker == 0x00:  # stuffed byte (0xFF00 = literal 0xFF), not a marker
            pos += 2
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        seg = payload[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                i += 1
                if pq == 0:
                    tab = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int64)
                    i += 64
                else:
                    tab = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int64)
                    i += 128
                full = np.zeros(64, dtype=np.int64)
                full[ZIGZAG] = tab
                qt[tq] = full.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                values = list(seg[i + 17 : i + 17 + nv])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, values)
                i += 17 + nv
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):  # SOF0/1, SOF2 prog, SOF3 lossless
            precision, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
            lossless = marker == 0xC3
        elif marker in (0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "JPEG SOF{:X}: only baseline sequential (SOF0/1), "
                "progressive Huffman (SOF2) and lossless Huffman (SOF3) "
                "are supported".format(marker - 0xC0)
            )
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = seg[0]
            sel = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                comp_idx = next(
                    i for i, comp in enumerate(frame[2]) if comp[0] == cs
                )
                sel.append((comp_idx, tdta >> 4, tdta & 0xF))
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            scans.append(
                (sel, ss, se, a >> 4, a & 0xF, dict(huff_dc), dict(huff_ac),
                 restart_interval, pos + 2 + seglen)
            )
            pos += 2 + seglen
            continue  # marker loop skips the entropy data byte-by-byte
        pos += 2 + seglen
    if frame is None or not scans:
        raise ValueError("JPEG missing SOF/SOS")
    return frame, qt, scans, progressive, lossless, precision


def _comp_geometry(frame):
    """-> (hmax, vmax, mcux, mcuy, dims) where dims[c] = (bh_pad, bw_pad,
    bh, bw): the MCU-padded block grid and the component's own block grid
    (the traversal of non-interleaved scans, T.81 A.2.2)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    dims = []
    for _cid, hs, vs, _tq in comps:
        cw = (w * hs + hmax - 1) // hmax
        ch = (h * vs + vmax - 1) // vmax
        dims.append((mcuy * vs, mcux * hs, (ch + 7) // 8, (cw + 7) // 8))
    return hmax, vmax, mcux, mcuy, dims


def _scan_units(sel, comps, mcux, mcuy, dims):
    """Yield the scan's decode units in order: each unit is a list of
    (comp_idx, by, bx) blocks.  Interleaved (ns > 1): one unit per MCU
    over the frame MCU grid.  Non-interleaved (ns == 1): one unit per
    block in raster order over the component's own block grid."""
    if len(sel) == 1:
        ci = sel[0][0]
        _bhp, _bwp, bh, bw = dims[ci]
        for by in range(bh):
            for bx in range(bw):
                yield [(ci, by, bx)]
        return
    for my in range(mcuy):
        for mx in range(mcux):
            unit = []
            for ci, _td, _ta in sel:
                _cid, hs, vs, _tq = comps[ci]
                for by in range(vs):
                    for bx in range(hs):
                        unit.append((ci, my * vs + by, mx * hs + bx))
            yield unit


def _decode_scan(payload, frame, geom, coefs, scan, sequential):
    """Decode ONE scan's entropy data into the zigzag-order coefficient
    grids ``coefs[c]`` (int32 [bh_pad, bw_pad, 64]).  Handles baseline
    sequential scans (full DC+AC, any component subset) and all four
    progressive scan kinds (T.81 G.2): DC first / DC refine (successive
    approximation) and AC first / AC refine (spectral selection bands
    with EOB-run coding)."""
    sel, ss, se, ah, al, huff_dc, huff_ac, ri, data_start = scan
    h, w, comps = frame
    hmax, vmax, mcux, mcuy, dims = geom
    if sequential:
        ss, se, ah, al = 0, 63, 0, 0
    dc_scan = ss == 0
    if dc_scan and not sequential and se != 0:
        raise ValueError("JPEG: progressive DC scan must have Se=0")
    if not dc_scan and len(sel) > 1:
        raise ValueError("JPEG: progressive AC scan must be single-component")

    reader = _BitReader(payload, data_start)
    dc_pred = [0] * len(comps)
    eobrun = 0
    p1 = 1 << al
    m1 = -p1
    tabs = {ci: (huff_dc.get(td), huff_ac.get(ta)) for ci, td, ta in sel}
    unit_count = 0
    for unit in _scan_units(sel, comps, mcux, mcuy, dims):
        if ri and unit_count and unit_count % ri == 0:
            reader.sync_restart()
            dc_pred = [0] * len(comps)
            eobrun = 0
        unit_count += 1
        for ci, by, bx in unit:
            blk = coefs[ci][by, bx]
            dtab, atab = tabs[ci]
            if sequential:
                t = dtab.decode(reader)
                dc_pred[ci] += _extend(reader.read_bits(t), t)
                blk[0] = dc_pred[ci]
                k = 1
                while k < 64:
                    rs = atab.decode(reader)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r == 15:
                            k += 16  # ZRL
                            continue
                        break  # EOB
                    k += r
                    if k > 63:
                        raise ValueError("JPEG: AC index overflow")
                    blk[k] = _extend(reader.read_bits(s), s)
                    k += 1
            elif dc_scan and ah == 0:  # DC first (G.2.1)
                t = dtab.decode(reader)
                dc_pred[ci] += _extend(reader.read_bits(t), t)
                blk[0] = dc_pred[ci] << al
            elif dc_scan:  # DC refine: one raw bit per block
                if reader.read_bit():
                    blk[0] = int(blk[0]) | p1
            elif ah == 0:  # AC first (G.2.2, EOB-run coded)
                if eobrun:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = atab.decode(reader)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1  # this block is consumed
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise ValueError("JPEG: AC index beyond band")
                    blk[k] = _extend(reader.read_bits(s), s) << al
                    k += 1
            else:  # AC refine (G.1.2.3 / libjpeg decode_mcu_AC_refine)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = atab.decode(reader)
                        r, s = rs >> 4, rs & 0xF
                        newval = 0
                        if s:
                            if s != 1:
                                raise ValueError("JPEG: bad refine size")
                            newval = p1 if reader.read_bit() else m1
                        elif r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.read_bits(r)
                            break  # EOB: corrections continue below
                        while k <= se:
                            v = int(blk[k])
                            if v != 0:
                                if reader.read_bit() and (v & p1) == 0:
                                    blk[k] = v + (p1 if v >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval:
                            if k > se:  # malformed run beyond the band
                                raise ValueError("AC refine index beyond band")
                            blk[k] = newval
                        k += 1
                if eobrun > 0:
                    while k <= se:  # correction bits across the EOB region
                        v = int(blk[k])
                        if v != 0:
                            if reader.read_bit() and (v & p1) == 0:
                                blk[k] = v + (p1 if v >= 0 else m1)
                        k += 1
                    eobrun -= 1


def _idct_planes(coefs, frame, qt):
    """Dequantize + IDCT every accumulated block at once (einsum over the
    whole [bh, bw, 8, 8] grid — no per-block Python), assemble planes."""
    _h, _w, comps = frame
    idct_T = _DCT_M.T.astype(np.float32)
    idct_M = _DCT_M.astype(np.float32)
    planes = []
    for c, (_cid, _hs, _vs, tq) in enumerate(comps):
        qz = qt[tq].reshape(64)[ZIGZAG].astype(np.float32)  # zigzag order
        deq = coefs[c].astype(np.float32) * qz
        nat = np.empty_like(deq)
        nat[..., ZIGZAG] = deq
        bh, bw = nat.shape[:2]
        blocks = nat.reshape(bh, bw, 8, 8)
        px = np.einsum("ij,abjk,kl->abil", idct_T, blocks, idct_M) + 128.0
        planes.append(px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
    return planes


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JPEG -> uint8 [h, w] (grayscale) or [h, w, 3] (RGB).

    Supports baseline sequential (SOF0/1) — interleaved or multi-scan
    non-interleaved — and progressive Huffman (SOF2) with both spectral
    selection and successive approximation: all scans accumulate into
    per-component coefficient grids, then one vectorized dequantize+IDCT
    pass reconstructs the image."""
    frame, qt, scans, progressive, lossless, precision = _parse_jpeg(payload)
    if lossless:
        return _decode_lossless(payload, frame, scans, precision)
    h, w, comps = frame
    geom = _comp_geometry(frame)
    _hmax, _vmax, _mcux, _mcuy, dims = geom

    coefs = [
        np.zeros((bhp, bwp, 64), dtype=np.int32) for bhp, bwp, _bh, _bw in dims
    ]
    covered = set()
    for scan in scans:
        _decode_scan(payload, frame, geom, coefs, scan, sequential=not progressive)
        if scan[1] == 0:  # a DC (or full sequential) scan
            covered.update(ci for ci, _td, _ta in scan[0])
    if covered != set(range(len(comps))):
        raise ValueError(
            "JPEG: scans cover components {} of {}".format(
                sorted(covered), len(comps)
            )
        )

    planes = _idct_planes(coefs, frame, qt)
    hmax, vmax = geom[0], geom[1]
    full = []
    for (plane, (_cid, hs, vs, _tq)) in zip(planes, comps):
        if hs != hmax or vs != vmax:
            plane = plane.repeat(vmax // vs, axis=0).repeat(hmax // hs, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        return np.clip(full[0] + 0.5, 0, 255).astype(np.uint8)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(rgb + 0.5, 0, 255).astype(np.uint8)


# --- lossless (SOF3, T.81 Annex H) ------------------------------------------


def _lossless_predict(plane, x, y, sel, default_pred):
    """T.81 H.1.2 sample prediction (first line -> Ra, first column -> Rb)."""
    if y == 0:
        return default_pred if x == 0 else int(plane[0, x - 1])
    if x == 0:
        return int(plane[y - 1, 0])
    a, b, c = int(plane[y, x - 1]), int(plane[y - 1, x]), int(plane[y - 1, x - 1])
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return c
    if sel == 4:
        return a + b - c
    if sel == 5:
        return a + ((b - c) >> 1)
    if sel == 6:
        return b + ((a - c) >> 1)
    if sel == 7:
        return (a + b) >> 1
    raise ValueError("lossless JPEG predictor {} invalid".format(sel))


def _decode_lossless(payload, frame, scans, precision):
    """Decode a lossless-Huffman JPEG (SOF3): per-sample Huffman category +
    difference bits over predictors 1-7, mod-2^16 reconstruction, restart
    markers resetting prediction.  Only 1x1 sampling is supported (the
    universal case for lossless JPEG)."""
    h, w, comps = frame
    if any(hs != 1 or vs != 1 for _cid, hs, vs, _tq in comps):
        raise NotImplementedError("lossless JPEG with subsampled components")
    planes = [np.zeros((h, w), dtype=np.int32) for _ in comps]
    decoded = set()
    for sel_list, ss, _se, _ah, al, dc_tabs, _ac_tabs, ri, start in scans:
        predictor, pt = ss, al
        default_pred = 1 << (precision - pt - 1)
        reader = _BitReader(payload, start)
        tabs = [dc_tabs[td] for _ci, td, _ta in sel_list]
        scan_planes = [planes[ci] for ci, _td, _ta in sel_list]
        mcu = 0
        reset_pos = (0, 0)  # restart resets prediction as at start of scan
        for y in range(h):
            for x in range(w):
                if ri and mcu == ri:
                    reader.sync_restart()
                    mcu = 0
                    reset_pos = (y, x)
                for plane, tab in zip(scan_planes, tabs):
                    t = tab.decode(reader)
                    if t == 16:
                        diff = 32768
                    elif t:
                        diff = _extend(reader.read_bits(t), t)
                    else:
                        diff = 0
                    if (y, x) == reset_pos:
                        pred = default_pred
                    elif y == reset_pos[0]:
                        pred = int(plane[y, x - 1])  # restart line: Ra
                    elif x == 0:
                        pred = int(plane[y - 1, 0])
                    else:
                        pred = _lossless_predict(plane, x, y, predictor, default_pred)
                    plane[y, x] = (pred + diff) & 0xFFFF
                mcu += 1
        decoded.update(ci for ci, _td, _ta in sel_list)
        if pt:
            for plane in scan_planes:
                plane <<= pt
    if decoded != set(range(len(comps))):
        raise ValueError("lossless JPEG scans cover components {}".format(sorted(decoded)))
    dtype = np.uint8 if precision <= 8 else np.uint16
    out = np.stack([p.astype(dtype) for p in planes], axis=-1)
    return out[:, :, 0] if len(comps) == 1 else out


# canonical table covering every difference category 0..16 (Kraft-valid:
# three 2-bit codes then one code per length 3..16)
_LOSSLESS_BITS = [0, 3] + [1] * 14
_LOSSLESS_VALUES = list(range(17))


def encode_jpeg_lossless(img: np.ndarray, predictor: int = 1,
                         restart_interval: int = 0) -> bytes:
    """uint8 [h, w] or [h, w, 3] -> lossless JPEG (SOF3) bytes.

    Components are stored verbatim (no color transform, per Annex H);
    decoding with :func:`decode_jpeg` is bit-exact."""
    img = np.asarray(img, dtype=np.uint8)
    gray = img.ndim == 2
    arr = img[:, :, None] if gray else img
    h, w, nc = arr.shape
    default_pred = 1 << 7

    table = _huff_encode_table(_LOSSLESS_BITS, _LOSSLESS_VALUES)
    writer = _BitWriter()
    planes = [arr[:, :, c].astype(np.int32) for c in range(nc)]
    mcu = 0
    rst = 0
    reset_pos = (0, 0)
    for y in range(h):
        for x in range(w):
            if restart_interval and mcu == restart_interval:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                mcu = 0
                reset_pos = (y, x)
            for plane in planes:
                if (y, x) == reset_pos:
                    pred = default_pred
                elif y == reset_pos[0]:
                    pred = int(plane[y, x - 1])  # restart line: Ra
                elif x == 0:
                    pred = int(plane[y - 1, 0])
                else:
                    pred = _lossless_predict(plane, x, y, predictor, default_pred)
                diff = (int(plane[y, x]) - pred) & 0xFFFF
                if diff > 32767:
                    diff -= 65536
                if diff == -32768:
                    code, length = table[16]
                    writer.write(code, length)
                else:
                    t, mag = _magnitude(diff)
                    code, length = table[t]
                    writer.write(code, length)
                    if t:
                        writer.write(mag, t)
            mcu += 1
    writer.flush()

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    sof = struct.pack(">BHHB", 8, h, w, nc)
    for c in range(nc):
        sof += bytes([c + 1, 0x11, 0])
    dht = bytes([0x00]) + bytes(_LOSSLESS_BITS) + bytes(_LOSSLESS_VALUES)
    sos = bytes([nc])
    for c in range(nc):
        sos += bytes([c + 1, 0x00])
    sos += bytes([predictor, 0, 0])  # Ss=predictor, Se=0, Ah/Al=0

    out = b"\xff\xd8" + seg(0xC3, sof) + seg(0xC4, dht)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    out += seg(0xDA, sos) + bytes(writer.out) + b"\xff\xd9"
    return out


# --- encoder ----------------------------------------------------------------


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255)


def _huff_encode_table(bits, values):
    """(bits, values) -> {symbol: (code, length)}."""
    return {
        sym: (code, length) for length, code, sym in _canonical_codes(bits, values)
    }


def _magnitude(v: int):
    """value -> (category t, t-bit representation)."""
    t = int(abs(v)).bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def _encode_block(writer, block, quant, dc_pred, dctab, actab):
    coeff = np.round((_DCT_M @ (block - 128.0) @ _DCT_M.T) / quant).astype(np.int64)
    zz = coeff.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - dc_pred
    t, mag = _magnitude(diff)
    code, length = dctab[t]
    writer.write(code, length)
    if t:
        writer.write(mag, t)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = actab[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        t, mag = _magnitude(v)
        code, length = actab[(run << 4) | t]
        writer.write(code, length)
        writer.write(mag, t)
        run = 0
    if last_nz < 63:
        code, length = actab[0x00]  # EOB
        writer.write(code, length)
    return int(zz[0])


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 [h, w] or [h, w, 3] -> baseline JFIF JPEG bytes.

    ``subsampling`` is ``"444"`` or ``"420"`` (2x2 box-mean chroma);
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many MCUs
    (what real encoders do for error resilience — and what exercises the
    decoder's restart path)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    if not gray and img.shape[2] != 3:
        raise ValueError("encode_jpeg expects [h,w] or [h,w,3]")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub = 2 if (subsampling == "420" and not gray) else 1
    h, w = img.shape[:2]
    qy = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )

    def dqt(tid, tab):
        zz = tab.reshape(64)[ZIGZAG].astype(np.uint8)
        return b"\xff\xdb" + struct.pack(">HB", 67, tid) + zz.tobytes()

    out += dqt(0, qy)
    if not gray:
        out += dqt(1, qc)

    nc = 1 if gray else 3
    y_hv = (sub << 4) | sub
    sof = struct.pack(">BHHB", 8, h, w, nc)
    sof += bytes([1, y_hv, 0])
    if not gray:
        sof += bytes([2, 0x11, 1, 3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def dht(tc, th, table):
        bits, values = table
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, HUFF_DC_LUMA) + dht(1, 0, HUFF_AC_LUMA)
    if not gray:
        out += dht(0, 1, HUFF_DC_CHROMA) + dht(1, 1, HUFF_AC_CHROMA)

    sos = bytes([nc, 1, 0x00])
    if not gray:
        sos += bytes([2, 0x11, 3, 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    luma_tabs = (_huff_encode_table(*HUFF_DC_LUMA), _huff_encode_table(*HUFF_AC_LUMA))
    if gray:
        comps = [(img.astype(np.float64), qy, luma_tabs, 1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        chroma_tabs = (
            _huff_encode_table(*HUFF_DC_CHROMA),
            _huff_encode_table(*HUFF_AC_CHROMA),
        )
        if sub == 2:
            # pad to even then 2x2 box-mean subsample the chroma planes
            eh, ew = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            sub2 = []
            for p in (cb, cr):
                pp = np.empty((eh, ew), dtype=np.float64)
                pp[:h, :w] = p
                pp[h:, :w] = p[h - 1 : h, :]
                pp[:, w:] = pp[:, w - 1 : w]
                sub2.append(pp.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3)))
            cb, cr = sub2
        comps = [
            (y, qy, luma_tabs, sub, sub),
            (cb, qc, chroma_tabs, 1, 1),
            (cr, qc, chroma_tabs, 1, 1),
        ]

    mcuw, mcuh = 8 * sub, 8 * sub
    mcux = (w + mcuw - 1) // mcuw
    mcuy = (h + mcuh - 1) // mcuh
    padded = []
    for p, quant, tabs, hs, vs in comps:
        ph_i, pw_i = mcuy * vs * 8, mcux * hs * 8
        pp = np.empty((ph_i, pw_i), dtype=np.float64)
        sh, sw = p.shape
        pp[:sh, :sw] = p
        pp[sh:, :sw] = p[sh - 1 : sh, :]  # edge-replicate pad
        pp[:, sw:] = pp[:, sw - 1 : sw]
        padded.append(pp)

    writer = _BitWriter()
    dc_pred = [0] * nc
    mcu_count = 0
    rst_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()  # byte-align
                writer.out += bytes([0xFF, 0xD0 + rst_idx])
                rst_idx = (rst_idx + 1) % 8
                dc_pred = [0] * nc
            mcu_count += 1
            for ci, (_p, quant, tabs, hs, vs) in enumerate(comps):
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        dc_pred[ci] = _encode_block(
                            writer, block, quant, dc_pred[ci], tabs[0], tabs[1]
                        )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- progressive encoder -----------------------------------------------------
#
# Exists so tests can round-trip the progressive decoder without any external
# codec (the reference gets progressive files free via PIL).  The scan script
# mirrors the classic libjpeg default: DC with one bit of successive
# approximation, per-component spectral-selection AC bands, then refinement
# passes down to full precision.

# AC table for progressive scans: AC-first scans emit EOBn symbols
# (r<<4 | 0, r = 0..14) that the Annex-K baseline tables don't contain, so
# use one flat canonical table holding every symbol we may emit — 176
# symbols, all 8 bits long (Kraft 176/256 < 1; the all-ones byte stays
# reserved per T.81 C.2).
_PROG_AC = (
    [0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0, 0],
    sorted(
        [(r << 4) for r in range(15)]          # EOB0..EOB14 (run-length classes)
        + [0xF0]                               # ZRL
        + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    ),
)


def _plane_coef_grid(plane: np.ndarray, quant: np.ndarray) -> np.ndarray:
    """Padded plane [bh*8, bw*8] -> quantized zigzag coefficients
    [bh, bw, 64] int32, whole grid in one einsum."""
    bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
    blocks = plane.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
    coef = np.einsum("ij,abjk,kl->abil", _DCT_M, blocks - 128.0, _DCT_M.T)
    nat = np.round(coef / quant).astype(np.int32).reshape(bh, bw, 64)
    return nat[..., ZIGZAG]


def _emit_eobrun(writer, actab, eobrun: int) -> int:
    if eobrun:
        r = eobrun.bit_length() - 1
        code, length = actab[r << 4]
        writer.write(code, length)
        if r:
            writer.write(eobrun - (1 << r), r)
    return 0


def _enc_ac_first(writer, grid, bh, bw, ss, se, al, actab):
    """AC first scan over one component's block grid (T.81 G.1.2.2):
    point-transformed band, run/size symbols, EOB-run accumulation."""
    eobrun = 0
    for by in range(bh):
        for bx in range(bw):
            band = grid[by, bx, ss : se + 1].astype(np.int64)
            av = np.abs(band) >> al
            vals = np.where(band >= 0, av, -av)
            nz = np.flatnonzero(vals)
            if len(nz) == 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    eobrun = _emit_eobrun(writer, actab, eobrun)
                continue
            eobrun = _emit_eobrun(writer, actab, eobrun)
            prev = -1
            for i in nz:
                r = int(i) - prev - 1
                prev = int(i)
                while r > 15:
                    code, length = actab[0xF0]
                    writer.write(code, length)
                    r -= 16
                t, mag = _magnitude(int(vals[i]))
                code, length = actab[(r << 4) | t]
                writer.write(code, length)
                writer.write(mag, t)
            if int(nz[-1]) < se - ss:  # trailing zeros: block ends in EOB
                eobrun += 1
                if eobrun == 0x7FFF:
                    eobrun = _emit_eobrun(writer, actab, eobrun)
    _emit_eobrun(writer, actab, eobrun)


def _enc_ac_refine(writer, grid, bh, bw, ss, se, al, actab):
    """AC refinement scan (T.81 G.1.2.3): newly-visible coefficients as
    run/1 symbols with sign bits, correction bits for already-nonzero
    history interleaved exactly where the decoder's advance loop reads
    them, per-block EOB (run length 1) closing each band."""
    p1 = 1 << al
    for by in range(bh):
        for bx in range(bw):
            band = grid[by, bx, ss : se + 1].astype(np.int64)
            av = np.abs(band) >> al
            newly = np.flatnonzero(av == 1)
            kend = int(newly[-1]) if len(newly) else -1
            seq = []  # ('z',) zero-history | ('c', bit) correction, in order
            for i in range(kend + 1):
                if av[i] == 0:
                    seq.append(("z", 0))
                elif av[i] > 1:
                    seq.append(("c", int(av[i] & 1)))
                else:  # newly visible: flush ZRLs, emit run/1 + sign + bits
                    while sum(1 for t, _ in seq if t == "z") > 15:
                        code, length = actab[0xF0]
                        writer.write(code, length)
                        zseen = 0
                        while zseen < 16:  # consume through the 16th zero
                            t, bit = seq.pop(0)
                            if t == "z":
                                zseen += 1
                            else:
                                writer.write(bit, 1)
                    r = sum(1 for t, _ in seq if t == "z")
                    code, length = actab[(r << 4) | 1]
                    writer.write(code, length)
                    writer.write(1 if band[i] > 0 else 0, 1)
                    for t, bit in seq:
                        if t == "c":
                            writer.write(bit, 1)
                    seq = []
            if kend < se - ss:  # EOB region: close block, correct history
                code, length = actab[0x00]
                writer.write(code, length)
                for i in range(kend + 1, se - ss + 1):
                    if av[i] > 1:
                        writer.write(int(av[i] & 1), 1)


def encode_jpeg_progressive(
    img: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """uint8 [h, w] or [h, w, 3] -> progressive (SOF2) JFIF JPEG bytes,
    spectral selection + 1 bit of successive approximation (the libjpeg
    default scan script shape).  Same quantization as :func:`encode_jpeg`,
    so both encodings decode to the same pixels."""
    img = np.asarray(img)
    gray = img.ndim == 2
    if not gray and img.shape[2] != 3:
        raise ValueError("encode_jpeg_progressive expects [h,w] or [h,w,3]")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub = 2 if (subsampling == "420" and not gray) else 1
    h, w = img.shape[:2]
    qy = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    # component planes (same color/subsample prep as the baseline encoder)
    if gray:
        planes = [(img.astype(np.float64), qy, 1, 1)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if sub == 2:
            eh, ew = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            sub2 = []
            for p in (cb, cr):
                pp = np.empty((eh, ew), dtype=np.float64)
                pp[:h, :w] = p
                pp[h:, :w] = p[h - 1 : h, :]
                pp[:, w:] = pp[:, w - 1 : w]
                sub2.append(pp.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3)))
            cb, cr = sub2
        planes = [(y, qy, sub, sub), (cb, qc, 1, 1), (cr, qc, 1, 1)]

    comps_meta = [(c + 1, hs, vs, 0 if c == 0 else 1) for c, (_p, _q, hs, vs) in enumerate(planes)]
    frame = (h, w, comps_meta)
    _hmax, _vmax, mcux, mcuy, dims = _comp_geometry(frame)

    grids = []
    for (p, quant, hs, vs), (bhp, bwp, _bh, _bw) in zip(planes, dims):
        pp = np.empty((bhp * 8, bwp * 8), dtype=np.float64)
        sh, sw = p.shape
        pp[:sh, :sw] = p
        pp[sh:, :sw] = p[sh - 1 : sh, :]
        pp[:, sw:] = pp[:, sw - 1 : sw]
        grids.append(_plane_coef_grid(pp, quant))

    nc = len(planes)
    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )

    def dqt(tid, tab):
        zz = tab.reshape(64)[ZIGZAG].astype(np.uint8)
        return b"\xff\xdb" + struct.pack(">HB", 67, tid) + zz.tobytes()

    out += dqt(0, qy)
    if not gray:
        out += dqt(1, qc)

    sof = struct.pack(">BHHB", 8, h, w, nc)
    for cid, hs, vs, tq in comps_meta:
        sof += bytes([cid, (hs << 4) | vs, tq])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(tc, th, table):
        bits, values = table
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, HUFF_DC_LUMA) + dht(1, 0, _PROG_AC)
    if not gray:
        out += dht(0, 1, HUFF_DC_CHROMA)
    dc_enc = [_huff_encode_table(*HUFF_DC_LUMA), _huff_encode_table(*HUFF_DC_CHROMA)]
    ac_enc = _huff_encode_table(*_PROG_AC)

    # libjpeg-style scan script: (comp list, Ss, Se, Ah, Al)
    if gray:
        script = [
            ([0], 0, 0, 0, 1), ([0], 1, 5, 0, 2), ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1), ([0], 0, 0, 1, 0), ([0], 1, 63, 1, 0),
        ]
    else:
        script = [
            ([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2), ([1], 1, 63, 0, 1), ([2], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2), ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([1], 1, 63, 1, 0), ([2], 1, 63, 1, 0), ([0], 1, 63, 1, 0),
        ]

    for cis, ss, se, ah, al, in script:
        sos = bytes([len(cis)])
        for ci in cis:
            td = 0 if ci == 0 else 1
            sos += bytes([comps_meta[ci][0], (td << 4) | 0])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

        writer = _BitWriter()
        if ss == 0 and ah == 0:  # DC first: interleaved over the MCU grid
            sel = [(ci, 0, 0) for ci in cis]
            pred = [0] * nc
            for unit in _scan_units(sel, comps_meta, mcux, mcuy, dims):
                for ci, by, bx in unit:
                    v = int(grids[ci][by, bx, 0]) >> al
                    t, mag = _magnitude(v - pred[ci])
                    pred[ci] = v
                    code, length = dc_enc[0 if ci == 0 else 1][t]
                    writer.write(code, length)
                    if t:
                        writer.write(mag, t)
        elif ss == 0:  # DC refine: one raw bit per block
            sel = [(ci, 0, 0) for ci in cis]
            for unit in _scan_units(sel, comps_meta, mcux, mcuy, dims):
                for ci, by, bx in unit:
                    writer.write((int(grids[ci][by, bx, 0]) >> al) & 1, 1)
        else:
            ci = cis[0]
            _bhp, _bwp, bh, bw = dims[ci]
            if ah == 0:
                _enc_ac_first(writer, grids[ci], bh, bw, ss, se, al, ac_enc)
            else:
                _enc_ac_refine(writer, grids[ci], bh, bw, ss, se, al, ac_enc)
        writer.flush()
        out += writer.out

    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_multiscan(img: np.ndarray, quality: int = 90) -> bytes:
    """uint8 [h, w, 3] -> sequential (SOF0) JPEG with one NON-INTERLEAVED
    scan per component — the legal multi-scan baseline layout real
    encoders emit for large images (T.81 A.2.2).  Exercises the decoder's
    per-component block-raster traversal; 4:4:4 only."""
    img = np.asarray(img)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_jpeg_multiscan expects [h,w,3]")
    h, w = img.shape[:2]
    qy = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)

    rgb = img.astype(np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    out = bytearray(b"\xff\xd8")
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    for tid, tab in ((0, qy), (1, qc)):
        zz = tab.reshape(64)[ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + zz.tobytes()
    sof = struct.pack(">BHHB", 8, h, w, 3)
    sof += bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for tc, th, table in (
        (0, 0, HUFF_DC_LUMA), (1, 0, HUFF_AC_LUMA),
        (0, 1, HUFF_DC_CHROMA), (1, 1, HUFF_AC_CHROMA),
    ):
        bits, values = table
        body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    bh, bw = (h + 7) // 8, (w + 7) // 8
    tabs = [
        (qy, _huff_encode_table(*HUFF_DC_LUMA), _huff_encode_table(*HUFF_AC_LUMA)),
        (qc, _huff_encode_table(*HUFF_DC_CHROMA), _huff_encode_table(*HUFF_AC_CHROMA)),
    ]
    for ci, plane in enumerate((y, cb, cr)):
        quant, dctab, actab = tabs[0 if ci == 0 else 1]
        pp = np.empty((bh * 8, bw * 8), dtype=np.float64)
        pp[:h, :w] = plane
        pp[h:, :w] = plane[h - 1 : h, :]
        pp[:, w:] = pp[:, w - 1 : w]
        td = 0 if ci == 0 else 1
        sos = bytes([1, ci + 1, (td << 4) | td, 0, 63, 0])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        writer = _BitWriter()
        pred = 0
        for by in range(bh):
            for bx in range(bw):
                pred = _encode_block(
                    writer, pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
                    quant, pred, dctab, actab,
                )
        writer.flush()
        out += writer.out
    out += b"\xff\xd9"
    return bytes(out)
