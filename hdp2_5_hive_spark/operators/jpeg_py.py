"""Baseline JPEG codec from scratch — stdlib + numpy only.

The container ships no image codec libraries, but baseline JPEG is a
fully public format (ITU-T T.81 / ISO 10918-1): marker segments, 8x8
DCT blocks, scalar quantization, zigzag run-length + Huffman entropy
coding. This module implements

- a general baseline DECODER: marker walk (DQT/SOF0/DHT/DRI/SOS),
  canonical Huffman table construction from the file's own DHT bits/
  values, bit-unstuffing entropy reader, DC prediction + restart
  intervals, dequantize -> un-zigzag -> 2D IDCT (numpy matrix form),
  YCbCr->RGB with JFIF coefficients. Grayscale and 4:4:4 color; the
  subsampled layouts raise a clear error (no silent wrong pixels).
- an ENCODER used by tests/fixtures: same math forward; it declares
  its own fixed-length canonical Huffman tables in DHT (valid per the
  spec — decoders must use the declared tables), so no standard-table
  transcription is involved.

Why both: encode->decode forms a closed loop a bytes-blind oracle can
check (block-constant fixtures + unit quant tables round-trip EXACTLY
— DC-only blocks incur no quantization or IDCT rounding error), while
property tests drive random images through lossy tables and bound the
reconstruction error by the quantization step.

Reference surface parity: the Hive reference decodes self-describing
formats at scan time via SerDes (``serde/.../avro/AvroSerDe.java``,
``ql/io/parquet``); this is the same decode-at-the-edge contract for
multimodal payload columns (SURVEY.md LLM-pipeline extensions).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared constants
# ---------------------------------------------------------------------------

# zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
_ZZ: list[tuple[int, int]] = []
for s in range(15):
    ij = [(i, s - i) for i in range(s + 1) if i < 8 and s - i < 8]
    _ZZ.extend(ij if s % 2 else ij[::-1])
ZIGZAG = _ZZ
# flat index form for vectorized (de)zigzag
_ZZ_FLAT = np.array([r * 8 + c for r, c in ZIGZAG], dtype=np.int64)

# orthonormal 8-point DCT-II basis: D[u, x] = c(u)/2 * cos((2x+1)u*pi/16)
_D = np.zeros((8, 8))
for u in range(8):
    cu = (1 / np.sqrt(2)) if u == 0 else 1.0
    for x in range(8):
        _D[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)


def fdct2(block: np.ndarray) -> np.ndarray:
    """2-D forward DCT of one 8x8 block (float64)."""
    return _D @ block @ _D.T


def idct2(coef: np.ndarray) -> np.ndarray:
    """2-D inverse DCT of one 8x8 coefficient block (float64)."""
    return _D.T @ coef @ _D


UNIT_QTABLE = np.ones((8, 8), dtype=np.int64)
# a deterministic non-trivial table for lossy tests: coarser at high
# frequency, like every real-world table
LOSSY_QTABLE = (1 + np.add.outer(np.arange(8), np.arange(8)) * 3).astype(
    np.int64
)


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF color transform, rounded + clipped to uint8 planes."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _category(v: int) -> int:
    """JPEG magnitude category: number of bits in |v|."""
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------------------
# bit IO with 0xFF stuffing
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing (T.81 F.1.2.3)

    def flush(self) -> bytes:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.out)


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops AT any other
    marker (leaves position on the 0xFF)."""

    def __init__(self, buf: bytes, pos: int) -> None:
        self.buf = buf
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.buf):
            # truncated entropy segment (file cut mid-scan): a bare
            # buf[pos] raised IndexError — corrupt-input uniformity
            # (r9 hardening rule) wants ValueError everywhere
            raise ValueError("jpeg_py: truncated entropy segment")
        b = self.buf[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.buf):
                raise ValueError("jpeg_py: truncated entropy segment")
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise _MarkerReached(0xFF00 | nxt)
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int:
        """Skip pad bits + return the next marker (for RSTn)."""
        self._acc = 0
        self._n = 0
        while (
            self.pos + 1 < len(self.buf)
            and (
                self.buf[self.pos] != 0xFF
                or self.buf[self.pos + 1] == 0x00
            )
        ):
            self.pos += 1
        if self.pos + 1 >= len(self.buf):
            raise ValueError("jpeg_py: truncated entropy segment")
        marker = 0xFF00 | self.buf[self.pos + 1]
        self.pos += 2
        return marker


class _MarkerReached(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


# ---------------------------------------------------------------------------
# Huffman tables
# ---------------------------------------------------------------------------


def _canonical_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical construction of
    T.81 Annex C (generate_size_table / generate_code_table)."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_map(bits: list[int], values: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for bit-serial decoding."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, values).items()
    }


def _flat_table(symbols: list[int], length: int) -> tuple[list[int], list[int]]:
    """A fixed-length canonical table declaring every symbol at the
    same code length — trivially valid (n <= 2^L - 1 keeps the
    all-ones code unused) and spec-conformant, since decoders use the
    DECLARED table, not an assumed one."""
    if len(symbols) > (1 << length) - 1:
        raise ValueError("too many symbols for code length")
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return bits, list(symbols)


# encoder-side tables: DC categories 0..11 at 5 bits; all 162 AC
# run/size symbols at 9 bits
_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_ENC_DC_BITS, _ENC_DC_VALS = _flat_table(_DC_SYMBOLS, 5)
_ENC_AC_BITS, _ENC_AC_VALS = _flat_table(_AC_SYMBOLS, 9)
_ENC_DC = _canonical_codes(_ENC_DC_BITS, _ENC_DC_VALS)
_ENC_AC = _canonical_codes(_ENC_AC_BITS, _ENC_AC_VALS)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _encode_block(
    w: _BitWriter,
    block: np.ndarray,
    qtable: np.ndarray,
    dc_pred: int,
) -> int:
    """FDCT + quantize + entropy-encode one 8x8 sample block; returns
    the new DC predictor."""
    coef = fdct2(block.astype(np.float64) - 128.0)
    q = np.round(coef / qtable).astype(np.int64)
    zz = q.reshape(64)[_ZZ_FLAT]
    # DC
    diff = int(zz[0]) - dc_pred
    cat = _category(diff)
    code, length = _ENC_DC[cat]
    w.write(code, length)
    if cat:
        amp = diff if diff >= 0 else diff + (1 << cat) - 1
        w.write(amp, cat)
    # AC
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, ln = _ENC_AC[0xF0]  # ZRL
            w.write(c, ln)
            run -= 16
        cat = _category(v)
        c, ln = _ENC_AC[(run << 4) | cat]
        w.write(c, ln)
        amp = v if v >= 0 else v + (1 << cat) - 1
        w.write(amp, cat)
        run = 0
    if run:
        c, ln = _ENC_AC[0x00]  # EOB
        w.write(c, ln)
    return int(zz[0])


def encode_jpeg(
    width: int,
    height: int,
    rgb,
    *,
    qtable: np.ndarray | None = None,
    grayscale: bool = False,
) -> bytes:
    """Baseline JFIF encoder. ``rgb`` is an (h*w*3,) uint8 buffer (or
    (h*w,) when ``grayscale``). Color is 4:4:4 (no subsampling);
    quant table defaults to UNIT_QTABLE (all ones => block-constant
    images round-trip exactly)."""
    qt = (qtable if qtable is not None else UNIT_QTABLE).astype(np.int64)
    if grayscale:
        planes = [
            np.asarray(rgb, dtype=np.uint8).reshape(height, width)
        ]
    else:
        arr = np.asarray(rgb, dtype=np.uint8).reshape(height, width, 3)
        ycc = _rgb_to_ycbcr(arr)
        planes = [ycc[..., i] for i in range(3)]
    n_comp = len(planes)

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(
        0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )  # APP0
    out += _seg(
        0xFFDB, b"\x00" + qt.reshape(64)[_ZZ_FLAT].astype(np.uint8).tobytes()
    )  # DQT id 0, 8-bit, zigzag order
    sof = struct.pack(">BHHB", 8, height, width, n_comp)
    for c in range(n_comp):
        sof += bytes([c + 1, 0x11, 0])  # id, 1x1 sampling, qtable 0
    out += _seg(0xFFC0, sof)  # SOF0 baseline
    out += _seg(
        0xFFC4,
        b"\x00" + bytes(_ENC_DC_BITS) + bytes(_ENC_DC_VALS),
    )  # DHT DC 0
    out += _seg(
        0xFFC4,
        b"\x10" + bytes(_ENC_AC_BITS) + bytes(_ENC_AC_VALS),
    )  # DHT AC 0
    sos = bytes([n_comp])
    for c in range(n_comp):
        sos += bytes([c + 1, 0x00])  # DC table 0 / AC table 0
    sos += b"\x00\x3f\x00"  # spectral selection 0..63, Ah/Al 0
    out += _seg(0xFFDA, sos)

    # pad each plane to 8 by edge replication
    ph = -(-height // 8) * 8
    pw = -(-width // 8) * 8
    padded = [
        np.pad(p, ((0, ph - height), (0, pw - width)), mode="edge")
        for p in planes
    ]
    w = _BitWriter()
    preds = [0] * n_comp
    for by in range(ph // 8):
        for bx in range(pw // 8):
            for c in range(n_comp):
                blk = padded[c][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                preds[c] = _encode_block(w, blk, qt, preds[c])
    out += w.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def _extend(amp: int, cat: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the ``cat`` amplitude bits to the
    signed value."""
    return amp if amp >= (1 << (cat - 1)) else amp - (1 << cat) + 1


def _decode_block(
    r: _BitReader,
    dc_map: dict[tuple[int, int], int],
    ac_map: dict[tuple[int, int], int],
    qtable: np.ndarray,
    dc_pred: int,
) -> tuple[np.ndarray, int]:
    def huff(table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | r.bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg_py: invalid Huffman code")

    zz = np.zeros(64, dtype=np.int64)
    cat = huff(dc_map)
    diff = _extend(r.bits(cat), cat) if cat else 0
    dc = dc_pred + diff
    zz[0] = dc
    k = 1
    while k < 64:
        sym = huff(ac_map)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, cat = sym >> 4, sym & 0x0F
        k += run
        if k > 63:
            raise ValueError("jpeg_py: AC run past block end")
        zz[k] = _extend(r.bits(cat), cat)
        k += 1
    coef = np.zeros(64, dtype=np.float64)
    coef[_ZZ_FLAT] = zz * qtable.reshape(64)[_ZZ_FLAT]
    block = idct2(coef.reshape(8, 8)) + 128.0
    return np.clip(np.round(block), 0, 255).astype(np.uint8), dc


def decode_jpeg(payload: bytes) -> tuple[int, int, np.ndarray]:
    """General baseline decoder -> (width, height, rgb[h,w,3] uint8).
    Grayscale output is replicated across the three channels.
    Supports: baseline sequential DCT (SOF0), 8-bit quant tables,
    restart intervals, grayscale or 4:4:4. Subsampled chroma and
    progressive files raise ValueError — never silent wrong pixels.
    """
    if payload is None or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    dc_maps: dict[int, dict] = {}
    ac_maps: dict[int, dict] = {}
    comps: list[tuple[int, int, int]] = []  # (id, sampling, qtable id)
    scan: list[tuple[int, int, int]] = []  # (comp idx, dc id, ac id)
    h = w = 0
    restart = 0
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("jpeg_py: expected marker")
        marker = 0xFF00 | payload[pos + 1]
        if marker == 0xFFD9:  # EOI
            break
        (size,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + size]
        pos += 2 + size
        if marker == 0xFFDB:  # DQT (possibly several tables)
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0x0F
                if prec != 0:
                    raise ValueError("jpeg_py: only 8-bit quant tables")
                zzq = np.frombuffer(
                    body[b + 1 : b + 65], dtype=np.uint8
                ).astype(np.int64)
                qt = np.zeros(64, dtype=np.int64)
                qt[_ZZ_FLAT] = zzq
                qtables[tid] = qt.reshape(8, 8)
                b += 65
        elif marker == 0xFFC4:  # DHT (possibly several tables)
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                values = list(body[b + 17 : b + 17 + n])
                # truncated DHT: _canonical_codes indexes values[k]
                # for every declared code — short values raised a
                # bare IndexError
                if len(bits) < 16 or len(values) < n:
                    raise ValueError("jpeg_py: truncated DHT segment")
                (dc_maps if cls == 0 else ac_maps)[tid] = _decode_map(
                    bits, values
                )
                b += 17 + n
        elif marker == 0xFFC0:  # SOF0 baseline
            _, h, w, n_comp = struct.unpack(">BHHB", body[:6])
            for c in range(n_comp):
                cid, samp, qid = body[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError(
                        "jpeg_py: only 4:4:4 / grayscale (1x1 sampling)"
                    )
                comps.append((cid, samp, qid))
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3):
            raise ValueError("jpeg_py: only baseline (SOF0) supported")
        elif marker == 0xFFDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xFFDA:  # SOS -> entropy data follows
            if not body:
                raise ValueError("jpeg_py: truncated SOS segment")
            n_scan = body[0]
            for c in range(n_scan):
                pair = body[1 + 2 * c : 3 + 2 * c]
                if len(pair) < 2:
                    raise ValueError("jpeg_py: truncated SOS segment")
                cid, tables = pair
                # a scan naming a component id absent from SOF raised
                # a bare StopIteration out of next()
                idx = next(
                    (
                        i
                        for i, (ci, _, _) in enumerate(comps)
                        if ci == cid
                    ),
                    None,
                )
                if idx is None:
                    raise ValueError(
                        f"jpeg_py: SOS names unknown component {cid}"
                    )
                scan.append((idx, tables >> 4, tables & 0x0F))
            break
    if not comps or not scan or h == 0:
        raise ValueError("jpeg_py: missing SOF/SOS")
    for ci, dcid, acid in scan:
        if (
            comps[ci][2] not in qtables
            or dcid not in dc_maps
            or acid not in ac_maps
        ):
            raise ValueError(
                "jpeg_py: scan references an undeclared DQT/DHT table"
            )

    n_comp = len(comps)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    planes = [np.zeros((ph, pw), dtype=np.uint8) for _ in range(n_comp)]
    r = _BitReader(payload, pos)
    preds = [0] * n_comp
    n_mcu = (ph // 8) * (pw // 8)
    mcus_per_row = pw // 8
    mcu = 0
    while mcu < n_mcu:
        by, bx = divmod(mcu, mcus_per_row)
        try:
            for ci, dcid, acid in scan:
                qt = qtables[comps[ci][2]]
                block, preds[ci] = _decode_block(
                    r, dc_maps[dcid], ac_maps[acid], qt, preds[ci]
                )
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
        except _MarkerReached as m:
            if 0xFFD0 <= m.marker <= 0xFFD7:  # stray RSTn
                preds = [0] * n_comp
                # consume the marker: _fill raises WITHOUT advancing
                # past it, so restarting the reader at r.pos re-read
                # the same 0xFFDn forever — an infinite loop on any
                # corrupt file with an unexpected RSTn mid-scan
                r = _BitReader(payload, r.pos + 2)
                continue
            raise ValueError(
                f"jpeg_py: unexpected marker {m.marker:#x} mid-scan"
            ) from None
        mcu += 1
        if restart and mcu % restart == 0 and mcu < n_mcu:
            marker = r.align_to_marker()
            if not 0xFFD0 <= marker <= 0xFFD7:
                raise ValueError("jpeg_py: expected RSTn at restart")
            preds = [0] * n_comp
            r = _BitReader(payload, r.pos)

    planes = [p[:h, :w] for p in planes]
    if n_comp == 1:
        rgb = np.stack([planes[0]] * 3, axis=-1)
    elif n_comp == 3:
        rgb = _ycbcr_to_rgb(np.stack(planes, axis=-1))
    else:
        raise ValueError("jpeg_py: unsupported component count")
    return w, h, rgb
