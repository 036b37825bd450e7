"""Pure-Python/NumPy baseline JPEG codec (stdlib only, no libjpeg).

Closes the one real-corpus multimodal gap (VERDICT r2 #6): real image
corpora are JPEG-heavy, and the runtime has no libjpeg/PIL. This is a
from-the-spec (ITU-T T.81 / RFC 2435-style baseline sequential DCT)
implementation:

- **Decoder** (`decode_jpeg`): segment walk (APPn/COM/DQT/DHT/SOF0/
  DRI/SOS), canonical Huffman table construction from DHT, entropy
  decode with byte-unstuffing and RSTn handling, DC prediction,
  zigzag → dequant → 8×8 IDCT (orthonormal DCT matrix, vectorized
  over all blocks), sampling-factor upsampling (replication), and
  YCbCr→RGB (CCIR 601) for 3-component images. Baseline 8-bit only;
  progressive (SOF2) and arithmetic coding are rejected explicitly.
- **Encoder** (`encode_jpeg`): forward DCT → quantize → zigzag →
  DC-delta/AC run-length Huffman encoding, 4:4:4 or grayscale,
  emitting the DQT/DHT tables it uses (decoders read tables from the
  stream, so the payloads are self-contained valid JPEGs). Exists to
  make the decoder testable offline: with an all-ones quant table,
  constant 8×8 tiles round-trip EXACTLY (DC-only blocks suffer no
  quantization or IDCT rounding loss), which is what gives the driver
  query a closed-form value oracle (plans/llm19.py).

Scale: both directions run inside Arrow-batched ``mapInPandas``
(llm/multimodal.py plumbing) — per-row Python cost is the decode
itself, the IDCT/DCT are vectorized over all blocks of an image, and
payloads never enter a shuffle.
"""

from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------------
# shared tables


def zigzag_order() -> np.ndarray:
    """The 64-entry zigzag scan order, generated (not hardcoded) by
    walking the anti-diagonals of an 8×8 grid."""
    order = []
    for s in range(15):
        diag = [(y, s - y) for y in range(8) if 0 <= s - y < 8]
        if s % 2 == 0:
            diag.reverse()  # up-right on even diagonals
        order.extend(diag)
    return np.array([y * 8 + x for y, x in order], dtype=np.int64)


_ZIGZAG = zigzag_order()
_UNZIGZAG = np.argsort(_ZIGZAG)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis; forward F = D f Dᵀ, inverse
    f = Dᵀ F D — exactly the JPEG normalization."""
    k = np.arange(8)
    d = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16) * np.sqrt(2 / 8)
    d[0, :] = np.sqrt(1 / 8)
    return d


_D = _dct_matrix()

# Standard Annex-K-style Huffman table *shapes* (bits, values). Used
# by the ENCODER only — the decoder always builds its tables from the
# DHT segments in the stream, so parity with the spec tables is not a
# correctness requirement, just interchange hygiene.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
# A compact general-purpose AC table: every (run, size) symbol with
# run 0-15 and size 1-10, plus EOB (0x00) and ZRL (0xF0), assigned by
# canonical code from frequency-agnostic ordering. Built as a valid
# canonical table below.


def _canonical_lengths(symbols: list[int]) -> tuple[list[int], list[int]]:
    """Assign code lengths to AC symbols: short codes to the symbols
    short-run/small-size encoders emit most. Deterministic, valid
    (Kraft sum ≤ 1), ≤16 bits."""
    ordered = sorted(
        symbols,
        key=lambda s: ((s >> 4) + (s & 0xF), s),  # run+size, then symbol
    )
    bits = [0] * 16
    lengths = []
    # simple valid assignment: fill lengths so that Kraft inequality
    # holds — 2 symbols at 2 bits, 4 at 4 bits, then grow
    budget = [(2, 2), (4, 4), (8, 6), (16, 8), (32, 10), (256, 16)]
    idx = 0
    for count, ln in budget:
        take = min(count, len(ordered) - idx)
        for _ in range(take):
            lengths.append(ln)
            bits[ln - 1] += 1
            idx += 1
        if idx == len(ordered):
            break
    return bits, ordered


_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_BITS, _AC_VALS = _canonical_lengths(_AC_SYMBOLS)


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol → (code, length)."""
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


# encoder code tables are pure functions of the module-constant table
# shapes — built once at import, not per encode_jpeg call (guide §4.5:
# amortize fixed init; the encoder runs per image row inside
# mapInPandas workers, so a per-call rebuild multiplied by the corpus)
_DC_CODES = _build_codes(_DC_BITS, _DC_VALS)
_AC_CODES = _build_codes(_AC_BITS, _AC_VALS)


# ------------------------------------------------------------------
# bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self) -> None:
        """Consume an RSTn marker at a byte boundary."""
        self.acc = 0
        self.nbits = 0
        assert self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int) -> None:
        self.marker = marker


class _HuffDecoder:
    """Canonical Huffman decode table from DHT (bits, vals): walks one
    bit at a time against per-length first-code offsets (max 16 steps,
    no tree allocation)."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_ptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.val_ptr[ln] = k
                self.min_code[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.max_code[ln] = code - 1
            code <<= 1
        self.vals = vals

    def decode(self, br: _BitReader) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | br.read_bit()
            if self.max_code[ln] >= 0 and code <= self.max_code[ln]:
                return self.vals[self.val_ptr[ln] + code - self.min_code[ln]]
        raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, size: int) -> int:
    """JPEG sign extension: a `size`-bit magnitude to signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ------------------------------------------------------------------
# decoder


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG → uint8 ndarray (H, W, C), C∈{1,3}.
    3-component images are converted YCbCr→RGB (CCIR 601, the JFIF
    convention); 1-component images return the Y plane."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    while pos < len(payload):
        assert payload[pos] == 0xFF, "segment misalignment"
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # parameterless
        (seglen,) = struct.unpack_from(">H", payload, pos)
        seg = payload[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                off += 1
                if pq == 0:
                    q = np.frombuffer(seg, np.uint8, 64, off).astype(np.int64)
                    off += 64
                else:
                    q = np.frombuffer(seg, ">u2", 64, off).astype(np.int64)
                    off += 128
                qtables[tq] = q
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                bits = list(seg[off + 1 : off + 17])
                n = sum(bits)
                vals = list(seg[off + 17 : off + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffDecoder(bits, vals)
                off += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            _prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0x{marker:02x}) not supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = struct.unpack_from(">BB", seg, 1 + 2 * i)
                scan.append({"id": cs, "td": tdta >> 4, "ta": tdta & 0xF})
            pos += seglen
            return _decode_scan(
                payload, pos, frame, scan, qtables, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seglen
    raise ValueError("no SOS segment — empty JPEG")


def _decode_scan(
    data, pos, frame, scan, qtables, huff_dc, huff_ac, restart_interval
) -> np.ndarray:
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    by_id = {c["id"]: c for c in comps}
    interleaved = len(scan) > 1
    # per-component coefficient planes (in blocks)
    planes = {}
    for c in comps:
        if interleaved:
            bw, bh = mcus_x * c["h"], mcus_y * c["v"]
        else:
            bw = (w * c["h"] // hmax + 7) // 8
            bh = (h * c["v"] // vmax + 7) // 8
        planes[c["id"]] = np.zeros((bh, bw, 64), np.int64)
    br = _BitReader(data, pos)
    pred = dict.fromkeys(by_id, 0)
    mcu_count = 0

    def decode_block(sc) -> np.ndarray:
        coeffs = np.zeros(64, np.int64)
        t = huff_dc[sc["td"]].decode(br)
        diff = _extend(br.read_bits(t), t) if t else 0
        pred[sc["id"]] += diff
        coeffs[0] = pred[sc["id"]]
        k = 1
        while k < 64:
            rs = huff_ac[sc["ta"]].decode(br)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                break  # EOB
            k += r
            coeffs[k] = _extend(br.read_bits(s), s)
            k += 1
        return coeffs

    def maybe_restart() -> None:
        nonlocal mcu_count
        mcu_count += 1
        if restart_interval and mcu_count % restart_interval == 0:
            total = (
                mcus_x * mcus_y
                if interleaved
                else planes[scan[0]["id"]].shape[0]
                * planes[scan[0]["id"]].shape[1]
            )
            if mcu_count < total:
                br.sync_restart()
                for k in pred:
                    pred[k] = 0

    if interleaved:
        for my in range(mcus_y):
            for mx in range(mcus_x):
                try:
                    for sc in scan:
                        c = by_id[sc["id"]]
                        for vy in range(c["v"]):
                            for vx in range(c["h"]):
                                planes[c["id"]][
                                    my * c["v"] + vy, mx * c["h"] + vx
                                ] = decode_block(sc)
                except _RestartMarker:
                    br.sync_restart()
                    for k in pred:
                        pred[k] = 0
                    # re-decode this MCU after sync
                    for sc in scan:
                        c = by_id[sc["id"]]
                        for vy in range(c["v"]):
                            for vx in range(c["h"]):
                                planes[c["id"]][
                                    my * c["v"] + vy, mx * c["h"] + vx
                                ] = decode_block(sc)
                maybe_restart()
    else:
        sc = scan[0]
        c = by_id[sc["id"]]
        bh, bw = planes[c["id"]].shape[:2]
        for by in range(bh):
            for bx in range(bw):
                planes[c["id"]][by, bx] = decode_block(sc)
                maybe_restart()

    # dequant + IDCT per component, vectorized over blocks
    out_planes = {}
    for c in comps:
        q = qtables[c["tq"]]
        pl = planes[c["id"]]
        bh, bw = pl.shape[:2]
        deq = (pl * q[None, None, :])[:, :, _UNZIGZAG].reshape(bh, bw, 8, 8)
        spatial = np.einsum(
            "xu,bcuv,vy->bcxy", _D.T, deq.astype(np.float64), _D
        )
        px = np.clip(np.round(spatial + 128), 0, 255).astype(np.uint8)
        # blocks → plane
        plane = px.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        # upsample to full resolution by replication
        ry, rx = vmax // c["v"], hmax // c["h"]
        plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes[c["id"]] = plane[:h, :w]
    if len(comps) == 1:
        return out_planes[comps[0]["id"]][:, :, None]
    y = out_planes[comps[0]["id"]].astype(np.float64)
    cb = out_planes[comps[1]["id"]].astype(np.float64) - 128.0
    cr = out_planes[comps[2]["id"]].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=2)), 0, 255
    ).astype(np.uint8)


# ------------------------------------------------------------------
# encoder


def _encode_value(writer, codes, run_size, value, size) -> None:
    code, ln = codes[run_size]
    writer.write(code, ln)
    if size:
        if value < 0:
            value = value + (1 << size) - 1
        writer.write(value, size)


def _size_of(v: int) -> int:
    return int(abs(v)).bit_length()


def _plane_coefs(p: np.ndarray, q: np.ndarray):
    """Padded plane → per-block quantized zigzag coefficients
    (bh, bw, 64): DCT → zigzag → quantize."""
    ph, pw = p.shape
    bh_, bw_ = ph // 8, pw // 8
    blocks = p.reshape(bh_, 8, bw_, 8).transpose(0, 2, 1, 3) - 128.0
    f = np.einsum("ux,bcxy,yv->bcuv", _D, blocks, _D.T)
    zz = f.reshape(bh_, bw_, 64)[:, :, _ZIGZAG]
    return np.round(zz / q[None, None, :]).astype(np.int64)


def _pad_replicate(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = p.shape
    pp = np.empty((ph, pw), np.float64)
    pp[:h, :w] = p
    pp[h:, :w] = p[h - 1 : h, :w]
    pp[:, w:] = pp[:, w - 1 : w]
    return pp


def _write_block(writer, dc_codes, ac_codes, block, pred, ci) -> None:
    diff = int(block[0]) - pred[ci]
    pred[ci] = int(block[0])
    s = _size_of(diff)
    _encode_value(writer, dc_codes, s, diff, s)
    run = 0
    last_nz = np.nonzero(block[1:])[0]
    last = last_nz[-1] + 1 if len(last_nz) else 0
    for k in range(1, last + 1):
        v = int(block[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            _encode_value(writer, ac_codes, 0xF0, 0, 0)
            run -= 16
        s = _size_of(v)
        _encode_value(writer, ac_codes, (run << 4) | s, v, s)
        run = 0
    if last < 63:
        _encode_value(writer, ac_codes, 0x00, 0, 0)  # EOB


def encode_jpeg(
    arr: np.ndarray,
    quant: np.ndarray | None = None,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 ndarray (H, W) / (H, W, 1) grayscale or (H, W, 3) RGB →
    baseline JPEG bytes (tables embedded). ``quant`` is a 64-entry
    zigzag-order table; default all-ones (near-lossless — constant
    8×8 tiles round-trip exactly). ``subsampling`` ∈ {"444", "420"}
    for color: 420 averages chroma 2×2 (the ubiquitous camera/web
    layout — exercises the decoder's multi-block-MCU interleave and
    upsampling paths). ``restart_interval`` > 0 emits a DRI segment
    and RSTn markers every N MCUs (what real encoders do for error
    resilience / parallel decode; resets DC prediction at each
    marker)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub420 = nc == 3 and subsampling == "420"
    q = np.ones(64, np.int64) if quant is None else np.asarray(quant, np.int64)

    if nc == 3:
        rgb = arr.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
        planes = [np.round(p) for p in (y, cb, cr)]
    else:
        planes = [arr[:, :, 0].astype(np.float64)]

    dc_codes = _DC_CODES
    ac_codes = _AC_CODES

    # sampling factors + per-component padded planes and coefficients
    if sub420:
        hv = [(2, 2), (1, 1), (1, 1)]
        mcu_w, mcu_h = 16, 16
        ph, pw = (h + 15) // 16 * 16, (w + 15) // 16 * 16
        ypad = _pad_replicate(planes[0], ph, pw)
        # chroma: average 2x2 neighborhoods AFTER padding (dims even)
        sub = [
            np.round(
                _pad_replicate(p, ph, pw)
                .reshape(ph // 2, 2, pw // 2, 2)
                .mean(axis=(1, 3))
            )
            for p in planes[1:]
        ]
        padded = [ypad] + sub
    else:
        hv = [(1, 1)] * nc
        mcu_w = mcu_h = 8
        ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
        padded = [_pad_replicate(p, ph, pw) for p in planes]

    coefs = [_plane_coefs(p, q) for p in padded]

    # headers
    out = bytearray(b"\xff\xd8")

    def segment(marker: int, body: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    segment(0xDB, bytes([0x00]) + bytes(int(v) for v in q))  # DQT id 0
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sof += struct.pack(">BBB", i + 1, (hv[i][0] << 4) | hv[i][1], 0)
    segment(0xC0, sof)
    dht = bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
    dht += bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
    segment(0xC4, dht)
    if restart_interval:
        segment(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    segment(0xDA, sos)

    # entropy: interleaved MCUs — h×v blocks per component per MCU;
    # RSTn every restart_interval MCUs (not after the last)
    writer = _BitWriter()
    pred = [0] * nc
    mcus_y, mcus_x = ph // mcu_h, pw // mcu_w
    total_mcus = mcus_y * mcus_x
    mcu_n = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(nc):
                ch, cv = hv[ci]
                for vy in range(cv):
                    for vx in range(ch):
                        block = coefs[ci][my * cv + vy, mx * ch + vx]
                        _write_block(writer, dc_codes, ac_codes, block, pred, ci)
            mcu_n += 1
            if (
                restart_interval
                and mcu_n % restart_interval == 0
                and mcu_n < total_mcus
            ):
                out.extend(writer.flush())
                writer = _BitWriter()
                out.extend(bytes([0xFF, 0xD0 + rst % 8]))
                rst += 1
                pred = [0] * nc
    out.extend(writer.flush())
    out.extend(b"\xff\xd9")
    return bytes(out)
