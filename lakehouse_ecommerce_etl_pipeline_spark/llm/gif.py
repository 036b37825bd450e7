"""GIF87a codec — palette + LZW, from the spec, pure stdlib+NumPy.

The fifth real image/video leg beside PPM/BMP (byte layout), PNG
(zlib + filters), JPEG (huffman + IDCT), and MJPEG-AVI (container
walk): GIF contributes the remaining classic compression family —
dictionary coding (variable-width LZW with clear/EOI codes and
dictionary reset) plus indexed-color palettes. Web-crawl corpora are
full of GIFs, and the LZW layer is the same algorithm TIFF and PDF
streams use, so the decoder is genuinely reusable.

Implemented from the published GIF87a specification (CompuServe,
1987; the LZW variant is Welch 1984 with GIF's variable code width):

- logical screen descriptor + global color table;
- image descriptor (no local tables/interlace emitted; decoder
  handles local tables, rejects interlace honestly);
- image data: LZW minimum code size byte, then 255-byte-max
  sub-blocks; codes are LSB-first bit-packed, width starts at
  min+1, grows after the table reaches 2^width, table resets on
  CLEAR (emitted by the encoder when the table hits 4096 — the
  12-bit ceiling the spec fixes);
- GIF89a extension blocks (graphic control etc.) are skipped by
  label+size walking, so 89a stills decode too.

No Animation: multi-frame GIFs decode to their FIRST frame (the
video tier owns temporal sampling via MJPEG-AVI).
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE = 4096  # 12-bit ceiling (spec)


# ------------------------------------------------------------- LZW
def lzw_compress(indices: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW: emits CLEAR, then real dictionary coding with
    width growth and reset-at-4096; closes with EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    def fresh_table() -> dict:
        return {bytes([i]): i for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for b in indices:
        trial = prefix + bytes([b])
        if trial in table:
            prefix = trial
            continue
        emit(table[prefix], width)
        table[trial] = next_code
        next_code += 1
        # width grows when the NEXT code to assign would not fit
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code >= _MAX_CODE:
            emit(clear, width)
            table = fresh_table()
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([b])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def lzw_decompress(data: bytes, min_code_size: int) -> bytes:
    """Inverse of the GIF LZW stream: rebuilds the dictionary from the
    code sequence (including the KwKwK self-reference case), tracks
    width growth, resets on CLEAR, stops at EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0  # bit cursor
    total_bits = 8 * len(data)

    def read(width: int) -> int:
        nonlocal pos
        if pos + width > total_bits:
            return eoi  # truncated stream: treat as end
        byte0 = pos >> 3
        val = int.from_bytes(
            data[byte0 : byte0 + (((pos & 7) + width + 7) >> 3)], "little"
        )
        code = (val >> (pos & 7)) & ((1 << width) - 1)
        pos += width
        return code

    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    while True:
        code = read(width)
        if code == eoi:
            break
        if code == clear:
            reset()
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table {len(table)}")
        out += entry
        prev = entry
        if len(table) >= (1 << width) and width < 12:
            width += 1
    return bytes(out)


# ------------------------------------------------------- container
def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """GIF87a bytes for an (H, W) uint8 index raster and an (N, 3)
    uint8 palette (N padded to the next power of two >= 2)."""
    h, w = indices.shape
    n = max(2, 1 << int(np.ceil(np.log2(len(palette)))))
    # validate against the REAL palette length, not the power-of-two
    # padded table size — an index into a pad entry would silently
    # decode to black
    if indices.max(initial=0) >= len(palette):
        raise ValueError("index beyond palette")
    pal = np.zeros((n, 3), np.uint8)
    pal[: len(palette)] = palette
    gct_bits = max(1, int(np.log2(n)))
    min_code = max(2, gct_bits)  # spec: min code size >= 2

    out = bytearray(b"GIF87a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((gct_bits - 1) << 4) | (gct_bits - 1), 0, 0])
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(min_code)
    stream = lzw_compress(indices.tobytes(), min_code)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(payload: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB of the first frame. Walks the container:
    screen descriptor, global table, extension blocks (skipped),
    image descriptor (+ local table), sub-block-framed LZW data."""
    if payload[:4] != b"GIF8" or payload[4:6] not in (b"7a", b"9a"):
        raise ValueError(f"not a GIF: {payload[:6]!r}")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label then sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected block 0x{block:02x} at {pos - 1}")
        _l, _t, w, h, ipacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(
                payload[pos : pos + 3 * n], np.uint8
            ).reshape(n, 3)
            pos += 3 * n
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF not supported")
        if table is None:
            raise ValueError("no color table")
        min_code = payload[pos]
        pos += 1
        stream = bytearray()
        while payload[pos]:
            ln = payload[pos]
            stream += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            lzw_decompress(bytes(stream), min_code)[: w * h], np.uint8
        ).reshape(h, w)
        return table[idx]
    raise ValueError("GIF contained no image block")


def synthetic_gifs(docs, id_col: str = "doc_id"):
    """REAL GIF payloads, one per doc id, with closed-form content so
    decoded stats stay SQL-derivable (the q_multimodal_meta protocol,
    extended to indexed color):

        w = 8 + id % 9     h = 6 + id % 5     (48..160 px)
        pixel index  idx(x, y) = (id + x + 3y) % 8
        palette[i]   r = (id + 31i) % 256
                     g = (7id + 57i) % 256
                     b = (13id + 89i) % 256

    The repeating diagonal index pattern gives LZW genuine runs to
    compress (dictionary entries build and the code width grows), so
    the oracle exercises the real coding path, not a degenerate one."""
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("content_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                w, h = 8 + did % 9, 6 + did % 5
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                idx = ((did + x + 3 * y) % 8).astype(np.uint8)
                i = np.arange(8)
                pal = np.stack(
                    [
                        (did + 31 * i) % 256,
                        (7 * did + 57 * i) % 256,
                        (13 * did + 89 * i) % 256,
                    ],
                    axis=1,
                ).astype(np.uint8)
                rows.append((did, encode_gif(idx, pal)))
            yield pd.DataFrame(rows, columns=["content_id", "payload"])

    return docs.select(id_col).mapInPandas(gen, schema=out_schema)
