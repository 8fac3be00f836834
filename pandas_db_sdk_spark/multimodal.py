"""Multimodal columns — SURVEY §2 D7 (north-star).

Model: media are opaque `binary` payload columns traveling next to typed
metadata (a struct of modality/byte-size/checksum). Parquet stores binary
natively, partition pruning and column projection still work, and payloads
only flow through stages that touch them (column pruning drops them
elsewhere — the key to 100 TB pipelines with heavy media columns).

Decode / feature-extraction run as Arrow-batched `mapInPandas` over the
binary column. No media library ships in this container, so the codecs
here are implemented FROM FIRST PRINCIPLES and oracle-certified — by
round 10 the modeled-format ladder is closed:

* containers: PNG/RIFF/MP4 header walks, WARC/1.0 + `.warc.gz`
  (member-per-record) ingestion, CDX-style (offset, length) random
  access proven byte-for-byte;
* PNG: the full matrix — 8/16-bit truecolor and 8-bit palette, each
  sequential or Adam7-interlaced, DEFLATE + all five filters;
* JPEG: baseline grayscale and YCbCr 4:2:0 color, restart intervals
  (DRI/RSTn), progressive spectral selection AND successive
  approximation, gray and color;
* audio: WAV parse + rational linear resample + fixed-point polyphase
  windowed-sinc resample (160/147);
* signatures: perceptual average-hash (the image near-dup key).

`decode_features` ships a deterministic fake decoder and `decode_real`
remains the explicitly marked stub (`NotImplementedError`) for
real-world LIBRARY integration (PIL/libav-class formats beyond the
modeled ladder) — the Spark-side plumbing is identical either way.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 8


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Manufacture a binary payload column (+ typed metadata struct) from a
    text column — the test-fixture analogue of real image/audio bytes."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("text/plain").alias("modality"),
            F.octet_length(payload).alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ),
    )


def decode_features(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Fake 'decode + featurize' over binary payloads via mapInPandas.

    Deterministic stand-in for an image/audio decoder: features are simple
    byte statistics, so tests can assert exact values. Batch shape, Arrow
    transfer, and output schema are identical to what a real decoder needs.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            feats = []
            for blob in pdf[payload_col]:
                # FEATURE_DIM bucketed byte-mean "embedding" — deterministic
                # fake; bucket sums run in numpy, not a per-byte Python loop,
                # so the measured mapInPandas plumbing cost is honest.
                a = np.frombuffer(bytes(blob), dtype=np.uint8)
                n = a.size
                step = max(n // FEATURE_DIM, 1)
                bound = (min(n, step * FEATURE_DIM) // step) * step
                vec = a[:bound].reshape(-1, step).mean(axis=1, dtype=np.float64)
                out = np.zeros(FEATURE_DIM)
                out[: vec.size] = vec[:FEATURE_DIM]
                feats.append(out.tolist())
            yield pd.DataFrame({"doc_id": pdf[id_col], "n_bytes": pdf[payload_col].map(len), "features": feats})

    return df.mapInPandas(decode, f"doc_id long, n_bytes long, features array<double>")


def decode_real(df: DataFrame, payload_col: str = "payload"):
    """STUB — real media decode (PIL/librosa/av are not installed here).

    Intended contract: mapInPandas over `payload_col`, yielding
    (id, width/height or sample_rate/duration, features array<float>) with
    the same batch shape as :func:`decode_features`.
    """
    raise NotImplementedError(
        "media codecs unavailable in this environment; use decode_features "
        "(deterministic fake) — the Spark plumbing is identical"
    )


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-frame-sampling plumbing: given (doc_id, payload) pretend each
    payload is a container of frames; emit one row per sampled frame index.
    The index arithmetic is real; the frame extraction would live in the
    decoder stub."""
    n_frames = (F.octet_length("payload") / 16).cast("int")  # fake: 16 bytes/frame
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return df.select("doc_id", F.explode(idx).alias("frame_idx"))


def synth_media_payload(
    df: DataFrame, id_col: str = "doc_id", kinds: int = 3
) -> DataFrame:
    """Manufacture REAL container bytes per row — a valid minimal PNG
    (signature + IHDR chunk with a correct CRC32) for id%3==0, a valid
    RIFF/WAVE file (fmt chunk + zero-filled data chunk) for id%3==1, and a
    valid MP4/ISO-BMFF skeleton (ftyp + moov{mvhd, trak{tkhd}} boxes,
    16.16 fixed-point track dimensions) for id%3==2 — with every header
    field a deterministic function of the id. ``kinds=4`` adds a valid
    baseline JPEG (SOI + JFIF APP0 + SOF0 frame header) on id%4==3 and
    switches the rotation to modulo 4 (the default stays modulo 3: d48's
    certified oracle depends on that mapping byte-for-byte). The fixture
    generator for `parse_media_headers`: because the fields derive from the
    id arithmetically, an engine-independent oracle can certify the whole
    encode→parse round trip without any codec library.

    Runs as Arrow-batched mapInPandas (binary construction is Python-side
    by design — this IS the UDF tier of the multimodal surface)."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        def png(i: int) -> bytes:
            w, h = 16 + i % 64, 16 + (i * 7) % 64
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
            chunk = b"IHDR" + ihdr
            return (
                b"\x89PNG\r\n\x1a\n"
                + struct.pack(">I", 13)
                + chunk
                + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
            )

        def box(btype: bytes, payload: bytes) -> bytes:
            return struct.pack(">I", 8 + len(payload)) + btype + payload

        def mp4(i: int) -> bytes:
            timescale, dur_s = 600, 5 + i % 20
            w, h = 320 + (i % 16) * 16, 240 + (i * 3 % 16) * 16
            mvhd = box(
                b"mvhd",
                b"\x00\x00\x00\x00"  # version 0 + flags
                + struct.pack(">II", 0, 0)  # creation/modification
                + struct.pack(">II", timescale, timescale * dur_s)
                + b"\x00" * 80,  # rate/volume/reserved/matrix/predefines/next-track
            )
            tkhd = box(
                b"tkhd",
                b"\x00\x00\x00\x07"  # version 0 + enabled flags
                + struct.pack(">IIII", 0, 0, 1, 0)  # times, track id, reserved
                + struct.pack(">I", timescale * dur_s)
                + b"\x00" * 52  # reserved/layer/volume/matrix
                + struct.pack(">II", w << 16, h << 16),  # 16.16 fixed point
            )
            moov = box(b"moov", mvhd + box(b"trak", tkhd))
            ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
            return ftyp + moov

        def jpeg(i: int) -> bytes:
            w, h = 32 + i % 96, 32 + (i * 5) % 96
            app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + bytes(
                [1, 1, 0]
            ) + struct.pack(">HH", 1, 1) + bytes([0, 0])
            comps = b"".join(bytes([c, 0x11, 0]) for c in (1, 2, 3))
            sof0 = (
                b"\xff\xc0"
                + struct.pack(">H", 8 + len(comps))
                + bytes([8])
                + struct.pack(">HH", h, w)
                + bytes([3])
                + comps
            )
            return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"

        def wav(i: int) -> bytes:
            ch = 1 + i % 2
            sr = 8000 + (i % 8) * 1000
            n_samples = 1000 + i % 100
            data = b"\x00" * (n_samples * ch * 2)
            fmt = struct.pack("<HHIIHH", 1, ch, sr, sr * ch * 2, ch * 2, 16)
            body = b"WAVEfmt " + struct.pack("<I", 16) + fmt
            body += b"data" + struct.pack("<I", len(data)) + data
            return b"RIFF" + struct.pack("<I", len(body)) + body

        for pdf in batches:
            ids = pdf[id_col].astype(int)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "payload": [
                        (
                            png(i) if i % 3 == 0 else wav(i) if i % 3 == 1 else mp4(i)
                        )
                        if kinds == 3
                        else (
                            png(i)
                            if i % 4 == 0
                            else wav(i)
                            if i % 4 == 1
                            else mp4(i)
                            if i % 4 == 2
                            else jpeg(i)
                        )
                        for i in ids
                    ],
                }
            )

    return df.select(id_col).mapInPandas(build, f"{id_col} long, payload binary")


def parse_media_headers(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL media metadata extraction — no codec library, pure container
    parsing: PNG signature + IHDR (width/height/bit depth, CRC-verified)
    and RIFF/WAVE fmt (channels/sample rate/bits, duration from the data
    chunk). This is the resolution/duration gating tier every multimodal
    training pipeline runs BEFORE decode — and the one tier that needs no
    codecs, so it is fully real here (decode stays `decode_real`'s
    documented stub).

    Arrow-batched mapInPandas; unparseable payloads degrade to
    format='unknown' with null fields, never an executor error."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct
        import zlib

        def one(blob) -> tuple:
            b = bytes(blob)
            if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 33:
                (ln,) = struct.unpack(">I", b[8:12])
                chunk = b[12 : 16 + ln]
                (crc,) = struct.unpack(">I", b[16 + ln : 20 + ln])
                if chunk[:4] == b"IHDR" and zlib.crc32(chunk) & 0xFFFFFFFF == crc:
                    w, h, depth = struct.unpack(">IIB", chunk[4:13])
                    return ("png", w, h, depth, None, None, None)
            if b[:2] == b"\xff\xd8":
                # JPEG: scan markers for a start-of-frame (SOF0/1/2) header
                pos = 2
                while pos + 4 <= len(b) and b[pos] == 0xFF:
                    m = b[pos + 1]
                    if m == 0xD9:
                        break
                    (seg,) = struct.unpack(">H", b[pos + 2 : pos + 4])
                    if m in (0xC0, 0xC1, 0xC2) and pos + 9 <= len(b):
                        prec = b[pos + 4]
                        h, w = struct.unpack(">HH", b[pos + 5 : pos + 9])
                        return ("jpeg", w, h, prec, None, None, None)
                    pos += 2 + seg
            if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                pos, sr, ch, bits, data_len = 12, None, None, None, None
                while pos + 8 <= len(b):
                    cid, clen = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
                    if cid == b"fmt " and clen >= 16:
                        _, ch, sr, _, _, bits = struct.unpack(
                            "<HHIIHH", b[pos + 8 : pos + 24]
                        )
                    elif cid == b"data":
                        data_len = clen
                    pos += 8 + clen + (clen & 1)
                if sr and ch and bits and data_len is not None:
                    dur = data_len / (sr * ch * (bits // 8))
                    return ("wav", None, None, None, sr, ch, round(dur, 6))
            if len(b) >= 12 and b[4:8] == b"ftyp":
                # ISO-BMFF: walk top-level boxes for moov, then its
                # children for mvhd (timescale/duration) and trak/tkhd
                # (16.16 fixed-point dimensions)
                def walk(lo, hi):
                    out = {}
                    pos = lo
                    while pos + 8 <= hi:
                        (blen,) = struct.unpack(">I", b[pos : pos + 4])
                        if blen < 8 or pos + blen > hi:
                            break
                        out[b[pos + 4 : pos + 8]] = (pos + 8, pos + blen)
                        pos += blen
                    return out

                top = walk(0, len(b))
                if b"moov" in top:
                    kids = walk(*top[b"moov"])
                    ts = dur = w = h = None
                    if b"mvhd" in kids:
                        lo, _ = kids[b"mvhd"]
                        ts, dur = struct.unpack(">II", b[lo + 12 : lo + 20])
                    if b"trak" in kids:
                        tk = walk(*kids[b"trak"])
                        if b"tkhd" in tk:
                            lo, hi2 = tk[b"tkhd"]
                            wfix, hfix = struct.unpack(">II", b[hi2 - 8 : hi2])
                            w, h = wfix >> 16, hfix >> 16
                    if ts:
                        return ("mp4", w, h, None, None, None, round(dur / ts, 6))
            return ("unknown", None, None, None, None, None, None)

        for pdf in batches:
            parsed = [one(x) for x in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "format": [p[0] for p in parsed],
                    "width": pd.array([p[1] for p in parsed], dtype="Int32"),
                    "height": pd.array([p[2] for p in parsed], dtype="Int32"),
                    "bit_depth": pd.array([p[3] for p in parsed], dtype="Int32"),
                    "sample_rate": pd.array([p[4] for p in parsed], dtype="Int32"),
                    "n_channels": pd.array([p[5] for p in parsed], dtype="Int32"),
                    "duration_s": pd.array([p[6] for p in parsed], dtype="float64"),
                }
            )

    return df.mapInPandas(
        parse,
        f"{id_col} long, format string, width int, height int, bit_depth int, "
        "sample_rate int, n_channels int, duration_s double",
    )


def synth_raw_rgb(
    df: DataFrame, id_col: str = "doc_id", width: int = 16, height: int = 16
) -> DataFrame:
    """Deterministic raw RGB888 bitmap per row — pixel value
    ``(7·id + 3·x + 5·y + 11·c) mod 256`` in row-major (y, x, c) layout.
    No container, no codec: this is the DECODED frame a real image
    pipeline would hand to feature extraction, so the pixel tier below
    can run REAL numpy math end-to-end in this environment (the container
    tier is d48; the codec step proper stays the documented stub).
    Arrow-batched mapInPandas, same contract as ``synth_media_payload``."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        y, x, c = np.meshgrid(
            np.arange(height), np.arange(width), np.arange(3), indexing="ij"
        )
        base = (3 * x + 5 * y + 11 * c).astype(np.int64)
        for pdf in batches:
            out = []
            for i in pdf[id_col]:
                arr = ((7 * int(i) + base) % 256).astype(np.uint8)
                out.append((int(i), width, height, arr.tobytes()))
            yield pd.DataFrame(
                out, columns=[id_col, "width", "height", "payload"]
            )

    return df.select(id_col).mapInPandas(
        build, f"{id_col} long, width int, height int, payload binary"
    )


def synth_raw_rgb_swapped(
    df: DataFrame, id_col: str = "doc_id", width: int = 16, height: int = 16
) -> DataFrame:
    """The NEAR-DUP variant of :func:`synth_raw_rgb` (r10, d117): the
    same deterministic frame with the two corner pixels SWAPPED —
    pixel (0,0,c) takes (w−1,h−1,c)'s value and vice versa.  A swap
    conserves the frame's total intensity exactly and touches only the
    two corner 8×8-grid blocks, so the aHash of the pair provably
    differs in AT MOST 2 of 64 bits: only blocks (0,0) and (7,7)
    change their sums, and the mean threshold (the total) is unchanged
    for every other block.  That bound is what lets the d117b oracle
    certify near-dup clustering arithmetically — the copy is GUARANTEED
    inside Hamming ≤ 3 of its original, so banding must pair them."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        y, x, c = np.meshgrid(
            np.arange(height), np.arange(width), np.arange(3), indexing="ij"
        )
        base = (3 * x + 5 * y + 11 * c).astype(np.int64)
        for pdf in batches:
            out = []
            for i in pdf[id_col]:
                arr = ((7 * int(i) + base) % 256).astype(np.uint8)
                corner = arr[0, 0, :].copy()
                arr[0, 0, :] = arr[height - 1, width - 1, :]
                arr[height - 1, width - 1, :] = corner
                out.append((int(i), width, height, arr.tobytes()))
            yield pd.DataFrame(
                out, columns=[id_col, "width", "height", "payload"]
            )

    return df.select(id_col).mapInPandas(
        build, f"{id_col} long, width int, height int, payload binary"
    )


def synth_bmp_ppm(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Manufacture a REAL codec-free image file per row — a valid
    uncompressed 24-bit BMP (BITMAPFILEHEADER + BITMAPINFOHEADER,
    bottom-up BGR rows, 4-byte row padding) for even ids and a valid
    binary PPM (P6, ASCII header, top-down RGB rows) for odd ids.
    Dimensions and every pixel derive from the id arithmetically —
    width = 5 + id%8, height = 4 + (3·id)%8, pixel(x, y, c) =
    (7·id + 3·x + 5·y + 11·c) mod 256 (the d93 formula) — so an
    engine-independent oracle can certify the encode→decode→aggregate
    round trip without any codec library. Widths 5–12 make most BMP rows
    non-4-byte-aligned, so the padding path is genuinely exercised.

    Arrow-batched mapInPandas, same contract as ``synth_media_payload``."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        def pixels(i: int, w: int, h: int) -> "np.ndarray":
            y, x, c = np.meshgrid(
                np.arange(h), np.arange(w), np.arange(3), indexing="ij"
            )
            return ((7 * i + 3 * x + 5 * y + 11 * c) % 256).astype(np.uint8)

        def bmp(i: int, w: int, h: int) -> bytes:
            rgb = pixels(i, w, h)
            bgr = rgb[:, :, ::-1]  # BMP stores blue-green-red
            row_len = (w * 3 + 3) // 4 * 4
            rows = np.zeros((h, row_len), dtype=np.uint8)
            rows[:, : w * 3] = bgr.reshape(h, w * 3)
            pix = rows[::-1].tobytes()  # bottom-up row order
            info = struct.pack(
                "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0
            )
            head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pix), 0, 0, 54)
            return head + info + pix

        def ppm(i: int, w: int, h: int) -> bytes:
            return f"P6\n{w} {h}\n255\n".encode() + pixels(i, w, h).tobytes()

        for pdf in batches:
            ids = pdf[id_col].astype(int)
            out = []
            for i in ids:
                w, h = 5 + i % 8, 4 + (3 * i) % 8
                out.append((int(i), bmp(i, w, h) if i % 2 == 0 else ppm(i, w, h)))
            yield pd.DataFrame(out, columns=[id_col, "payload"])

    return df.select(id_col).mapInPandas(build, f"{id_col} long, payload binary")


# Adam7 pass geometry: (x0, y0, dx, dy) per pass, PNG spec §8.2
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_filter_rows(raw, row_filter, bpp: int = 3) -> bytearray:
    """Filter an (h, stride) uint8 scanline grid into the PNG on-wire
    form — one filter-type byte + filtered bytes per row, the spec's
    mod-256 recurrences (0=None 1=Sub 2=Up 3=Average 4=Paeth). Shared
    by the sequential layout, each Adam7 reduced image (filters never
    cross a pass boundary), and the palette layout (bpp=1)."""
    out = bytearray()
    h, stride = raw.shape[0], raw.shape[1]
    # one bulk tolist() then plain integer ops per row — same mod-256
    # byte arithmetic as the numpy row ops this replaces, without the
    # per-row temporary-array overhead that dominated at these widths
    grid = raw.tolist()
    prior = [0] * stride
    for y in range(h):
        cur = grid[y]
        ftype = row_filter(y)
        if ftype == 0:
            enc = cur
        elif ftype == 1:  # Sub
            enc = [
                (cur[i] - (cur[i - bpp] if i >= bpp else 0)) & 255
                for i in range(stride)
            ]
        elif ftype == 2:  # Up
            enc = [(c - p) & 255 for c, p in zip(cur, prior)]
        elif ftype == 3:  # Average
            enc = [
                (cur[i] - (((cur[i - bpp] if i >= bpp else 0) + prior[i]) >> 1))
                & 255
                for i in range(stride)
            ]
        else:  # Paeth
            enc = []
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prior[i]
                c = prior[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - c if p >= c else c - p
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc.append((cur[i] - pred) & 255)
        out.append(ftype)
        out.extend(enc)
        prior = cur
    return out


def _png_encode_rgb(
    rgb,
    row_filter,
    idat_split: bool = False,
    interlace: bool = False,
    palette: bool = False,
    depth16: bool = False,
) -> bytes:
    """Encode an (h, w, 3) uint8 pixel grid as a valid 8-bit truecolor
    PNG: per-scanline filter chosen by ``row_filter(y)`` (0=None 1=Sub
    2=Up 3=Average 4=Paeth, the spec's mod-256 byte recurrences), zlib
    DEFLATE, CRC32-stamped chunks; ``idat_split`` splits the stream
    across two IDAT chunks (the concatenation rule); ``interlace``
    emits the ADAM7 layout (r10, d120) — seven independently-filtered
    reduced images in pass order, empty passes contributing nothing
    (not even filter bytes), one DEFLATE stream over the lot."""
    import struct
    import zlib

    import numpy as np

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        body = ctype + payload
        return (
            struct.pack(">I", len(payload))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    h, w = rgb.shape[0], rgb.shape[1]
    if palette and depth16:
        raise ValueError("palette entries are 8-bit by spec")
    plte = b""
    if palette:
        # indexed color (type 3, r10 d122): unique colors in lexicographic
        # order form the PLTE; scanlines carry 1-byte indices (bpp=1)
        rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
        colors, inverse = np.unique(
            rgb.reshape(-1, 3), axis=0, return_inverse=True
        )
        if colors.shape[0] > 256:
            raise ValueError(f"palette overflow: {colors.shape[0]} colors")
        plane = inverse.astype(np.uint8).reshape(h, w, 1)
        plte = chunk(b"PLTE", colors.astype(np.uint8).tobytes())
        bpp = 1
    elif depth16:
        # 16-bit truecolor (r10, d127): big-endian sample bytes; the
        # five filters run over BYTES (bpp=6) exactly per spec
        arr = np.ascontiguousarray(rgb, dtype=np.uint16)
        plane = (
            np.frombuffer(arr.astype(">u2").tobytes(), dtype=np.uint8)
            .reshape(h, w, 6)
        )
        bpp = 6
    else:
        plane = np.ascontiguousarray(rgb, dtype=np.uint8)
        bpp = 3
    if interlace:
        out = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = plane[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            out += _png_filter_rows(
                np.ascontiguousarray(sub).reshape(sub.shape[0], -1),
                row_filter,
                bpp=bpp,
            )
    else:
        out = _png_filter_rows(plane.reshape(h, w * bpp), row_filter, bpp=bpp)
    stream = zlib.compress(bytes(out), 6)
    ihdr = chunk(
        b"IHDR",
        struct.pack(
            ">IIBBBBB",
            w,
            h,
            16 if depth16 else 8,
            3 if palette else 2,
            0,
            0,
            1 if interlace else 0,
        ),
    )
    if idat_split and len(stream) > 8:
        mid = len(stream) // 2
        idat = chunk(b"IDAT", stream[:mid]) + chunk(b"IDAT", stream[mid:])
    else:
        idat = chunk(b"IDAT", stream)
    return b"\x89PNG\r\n\x1a\n" + ihdr + plte + idat + chunk(b"IEND", b"")


def _png_decode_rgb(b: bytes):
    """Decode an 8-bit truecolor non-interlaced PNG to (w, h, rgb) with
    full five-filter unfiltering, or None when out of scope or broken
    (bad magic/CRC/zlib/length, non-truecolor IHDR, unknown filter)."""
    import struct
    import zlib

    import numpy as np

    if b[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    pos, w = 8, None
    plte = None
    idat = bytearray()
    while pos + 12 <= len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        body = b[pos + 4 : pos + 8 + ln]
        if len(body) != 4 + ln:
            return None
        (crc,) = struct.unpack(">I", b[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(body) & 0xFFFFFFFF != crc:
            return None
        if ctype == b"IHDR":
            if ln != 13:
                return None
            w, h, depth, ctyp, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body[4:17]
            )
            # scope (r10): truecolor at 8 or 16 bits and 8-bit palette,
            # each sequential or Adam7 — anything else degrades to skip
            if (
                (ctyp, depth) not in ((2, 8), (2, 16), (3, 8))
                or comp != 0
                or filt != 0
                or inter not in (0, 1)
            ):
                return None
            if w <= 0 or h <= 0:
                return None
        elif ctype == b"PLTE":
            if ln % 3 != 0 or ln == 0 or ln > 768:
                return None
            plte = np.frombuffer(body[4:], dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(body[4:])
        elif ctype == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        return None
    raw = zlib.decompress(bytes(idat))
    # bytes per pixel of the FILTERED stream; postprocessing below maps
    # the unfiltered byte planes to pixels per layout
    bpp = {(2, 8): 3, (2, 16): 6, (3, 8): 1}[(ctyp, depth)]

    def to_pixels(plane, pw, ph):
        if ctyp == 3:
            return plane.reshape(ph, pw)  # palette indices, map at end
        if depth == 16:
            return (
                np.frombuffer(plane.tobytes(), dtype=">u2")
                .reshape(ph, pw, 3)
                .astype(np.uint16)
            )
        return plane.reshape(ph, pw, 3)

    if inter == 0:
        recon = _png_unfilter(raw, 0, w, h, bpp=bpp)
        if recon is None or len(raw) != h * (1 + w * bpp):
            return None
        out = to_pixels(recon, w, h)
    else:
        # Adam7 (r10, d120): seven reduced images back to back in the
        # ONE inflated stream, each independently filtered; empty
        # passes (a pass whose grid misses the image) contribute no
        # bytes — works at every bpp (truecolor 8/16-bit, palette)
        if ctyp == 3:
            out = np.zeros((h, w), dtype=np.uint8)
        else:
            out = np.zeros(
                (h, w, 3), dtype=np.uint16 if depth == 16 else np.uint8
            )
        offset = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            recon = _png_unfilter(raw, offset, pw, ph, bpp=bpp)
            if recon is None:
                return None
            offset += ph * (1 + pw * bpp)
            out[y0::dy, x0::dx] = to_pixels(recon, pw, ph)
        if offset != len(raw):
            return None  # trailing or missing pass data
    if ctyp == 3:
        # an index past the palette is a hard skip, never garbage pixels
        if plte is None or int(out.max(initial=0)) >= plte.shape[0]:
            return None
        out = plte[out]
    return w, h, out


def _png_unfilter(raw: bytes, offset: int, w: int, h: int, bpp: int = 3):
    """Unfilter ``h`` scanlines of an 8-bit image ``w`` pixels wide at
    ``bpp`` bytes per pixel starting at ``offset`` in the inflated
    stream (one filter byte + w·bpp data bytes per line), returning the
    (h, w·bpp) reconstruction or None on a bad filter type /
    truncation. Shared by the sequential layout, each Adam7 reduced
    image, and the palette layout (bpp=1)."""
    import numpy as np

    stride = w * bpp
    if offset + h * (1 + stride) > len(raw):
        return None
    # The Sub/Average/Paeth recurrences are sequential along a scanline
    # BY SPEC — the per-pixel work runs as plain Python integer ops over
    # lists (measured ~3x faster than per-pixel 3-wide numpy at these
    # row widths; the mod-256 byte arithmetic is identical)
    rows: list = []
    prior = [0] * stride
    for y in range(h):
        base = offset + y * (1 + stride)
        ftype = raw[base]
        line = raw[base + 1 : base + 1 + stride]
        if ftype == 0:
            row = list(line)
        elif ftype == 2:  # Up
            row = [(c + p) & 255 for c, p in zip(line, prior)]
        elif ftype == 1:  # Sub
            row = list(line)
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 255
        elif ftype == 3:  # Average
            row = [0] * stride
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (line[i] + ((left + prior[i]) >> 1)) & 255
        elif ftype == 4:  # Paeth
            row = [0] * stride
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                up = prior[i]
                ul = prior[i - bpp] if i >= bpp else 0
                p = a + up - ul
                pa = p - a if p >= a else a - p
                pb = p - up if p >= up else up - p
                pc = p - ul if p >= ul else ul - p
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = up
                else:
                    pred = ul
                row[i] = (line[i] + pred) & 255
        else:
            return None
        rows.append(row)
        prior = row
    return np.array(rows, dtype=np.uint8).reshape(h, stride)


def synth_png(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Manufacture a REAL compressed PNG file per row — signature, IHDR
    (8-bit truecolor, no interlace), zlib-compressed IDAT of filtered
    scanlines, IEND, every chunk CRC32-stamped. Scanline y uses filter
    type ``(id + y) % 5``, so every image (h ≥ 5) exercises ALL five
    PNG filters (None/Sub/Up/Average/Paeth); ids ≡ 0 (mod 3) split the
    compressed stream across TWO IDAT chunks, exercising the
    concatenation rule. Dimensions and pixels derive from the id
    arithmetically — width = 6 + id%7, height = 5 + (2·id)%7,
    pixel(x,y,c) = (7·id + 3·x + 5·y + 11·c) mod 256 (the d93/d99
    formula) — so an engine-independent oracle can certify the whole
    compress→filter→decode round trip with no codec library (zlib is
    stdlib DEFLATE, not an image codec).

    Arrow-batched mapInPandas, same contract as ``synth_media_payload``."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def pixels(i: int, w: int, h: int) -> "np.ndarray":
            y, x, c = np.meshgrid(
                np.arange(h), np.arange(w), np.arange(3), indexing="ij"
            )
            return ((7 * i + 3 * x + 5 * y + 11 * c) % 256).astype(np.uint8)

        def png(i: int) -> bytes:
            w, h = 6 + i % 7, 5 + (2 * i) % 7
            return _png_encode_rgb(
                pixels(i, w, h), lambda y: (i + y) % 5, idat_split=i % 3 == 0
            )

        for pdf in batches:
            ids = pdf[id_col].astype(int)
            yield pd.DataFrame(
                [(int(i), png(int(i))) for i in ids],
                columns=[id_col, "payload"],
            )

    return df.select(id_col).mapInPandas(build, f"{id_col} long, payload binary")


def synth_png_adam7(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """``synth_png`` with the ADAM7 INTERLACED layout (r10, d120): the
    identical dimensions and pixel content, but IHDR interlace=1 and
    the IDAT stream carrying seven independently-filtered reduced
    images in pass order (empty passes omitted entirely).  Interlacing
    must be RESULT-INVISIBLE, so d120 reuses d105's oracle verbatim —
    a pass-geometry or scatter bug breaks d120 while d105 stays green.
    Arrow-batched mapInPandas."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def pixels(i: int, w: int, h: int) -> "np.ndarray":
            y, x, c = np.meshgrid(
                np.arange(h), np.arange(w), np.arange(3), indexing="ij"
            )
            return ((7 * i + 3 * x + 5 * y + 11 * c) % 256).astype(np.uint8)

        def png(i: int) -> bytes:
            w, h = 6 + i % 7, 5 + (2 * i) % 7
            return _png_encode_rgb(
                pixels(i, w, h),
                lambda y: (i + y) % 5,
                idat_split=i % 3 == 0,
                interlace=True,
            )

        for pdf in batches:
            ids = pdf[id_col].astype(int)
            yield pd.DataFrame(
                [(int(i), png(int(i))) for i in ids],
                columns=[id_col, "payload"],
            )

    return df.select(id_col).mapInPandas(build, f"{id_col} long, payload binary")


def synth_png_palette(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """``synth_png`` in the INDEXED-COLOR layout (r10, d122): identical
    pixel content, but IHDR color type 3 with a PLTE of the image's
    unique colors (≤132 pixels ⇒ ≤132 entries, lexicographic order) and
    1-byte-per-pixel filtered index scanlines. Palette indirection must
    be RESULT-INVISIBLE, so d122 reuses d105's oracle verbatim.
    Arrow-batched mapInPandas."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def pixels(i: int, w: int, h: int) -> "np.ndarray":
            y, x, c = np.meshgrid(
                np.arange(h), np.arange(w), np.arange(3), indexing="ij"
            )
            return ((7 * i + 3 * x + 5 * y + 11 * c) % 256).astype(np.uint8)

        def png(i: int) -> bytes:
            w, h = 6 + i % 7, 5 + (2 * i) % 7
            return _png_encode_rgb(
                pixels(i, w, h),
                lambda y: (i + y) % 5,
                idat_split=i % 3 == 0,
                palette=True,
            )

        for pdf in batches:
            ids = pdf[id_col].astype(int)
            yield pd.DataFrame(
                [(int(i), png(int(i))) for i in ids],
                columns=[id_col, "payload"],
            )

    return df.select(id_col).mapInPandas(build, f"{id_col} long, payload binary")


def synth_png_16bit(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """``synth_png`` at 16-BIT depth (r10, d127): the same pattern
    expanded to 16 bits by the standard 8→16 replication v·257
    (0xAB → 0xABAB), big-endian sample bytes, filters over BYTES at
    bpp=6 per spec; odd ids additionally interlace (Adam7 × 16-bit —
    the combination real screenshots/medical scans ship).  The oracle
    is d105's with every value scaled 257× — bit depth must change the
    VALUES exactly and nothing else.  Arrow-batched mapInPandas."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def pixels16(i: int, w: int, h: int) -> "np.ndarray":
            y, x, c = np.meshgrid(
                np.arange(h), np.arange(w), np.arange(3), indexing="ij"
            )
            return (((7 * i + 3 * x + 5 * y + 11 * c) % 256) * 257).astype(
                np.uint16
            )

        def png(i: int) -> bytes:
            w, h = 6 + i % 7, 5 + (2 * i) % 7
            return _png_encode_rgb(
                pixels16(i, w, h),
                lambda y: (i + y) % 5,
                idat_split=i % 3 == 0,
                interlace=i % 2 == 1,
                depth16=True,
            )

        for pdf in batches:
            ids = pdf[id_col].astype(int)
            yield pd.DataFrame(
                [(int(i), png(int(i))) for i in ids],
                columns=[id_col, "payload"],
            )

    return df.select(id_col).mapInPandas(build, f"{id_col} long, payload binary")


def decode_png_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL PNG decode with NO codec library — the compressed-codec gap
    (VERDICT r8 #3) closed for PNG using only stdlib zlib: chunk walk
    with CRC32 verification, IDAT concatenation, DEFLATE inflate, then
    per-scanline UNFILTERING of all five PNG filter types
    (None/Sub/Up/Average/Paeth, the spec's byte-wise mod-256 recurrences
    with the left/up/upper-left predictors) back to the logical
    (y, x, channel) pixel grid, and the same per-channel statistics +
    position-weighted checksum as :func:`decode_bmp_ppm_stats` — a
    mis-unfiltered row corrupts every later Sub/Average/Paeth row, so
    pos_sum certifies the filter chain end-to-end. After this tier the
    only remaining multimodal stub is LOSSY codecs (JPEG entropy
    decode, audio resample — `decode_real`).

    Scope: 8-bit truecolor (color type 2), non-interlaced — the shape
    `synth_png` emits; anything else (and any CRC/zlib/structure error)
    degrades to skip, never an executor error. The Sub/Average/Paeth
    recurrences are sequential along a scanline BY SPEC (each pixel
    depends on the reconstructed left neighbor), so unfiltering runs as
    a per-row Python loop over numpy channel vectors — at 100 TB this
    loop is embarrassingly parallel across images (pure mapInPandas,
    zero shuffles), which is where the scale lives; a production decoder
    would swap in a C inner loop behind the same batch contract.

    Integer sums are exact, so the oracle replays them arithmetically —
    the d48/d93/d99 certification pattern."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                try:
                    got = _png_decode_rgb(bytes(buf))
                except Exception:
                    got = None
                if got is None:
                    continue
                w, h, rgb = got
                arr = rgb.astype(np.int64)
                n = w * h
                xw = np.arange(w) + 1
                yw = np.arange(h) + 2
                wgt = yw[:, None] * xw[None, :]
                for ch in range(3):
                    v = arr[:, :, ch]
                    s, ss = int(v.sum()), int((v * v).sum())
                    mean = s / n
                    rows.append(
                        (
                            int(i),
                            "png",
                            w,
                            h,
                            ch,
                            round(mean, 6),
                            int(v.min()),
                            int(v.max()),
                            round((ss / n - mean * mean) ** 0.5, 6),
                            int((v * wgt).sum()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "format", "width", "height", "channel",
                    "mean", "min", "max", "std", "pos_sum",
                ],
            )

    return df.mapInPandas(
        stats,
        f"{id_col} long, format string, width int, height int, channel int, "
        "mean double, min int, max int, std double, pos_sum long",
    )


def decode_bmp_ppm_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL image decode, no codec library: parse BMP (header walk, strip
    row padding, flip the bottom-up rows, swap BGR→RGB) and binary PPM
    (ASCII header scan, top-down RGB) down to the logical (y, x, channel)
    pixel grid in pure numpy, then per-channel statistics — mean, min,
    max, population std, and a POSITION-WEIGHTED checksum
    ``pos_sum = Σ v(x,y)·(x+1)·(y+2)``. The channel means alone would
    certify the channel order but not the geometry (a row flip permutes
    pixels within a channel, leaving every order-free statistic
    unchanged); pos_sum is the statistic a mis-flipped, mis-padded or
    mis-strided decode cannot fake. With this tier the only remaining
    multimodal stub is COMPRESSED codecs (JPEG/PNG entropy coding —
    `decode_real`); container→raw-pixel decode is now real end-to-end.

    Integer sums are exact (≤ 255·12·13·144 per cell), so the oracle
    replays them arithmetically — the d48/d93 certification pattern.
    Scale: pure mapInPandas over Arrow batches, zero shuffles, one output
    row per (image, channel)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        def decode(b: bytes):
            if b[:2] == b"BM":
                if len(b) < 54:
                    return None
                off, = struct.unpack("<I", b[10:14])
                w, h = struct.unpack("<ii", b[18:26])
                bpp, = struct.unpack("<H", b[28:30])
                comp, = struct.unpack("<I", b[30:34])
                # top-down (h < 0) and other exotic layouts degrade to
                # skip, matching the parse_media_headers contract
                if bpp != 24 or comp != 0 or w <= 0 or h <= 0:
                    return None
                row_len = (w * 3 + 3) // 4 * 4
                if len(b) < off + h * row_len:
                    return None
                rows = np.frombuffer(
                    b[off : off + h * row_len], dtype=np.uint8
                ).reshape(h, row_len)
                bgr = rows[:, : w * 3].reshape(h, w, 3)[::-1]  # undo bottom-up
                return "bmp", w, h, bgr[:, :, ::-1]  # undo BGR
            if b[:2] == b"P6":
                # header: magic, width, height, maxval — ASCII tokens
                # separated by whitespace, with optional '#' comment lines
                # (legal PPM; skipped to end-of-line); pixel data starts
                # after the single whitespace byte following maxval
                pos, fields = 2, []
                while len(fields) < 3 and pos < len(b):
                    while pos < len(b) and b[pos : pos + 1].isspace():
                        pos += 1
                    if pos < len(b) and b[pos : pos + 1] == b"#":
                        while pos < len(b) and b[pos : pos + 1] != b"\n":
                            pos += 1
                        continue
                    start = pos
                    while pos < len(b) and not b[pos : pos + 1].isspace():
                        pos += 1
                    if not b[start:pos].isdigit():
                        return None
                    fields.append(int(b[start:pos]))
                pos += 1  # the single whitespace after maxval
                if len(fields) < 3:  # truncated header
                    return None
                w, h, maxval = fields
                if maxval != 255 or w <= 0 or h <= 0:
                    return None
                if len(b) < pos + w * h * 3:  # short pixel payload
                    return None
                rgb = np.frombuffer(
                    b[pos : pos + w * h * 3], dtype=np.uint8
                ).reshape(h, w, 3)
                return "ppm", w, h, rgb
            return None

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                # belt-and-braces: ANY parse failure degrades to skip
                # (the parse_media_headers contract), never an executor
                # error — the explicit guards above cover the known
                # malformed shapes; this catches the unknown ones
                try:
                    got = decode(bytes(buf))
                except Exception:
                    got = None
                if got is None:
                    continue
                fmt, w, h, rgb = got
                arr = rgb.astype(np.int64)
                n = w * h
                xw = np.arange(w) + 1
                yw = np.arange(h) + 2
                wgt = yw[:, None] * xw[None, :]
                for ch in range(3):
                    v = arr[:, :, ch]
                    s, ss = int(v.sum()), int((v * v).sum())
                    mean = s / n
                    rows.append(
                        (
                            int(i),
                            fmt,
                            w,
                            h,
                            ch,
                            round(mean, 6),
                            int(v.min()),
                            int(v.max()),
                            round((ss / n - mean * mean) ** 0.5, 6),
                            int((v * wgt).sum()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "format", "width", "height", "channel",
                    "mean", "min", "max", "std", "pos_sum",
                ],
            )

    return df.mapInPandas(
        stats,
        f"{id_col} long, format string, width int, height int, channel int, "
        "mean double, min int, max int, std double, pos_sum long",
    )


def raw_pixel_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Per-channel pixel statistics over raw RGB888 frames — the
    feature-extraction tier of the multimodal surface running REAL pixel
    math (numpy over Arrow batches): channel mean, min, max and population
    std per (frame, channel).

    Integer pixel sums are exact (≤ 2^53 by construction), so mean and the
    sqrt(E[v²]−E[v]²) std use one double division/sqrt each — bit-identical
    to any engine replaying the same arithmetic, which is what lets the
    d93 oracle certify the whole synth→decode→aggregate path without a
    codec. Scale: pure mapInPandas, zero shuffles; one output row per
    (frame, channel)."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for i, w, h, buf in zip(
                pdf[id_col], pdf["width"], pdf["height"], pdf[payload_col]
            ):
                arr = (
                    np.frombuffer(buf, dtype=np.uint8)
                    .reshape(int(h), int(w), 3)
                    .astype(np.int64)
                )
                n = int(h) * int(w)
                for ch in range(3):
                    v = arr[:, :, ch]
                    s = int(v.sum())
                    ss = int((v * v).sum())
                    mean = s / n
                    var = ss / n - mean * mean
                    rows.append(
                        (
                            int(i),
                            ch,
                            round(mean, 6),
                            int(v.min()),
                            int(v.max()),
                            round(var**0.5, 6),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "channel", "mean", "min", "max", "std"],
            )

    return df.mapInPandas(
        stats,
        f"{id_col} long, channel int, mean double, min int, max int, std double",
    )


# ---------------------------------------------------------------------------
# Baseline JPEG (ITU T.81) — REAL entropy codec, no library.  The encoder
# below writes spec-valid grayscale baseline JPEGs from a chosen quantized-
# coefficient grid (canonical Huffman DHT, zigzag DQT, DC-diff prediction,
# AC run-length coding, FF byte stuffing); the decoder reverses all of it —
# marker walk, DHT canonical-code rebuild, bit-unstuffing, Huffman decode,
# zigzag/dequant, separable IDCT, level shift.  d108 certifies the whole
# chain arithmetically on DC-only blocks (flat 8x8 output = 128 + q0·dc/8,
# exact when 8 | q0·dc); the AC path is exercised by unit tests against a
# reference IDCT.  Helpers live at module level so mapInPandas workers
# pickle them.
# ---------------------------------------------------------------------------


def _gen_zigzag():
    order = []
    for s in range(15):
        rng = list(range(max(0, s - 7), min(s, 7) + 1))
        if s % 2 == 0:
            rng.reverse()
        for i in rng:
            order.append((i, s - i))
    return order


# the zigzag never changes: computed once, plus the flattened row-major
# offsets (r*8+c) used for vectorized (de)quantization-table and
# coefficient indexing — the per-image _jpeg_zigzag()/per-element numpy
# indexing was a measurable slice of the tiny-image decode profile
_ZZ = _gen_zigzag()
_ZZ_FLAT = [r * 8 + c for r, c in _ZZ]


def _jpeg_zigzag():
    """The T.81 zigzag order as (row, col) pairs, generated from the
    diagonal-walk definition (odd anti-diagonals run down-left, even run
    up-right); module-cached."""
    return _ZZ


# custom canonical Huffman tables (the decoder parses DHT, so any
# spec-valid table works): DC — all 12 categories at length 4;
# AC — EOB/ZRL at length 4, every (run, size) symbol at length 10.
_JPEG_DC_LENGTHS = {s: 4 for s in range(12)}
_JPEG_AC_LENGTHS = {0x00: 4, 0xF0: 4}
_JPEG_AC_LENGTHS.update(
    {(r << 4) | s: 10 for r in range(16) for s in range(1, 11)}
)


_CANONICAL_CACHE: dict = {}


def _canonical_codes(lengths):
    """lengths: {symbol: bit_length} → {symbol: (code, bit_length)} in
    JPEG canonical order (ascending length, then symbol order).  Memoized
    — the encoders rebuild the same fixed tables once per image."""
    key = tuple(sorted(lengths.items()))
    hit = _CANONICAL_CACHE.get(key)
    if hit is not None:
        return hit
    code, last_len = 0, 0
    out = {}
    for sym in sorted(lengths, key=lambda s: (lengths[s], s)):
        ln = lengths[sym]
        code <<= ln - last_len
        out[sym] = (code, ln)
        code += 1
        last_len = ln
    _CANONICAL_CACHE[key] = out
    return out


_HUFF_LUT_CACHE: dict = {}


def _huff_decode_lut(dht: bytes):
    """16-bit lookup table for canonical-JPEG Huffman DECODE, cached by
    the DHT table bytes (16 length counts + symbols — identical tables
    across a corpus build one LUT total).  Entry i (the next 16 stream
    bits, zero-padded past EOF) is ``(code_length << 8) | symbol`` for
    the unique code prefixing those bits, 0 where no code matches.
    Codes are prefix-free, so the shortest match the old bit-serial
    walk found is the only match; a bogus table whose canonical codes
    overflow ``2^len`` produces entries the old walk could never reach
    either (read codes are always < 2^len) — the slice below is then
    empty, preserving unreachability."""
    lut = _HUFF_LUT_CACHE.get(dht)
    if lut is None:
        import numpy as np

        counts = dht[:16]
        syms = dht[16:]
        arr = np.zeros(65536, dtype=np.int32)
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(counts[ln - 1]):
                sym = syms[k]
                k += 1
                lo = code << (16 - ln)
                arr[lo : lo + (1 << (16 - ln))] = (ln << 8) | sym
                code += 1
            code <<= 1
        lut = arr.tolist()
        _HUFF_LUT_CACHE[dht] = lut
    return lut


def _dht_payload(table_class, table_id, lengths):
    counts = [0] * 16
    for ln in lengths.values():
        counts[ln - 1] += 1
    syms = sorted(lengths, key=lambda s: (lengths[s], s))
    return bytes([(table_class << 4) | table_id]) + bytes(counts) + bytes(syms)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value, nbits):
        # whole-value shift-in (bit-identical to the per-bit loop: the
        # accumulator sees the same bit sequence, bytes drain MSB-first
        # with the same FF stuffing)
        acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        n = self.nbits + nbits
        buf = self.buf
        while n >= 8:
            n -= 8
            byte = (acc >> n) & 0xFF
            buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                buf.append(0x00)
        self.acc = acc & ((1 << n) - 1)
        self.nbits = n

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.acc = (self.acc << pad) | ((1 << pad) - 1)  # pad with 1s
            self.buf.append(self.acc)
            if self.acc == 0xFF:
                self.buf.append(0x00)
            self.acc = 0
            self.nbits = 0
        return bytes(self.buf)


def _jpeg_encode_gray(coefs, qtable, restart_interval: int = 0):
    """Encode a quantized-coefficient grid into a baseline grayscale JPEG.

    coefs: int array (by, bx, 8, 8) of QUANTIZED DCT coefficients in
    natural (row, col) order; qtable: int array (8, 8). Image dimensions
    are (by·8, bx·8). ``restart_interval`` > 0 emits a DRI segment and
    splits the scan into restart intervals (r10, d118): after every
    ``restart_interval`` MCUs the bitstream byte-aligns (1-padded), an
    RSTm marker (D0–D7, cycling) is written, and the DC predictor
    resets — T.81 §B.2.4.4 / §E.2.4, the resync machinery most real
    camera JPEGs carry."""
    import struct

    import numpy as np

    by, bx = coefs.shape[0], coefs.shape[1]
    h, w = by * 8, bx * 8
    dc_codes = _canonical_codes(_JPEG_DC_LENGTHS)
    ac_codes = _canonical_codes(_JPEG_AC_LENGTHS)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(payload)) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    qzz = bytes(np.asarray(qtable).reshape(64)[_ZZ_FLAT].tolist())
    out += seg(0xDB, bytes([0x00]) + qzz)  # DQT, 8-bit, table 0
    out += seg(
        0xC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    )  # SOF0 grayscale
    out += seg(0xC4, _dht_payload(0, 0, _JPEG_DC_LENGTHS))
    out += seg(0xC4, _dht_payload(1, 0, _JPEG_AC_LENGTHS))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))  # DRI
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))  # SOS

    wtr = _BitWriter()

    def put_amplitude(v):
        # JPEG magnitude coding: category s = bit_length(|v|); negatives
        # are stored as v + 2^s - 1
        s = int(v).bit_length() if v > 0 else int(-v).bit_length()
        bits = v if v > 0 else v + (1 << s) - 1
        return s, bits

    pred = 0
    mcu = 0
    for y in range(by):
        for x in range(bx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                out += wtr.flush()  # byte-align (1-padded) before RSTm
                out += bytes([0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)])
                wtr = _BitWriter()
                pred = 0
            mcu += 1
            # one vectorized zigzag gather per block instead of 63
            # per-element numpy index chains
            bl = coefs[y, x].reshape(64)[_ZZ_FLAT].tolist()
            dc = int(bl[0])
            diff = dc - pred
            pred = dc
            if diff == 0:
                c, ln = dc_codes[0]
                wtr.write(c, ln)
            else:
                s, bits = put_amplitude(diff)
                c, ln = dc_codes[s]
                wtr.write(c, ln)
                wtr.write(bits, s)
            acs = bl[1:]
            run = 0
            for v in acs:
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    c, ln = ac_codes[0xF0]  # ZRL
                    wtr.write(c, ln)
                    run -= 16
                s, bits = put_amplitude(v)
                c, ln = ac_codes[(run << 4) | s]
                wtr.write(c, ln)
                wtr.write(bits, s)
                run = 0
            if run:
                c, ln = ac_codes[0x00]  # EOB
                wtr.write(c, ln)
    out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _jpeg_decode_gray(b):
    """Decode a baseline grayscale JPEG to a (h, w) uint8 pixel grid, or
    None for anything out of scope (color, progressive, 16-bit tables)
    or structurally broken. Restart intervals ARE in scope (r10, d118):
    a DRI segment arms per-interval decoding — the scan splits at RSTm
    markers (whose D0–D7 cycle is verified), each interval byte-aligns
    and resets the DC predictor, and an interval with the wrong MCU
    count fails the decode rather than smearing blocks."""
    import struct

    import numpy as np

    if b[:2] != b"\xff\xd8":
        return None
    pos = 2
    qtables = {}
    huff = {}  # (class, id) -> 16-bit decode LUT (see _huff_decode_lut)
    w = h = None
    scan = None
    ri = 0  # restart interval in MCUs; 0 = none
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        payload = b[pos + 4 : pos + 2 + ln]
        if len(payload) != ln - 2:
            return None
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 15
                if pq != 0:
                    return None  # 16-bit tables out of scope
                vals = payload[p + 1 : p + 65]
                if len(vals) != 64:
                    return None
                q = np.zeros(64, dtype=np.int64)
                q[_ZZ_FLAT] = np.frombuffer(vals, dtype=np.uint8)
                qtables[tq] = q.reshape(8, 8)
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 15
                counts = payload[p + 1 : p + 17]
                nsym = sum(counts)
                syms = payload[p + 17 : p + 17 + nsym]
                if len(syms) != nsym:
                    return None
                huff[(tc, th)] = _huff_decode_lut(
                    bytes(payload[p + 1 : p + 17 + nsym])
                )
                p += 17 + nsym
        elif marker == 0xC0:
            prec = payload[0]
            h, w = struct.unpack(">HH", payload[1:5])
            ncomp = payload[5]
            if prec != 8 or ncomp != 1:
                return None  # grayscale baseline only
            samp, tq = payload[7], payload[8]
            if samp != 0x11:
                return None
            comp_q = tq
        elif marker == 0xDD:  # DRI
            if len(payload) < 2:
                return None
            (ri,) = struct.unpack(">H", payload[:2])
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            return None  # other SOF classes
        elif marker == 0xDA:
            td = payload[2] >> 4
            ta = payload[2] & 15
            scan = (td, ta)
            pos = pos + 2 + ln
            break
        pos += 2 + ln
    if scan is None or w is None or comp_q not in qtables:
        return None
    dc_tab = huff.get((0, scan[0]))
    ac_tab = huff.get((1, scan[1]))
    if dc_tab is None or ac_tab is None:
        return None

    # unstuff entropy-coded bytes up to EOI, splitting at RSTm markers
    # into one byte-aligned segment per restart interval (the whole scan
    # is one segment when DRI is absent); the D0-D7 marker cycle is
    # verified — a skipped or duplicated restart is a hard decode fail
    segments = [bytearray()]
    p = pos
    while p < len(b):
        byte = b[p]
        if byte == 0xFF:
            nxt = b[p + 1] if p + 1 < len(b) else None
            if nxt == 0x00:
                segments[-1].append(0xFF)
                p += 2
                continue
            if nxt is not None and 0xD0 <= nxt <= 0xD7:
                if ri == 0 or (nxt - 0xD0) != (len(segments) - 1) % 8:
                    return None  # RST without DRI, or out-of-cycle
                segments.append(bytearray())
                p += 2
                continue
            break  # a real marker (EOI) ends the scan
        segments[-1].append(byte)
        p += 1

    # LUT-based bit reader (same EOF semantics as the old bit-serial
    # walk): `peek` reads the next 16 stream bits zero-padded past EOF;
    # a LUT hit whose code length crosses the stream end, or a window no
    # code prefixes (LUT entry 0), is exactly where the old read1() walk
    # raised EOFError — both fail the decode.
    q = qtables[comp_q]
    bx, by = (w + 7) // 8, (h + 7) // 8
    # coefficients accumulate in a flat Python list (zigzag write offsets
    # precomputed); one bulk np.array at the end replaces per-coefficient
    # numpy scalar stores
    co = [0] * (by * bx * 64)
    zf = _ZZ_FLAT
    # 3 pad bytes: the 24-bit peek at bpos == nbits (all bits consumed)
    # indexes seg_len + 2 at most
    sbuf = bytes(segments[0]) + b"\x00\x00\x00"
    nbits = (len(sbuf) - 3) * 8
    bpos = 0
    pred = 0
    mcu = 0
    seg_idx = 0
    for yb in range(by):
        for xb in range(bx):
            if ri and mcu and mcu % ri == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    return None  # fewer intervals than MCUs demand
                sbuf = bytes(segments[seg_idx]) + b"\x00\x00\x00"
                nbits = (len(sbuf) - 3) * 8
                bpos = 0
                pred = 0
            mcu += 1
            base = (yb * bx + xb) * 64
            # DC: one LUT probe + one amplitude read
            i = bpos >> 3
            off = bpos & 7
            w24 = (sbuf[i] << 16) | (sbuf[i + 1] << 8) | sbuf[i + 2]
            e = dc_tab[(w24 >> (8 - off)) & 0xFFFF]
            cl = e >> 8
            if cl == 0 or bpos + cl > nbits:
                return None  # no code / past EOF
            s = e & 0xFF
            bpos += cl
            if s:
                if bpos + s > nbits:
                    return None
                i = bpos >> 3
                off = bpos & 7
                w24 = (sbuf[i] << 16) | (sbuf[i + 1] << 8) | sbuf[i + 2]
                bits = (w24 >> (24 - off - s)) & ((1 << s) - 1)
                bpos += s
                # inverse magnitude coding
                pred += bits if bits >> (s - 1) else bits - (1 << s) + 1
            co[base] = pred
            k = 1
            while k < 64:
                i = bpos >> 3
                off = bpos & 7
                w24 = (sbuf[i] << 16) | (sbuf[i + 1] << 8) | sbuf[i + 2]
                e = ac_tab[(w24 >> (8 - off)) & 0xFFFF]
                cl = e >> 8
                if cl == 0 or bpos + cl > nbits:
                    return None
                rs = e & 0xFF
                bpos += cl
                if rs == 0x00:  # EOB
                    break
                if rs == 0xF0:  # ZRL
                    k += 16
                    continue
                run, size = rs >> 4, rs & 15
                k += run
                if k > 63 or size == 0:
                    return None
                if bpos + size > nbits:
                    return None
                i = bpos >> 3
                off = bpos & 7
                w24 = (sbuf[i] << 16) | (sbuf[i + 1] << 8) | sbuf[i + 2]
                bits = (w24 >> (24 - off - size)) & ((1 << size) - 1)
                bpos += size
                co[base + zf[k]] = (
                    bits if bits >> (size - 1) else bits - (1 << size) + 1
                )
                k += 1
    if seg_idx != len(segments) - 1:
        return None  # more restart segments than the MCU count demands

    coefs = np.array(co, dtype=np.int64).reshape(by, bx, 8, 8)
    return _jpeg_idct_gray(coefs, q, w, h)


_IDCT_BASIS: dict = {}  # the 8x8 C[u, x] basis — identical for every image


def _jpeg_idct_gray(coefs, q, w, h):
    """Dequant + separable IDCT + level shift for a (by, bx, 8, 8)
    quantized-coefficient grid — shared by the baseline (sequential
    scan) and progressive (multi-scan accumulated) decoders."""
    import numpy as np

    by, bx = coefs.shape[0], coefs.shape[1]
    C = _IDCT_BASIS.get("C")
    if C is None:
        alpha = np.full(8, np.sqrt(2.0 / 8.0))
        alpha[0] = np.sqrt(1.0 / 8.0)
        xs = np.arange(8)
        basis = np.cos((2 * xs[None, :] + 1) * xs[:, None] * np.pi / 16.0)
        C = alpha[:, None] * basis  # C[u, x]
        _IDCT_BASIS["C"] = C
    deq = coefs * q[None, None, :, :]
    spatial = np.einsum("ux,vy,bcuv->bcxy", C, C, deq.astype(np.float64))
    pix = np.floor(spatial + 128.0 + 0.5)
    pix = np.clip(pix, 0, 255).astype(np.uint8)
    img = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
    return img[:h, :w]


def _jpeg_put_amplitude(v: int):
    """JPEG magnitude coding: category s = bit_length(|v|); negatives
    are stored as v + 2^s − 1."""
    s = int(v).bit_length() if v > 0 else int(-v).bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _jpeg_encode_gray_progressive(coefs, qtable, bands=((1, 5), (6, 63))):
    """Encode a quantized-coefficient grid as a PROGRESSIVE grayscale
    JPEG (SOF2) using SPECTRAL SELECTION (r10, d121): a DC scan
    (Ss=Se=0) followed by one AC scan per ``bands`` entry, each a
    non-interleaved single-component scan over its zigzag band with
    run-length/ZRL coding and EOB terminating the band remainder —
    T.81 §G.1, the Ah=Al=0 (no successive approximation) progressive
    mode. The union of bands must cover 1..63."""
    import struct

    zz = _jpeg_zigzag()
    by, bx = coefs.shape[0], coefs.shape[1]
    h, w = by * 8, bx * 8
    dc_codes = _canonical_codes(_JPEG_DC_LENGTHS)
    ac_codes = _canonical_codes(_JPEG_AC_LENGTHS)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(payload)) + payload

    out = bytearray(b"\xff\xd8")
    qzz = bytes(int(qtable[r][c]) for r, c in zz)
    out += seg(0xDB, bytes([0x00]) + qzz)
    out += seg(
        0xC2, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    )  # SOF2 progressive grayscale
    out += seg(0xC4, _dht_payload(0, 0, _JPEG_DC_LENGTHS))
    out += seg(0xC4, _dht_payload(1, 0, _JPEG_AC_LENGTHS))

    # DC scan — identical diff chain to baseline (Ah=Al=0)
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0]))
    wtr = _BitWriter()
    pred = 0
    for y in range(by):
        for x in range(bx):
            dc = int(coefs[y, x, 0, 0])
            diff = dc - pred
            pred = dc
            if diff == 0:
                c, ln = dc_codes[0]
                wtr.write(c, ln)
            else:
                s, bits = _jpeg_put_amplitude(diff)
                c, ln = dc_codes[s]
                wtr.write(c, ln)
                wtr.write(bits, s)
    out += wtr.flush()

    # AC band scans — EOB (run length 1) terminates each block's band
    for ss, se in bands:
        out += seg(0xDA, bytes([1, 1, 0x00, ss, se, 0]))
        wtr = _BitWriter()
        for y in range(by):
            for x in range(bx):
                block = coefs[y, x]
                vals = [int(block[r][cc]) for r, cc in zz[ss : se + 1]]
                run = 0
                for v in vals:
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        c, ln = ac_codes[0xF0]  # ZRL
                        wtr.write(c, ln)
                        run -= 16
                    s, bits = _jpeg_put_amplitude(v)
                    c, ln = ac_codes[(run << 4) | s]
                    wtr.write(c, ln)
                    wtr.write(bits, s)
                    run = 0
                if run:
                    c, ln = ac_codes[0x00]  # EOB0: end-of-band, run 1
                    wtr.write(c, ln)
        out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _jpeg_emit_ac_refine(wtr, grid, zz, ac_codes, al: int):
    """Emit one AC-refinement scan (T.81 §G.1.2.3, libjpeg emission
    shape) for a (by, bx, 8, 8) coefficient grid over band 1–63 at
    point transform ``al``: newly-significant coefficients as
    (zero-history run, size 1) + sign, correction bits for
    already-significant coefficients buffered between symbols, EOB
    followed by the band remainder's corrections. Shared by the
    grayscale (d123) and color (d128) SA encoders."""
    for by_ in range(grid.shape[0]):
        for bx_ in range(grid.shape[1]):
            block = grid[by_, bx_]
            absv = [abs(int(block[rr, cc])) >> (al - 1) for rr, cc in zz[1:]]
            signs = [int(block[rr, cc]) > 0 for rr, cc in zz[1:]]
            eob = -1
            for idx, t in enumerate(absv):
                if t == 1:
                    eob = idx
            run = 0
            buffered = []
            for idx, t in enumerate(absv):
                if t == 0:
                    run += 1
                    continue
                while run > 15 and idx <= eob:
                    c, ln = ac_codes[0xF0]
                    wtr.write(c, ln)
                    run -= 16
                    for bit in buffered:
                        wtr.write(bit, 1)
                    buffered = []
                if t > 1:
                    buffered.append(t & 1)
                    continue
                c, ln = ac_codes[(run << 4) | 1]
                wtr.write(c, ln)
                wtr.write(1 if signs[idx] else 0, 1)
                for bit in buffered:
                    wtr.write(bit, 1)
                buffered = []
                run = 0
            if run > 0 or buffered:
                c, ln = ac_codes[0x00]
                wtr.write(c, ln)
                for bit in buffered:
                    wtr.write(bit, 1)


def _jpeg_decode_ac_refine(grid, zz, rdr, ac_tab, ss, se, al: int):
    """Decode one AC-refinement scan into ``grid`` (accumulating) —
    the T.81 §G.2 correction algorithm: EOB-run phases read correction
    bits only; inside a block, runs count zero-history positions while
    nonzero-history positions consume correction bits. Shared by the
    grayscale (d123) and color (d128) SA decoders. Raises EOFError on
    truncation; returns None-on-error via ValueError for malformed
    symbols."""
    p1, m1 = 1 << al, -1 << al
    eobrun = 0
    for by_ in range(grid.shape[0]):
        for bx_ in range(grid.shape[1]):
            block = grid[by_, bx_]
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = rdr.huffman(ac_tab)
                    r, sz = rs >> 4, rs & 15
                    newval = 0
                    if sz == 0:
                        if r != 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += rdr.read(r)
                            break
                    else:
                        if sz != 1:
                            raise ValueError("bad refinement size")
                        newval = p1 if rdr.read1() else m1
                    while k <= se:
                        rr, cc = zz[k]
                        if block[rr, cc] != 0:
                            if rdr.read1() and not (int(block[rr, cc]) & p1):
                                block[rr, cc] += p1 if block[rr, cc] > 0 else m1
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval and k <= se:
                        rr, cc = zz[k]
                        block[rr, cc] = newval
                    k += 1
            if eobrun > 0:
                while k <= se:
                    rr, cc = zz[k]
                    if block[rr, cc] != 0:
                        if rdr.read1() and not (int(block[rr, cc]) & p1):
                            block[rr, cc] += p1 if block[rr, cc] > 0 else m1
                    k += 1
                eobrun -= 1


def _jpeg_encode_gray_progressive_sa(coefs, qtable, al: int = 1):
    """Encode a quantized-coefficient grid as a progressive grayscale
    JPEG with SUCCESSIVE APPROXIMATION (r10, d123) — the four-scan
    structure real progressive encoders emit: DC first at point
    transform ``al`` (diffs of dc >> al, arithmetic shift), AC 1–63
    first at ``al`` (magnitudes truncated toward zero), then a DC
    refinement (one bit per block) and an AC refinement delivering bit
    al−1 per coefficient — newly-significant coefficients coded as
    (zero-history run, size 1) + sign, already-significant ones as
    correction bits buffered between symbols, end-of-band as EOB0
    followed by the band remainder's correction bits (T.81 §G.1.2.3,
    the libjpeg emission shape). ``al`` must be 1 (single refinement
    pass per band — the canonical minimal SA script)."""
    import struct

    if al != 1:
        raise ValueError("single-refinement SA only: al must be 1")
    zz = _jpeg_zigzag()
    by, bx = coefs.shape[0], coefs.shape[1]
    h, w = by * 8, bx * 8
    dc_codes = _canonical_codes(_JPEG_DC_LENGTHS)
    ac_codes = _canonical_codes(_JPEG_AC_LENGTHS)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(payload)) + payload

    out = bytearray(b"\xff\xd8")
    qzz = bytes(int(qtable[r][c]) for r, c in zz)
    out += seg(0xDB, bytes([0x00]) + qzz)
    out += seg(
        0xC2, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    )
    out += seg(0xC4, _dht_payload(0, 0, _JPEG_DC_LENGTHS))
    out += seg(0xC4, _dht_payload(1, 0, _JPEG_AC_LENGTHS))

    # scan 1: DC first, Ah=0, Al=al — diff chain over dc >> al
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, al]))
    wtr = _BitWriter()
    pred = 0
    for y in range(by):
        for x in range(bx):
            dc = int(coefs[y, x, 0, 0]) >> al  # arithmetic shift (spec)
            diff = dc - pred
            pred = dc
            if diff == 0:
                c, ln = dc_codes[0]
                wtr.write(c, ln)
            else:
                s, bits = _jpeg_put_amplitude(diff)
                c, ln = dc_codes[s]
                wtr.write(c, ln)
                wtr.write(bits, s)
    out += wtr.flush()

    # scan 2: AC 1-63 first, Ah=0, Al=al — magnitudes truncated to zero
    out += seg(0xDA, bytes([1, 1, 0x00, 1, 63, al]))
    wtr = _BitWriter()
    for y in range(by):
        for x in range(bx):
            block = coefs[y, x]
            run = 0
            for rr, cc in zz[1:]:
                v = int(block[rr, cc])
                vt = (abs(v) >> al) * (1 if v > 0 else -1)
                if vt == 0:
                    run += 1
                    continue
                while run >= 16:
                    c, ln = ac_codes[0xF0]
                    wtr.write(c, ln)
                    run -= 16
                s, bits = _jpeg_put_amplitude(vt)
                c, ln = ac_codes[(run << 4) | s]
                wtr.write(c, ln)
                wtr.write(bits, s)
                run = 0
            if run:
                c, ln = ac_codes[0x00]
                wtr.write(c, ln)
    out += wtr.flush()

    # scan 3: DC refinement, Ah=al, Al=al-1 — one bit per block
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 0, ((al << 4) | (al - 1))]))
    wtr = _BitWriter()
    for y in range(by):
        for x in range(bx):
            wtr.write((int(coefs[y, x, 0, 0]) >> (al - 1)) & 1, 1)
    out += wtr.flush()

    # scan 4: AC refinement, Ah=al, Al=al-1 (shared emission helper)
    out += seg(0xDA, bytes([1, 1, 0x00, 1, 63, ((al << 4) | (al - 1))]))
    wtr = _BitWriter()
    _jpeg_emit_ac_refine(wtr, coefs, zz, ac_codes, al)
    out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _jpeg_decode_gray_progressive(b):
    """Decode a PROGRESSIVE grayscale JPEG (SOF2, spectral selection,
    Ah=Al=0) to a (h, w) uint8 grid, or None when out of scope
    (successive approximation, color, restart intervals) or broken:
    multi-scan marker walk accumulating coefficients — the DC scan's
    diff chain plus per-band AC scans with general EOBRUN handling
    (EOBn symbols with n extension bits skip 2ⁿ+ext end-of-band
    blocks, T.81 §G.2) — then the shared dequant/IDCT tail. Each band
    must arrive at most once per coefficient (spec: a coefficient
    appears in exactly one spectral-selection scan)."""
    import struct

    import numpy as np

    if b[:2] != b"\xff\xd8":
        return None
    zz = _jpeg_zigzag()
    pos = 2
    qtables = {}
    huff = {}
    w = h = None
    comp_q = None
    scans = []  # (td, ta, ss, se, ah, al, data)
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        payload = b[pos + 4 : pos + 2 + ln]
        if len(payload) != ln - 2:
            return None
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 15
                if pq != 0:
                    return None
                vals = payload[p + 1 : p + 65]
                if len(vals) != 64:
                    return None
                q = np.zeros((8, 8), dtype=np.int64)
                for (r, c), v in zip(zz, vals):
                    q[r, c] = v
                qtables[tq] = q
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 15
                counts = payload[p + 1 : p + 17]
                nsym = sum(counts)
                syms = payload[p + 17 : p + 17 + nsym]
                if len(syms) != nsym:
                    return None
                table = {}
                code = 0
                k = 0
                for lln in range(1, 17):
                    for _ in range(counts[lln - 1]):
                        table[(code, lln)] = syms[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tc, th)] = table
                p += 17 + nsym
        elif marker == 0xC2:
            prec = payload[0]
            h, w = struct.unpack(">HH", payload[1:5])
            if prec != 8 or payload[5] != 1 or payload[7] != 0x11:
                return None
            comp_q = payload[8]
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xDD):
            return None  # baseline/other SOF here, or DRI (out of scope)
        elif marker == 0xDA:
            if payload[0] != 1:
                return None  # single-component scans only (grayscale)
            td, ta = payload[2] >> 4, payload[2] & 15
            ss, se = payload[3], payload[4]
            ah, al = payload[5] >> 4, payload[5] & 15
            # entropy data runs to the next real marker
            data = bytearray()
            p = pos + 2 + ln
            while p < len(b):
                byte = b[p]
                if byte == 0xFF:
                    nxt = b[p + 1] if p + 1 < len(b) else None
                    if nxt == 0x00:
                        data.append(0xFF)
                        p += 2
                        continue
                    break
                data.append(byte)
                p += 1
            scans.append((td, ta, ss, se, ah, al, bytes(data)))
            pos = p
            continue
        pos += 2 + ln
    if w is None or comp_q not in qtables or not scans:
        return None

    class Bits:
        def __init__(self, buf):
            self.buf = buf
            self.pos = 0

        def read1(self):
            byte_i, bit_i = self.pos >> 3, self.pos & 7
            if byte_i >= len(self.buf):
                raise EOFError
            self.pos += 1
            return (self.buf[byte_i] >> (7 - bit_i)) & 1

        def read(self, n):
            v = 0
            for _ in range(n):
                v = (v << 1) | self.read1()
            return v

        def huffman(self, table):
            code, lln = 0, 0
            while lln < 16:
                code = (code << 1) | self.read1()
                lln += 1
                sym = table.get((code, lln))
                if sym is not None:
                    return sym
            raise EOFError

    def extend(bits, s):
        if s == 0:
            return 0
        if bits >> (s - 1):
            return bits
        return bits - (1 << s) + 1

    bx, by = (w + 7) // 8, (h + 7) // 8
    coefs = np.zeros((by, bx, 8, 8), dtype=np.int64)
    # successive-approximation bookkeeping (r10, d123): each zigzag
    # index's pending low-bit position — None until its first scan; a
    # refinement scan must present Ah == previous Al and Al == Ah − 1
    al_state = [None] * 64
    try:
        for td, ta, ss, se, ah, al, data in scans:
            if se > 63 or ss > se:
                return None
            states = {al_state[k] for k in range(ss, se + 1)}
            if len(states) != 1:
                return None  # band straddles different refinement depths
            prev = states.pop()
            if ah == 0:
                if prev is not None:
                    return None  # first scan must be the first
            elif prev != ah or al != ah - 1:
                return None
            for k in range(ss, se + 1):
                al_state[k] = al
            rdr = Bits(data)
            if ss == 0:
                if se != 0:
                    return None  # DC and AC never share a scan (spec)
                if ah == 0:
                    dc_tab = huff.get((0, td))
                    if dc_tab is None:
                        return None
                    pred = 0
                    for yb in range(by):
                        for xb in range(bx):
                            s = rdr.huffman(dc_tab)
                            pred += extend(rdr.read(s), s)
                            coefs[yb, xb, 0, 0] = pred << al
                else:  # DC refinement: one bit per block at position al
                    for yb in range(by):
                        for xb in range(bx):
                            if rdr.read1():
                                coefs[yb, xb, 0, 0] |= 1 << al
            elif ah == 0:  # AC first scan at this depth
                ac_tab = huff.get((1, ta))
                if ac_tab is None:
                    return None
                eobrun = 0
                for yb in range(by):
                    for xb in range(bx):
                        if eobrun > 0:
                            eobrun -= 1
                            continue
                        k = ss
                        while k <= se:
                            rs = rdr.huffman(ac_tab)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                # EOBn: run of 2^r + ext end-of-band blocks
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += rdr.read(r)
                                break
                            k += r
                            if k > se:
                                return None
                            rr, cc = zz[k]
                            coefs[yb, xb, rr, cc] = extend(rdr.read(s), s) << al
                            k += 1
            else:  # AC refinement scan (T.81 §G.2, shared helper)
                ac_tab = huff.get((1, ta))
                if ac_tab is None:
                    return None
                _jpeg_decode_ac_refine(coefs, zz, rdr, ac_tab, ss, se, al)
    except (EOFError, ValueError):
        return None
    if any(st not in (None, 0) for st in al_state):
        return None  # refinement chain left unfinished (low bits missing)
    return _jpeg_idct_gray(coefs, qtables[comp_q], w, h)


def synth_jpeg(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Manufacture a REAL baseline grayscale JPEG per row — spec-valid
    SOI/DQT/SOF0/DHT/SOS/EOI structure with canonical-Huffman
    entropy-coded data (DC-diff prediction, EOB-coded all-zero AC,
    FF byte stuffing). Dimensions and content derive from the id:
    width = 8·(1 + id%3), height = 8·(1 + (2·id)%3); block (bx, by)
    carries ONLY a DC coefficient dc = (5·id + 3·bx + 7·by) mod 21 − 10
    against a q[0,0] = 16 table, so each decoded 8×8 block is EXACTLY
    flat at 128 + 2·dc (16·dc/8 is an integer — no rounding freedom) and
    an engine-independent oracle can replay every pixel arithmetically.
    The AC run-length path (runs, ZRL, mid-block EOB) is exercised by
    unit tests against a reference IDCT, where exactness is not needed.

    Arrow-batched mapInPandas, same contract as ``synth_media_payload``."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        q = np.full((8, 8), 16, dtype=np.int64)

        def jpeg(i: int) -> bytes:
            bx, by = 1 + i % 3, 1 + (2 * i) % 3
            coefs = np.zeros((by, bx, 8, 8), dtype=np.int64)
            for y in range(by):
                for x in range(bx):
                    coefs[y, x, 0, 0] = (5 * i + 3 * x + 7 * y) % 21 - 10
            return _jpeg_encode_gray(coefs, q)

        for pdf in batches:
            ids = pdf[id_col].astype(int)
            yield pd.DataFrame(
                [(int(i), jpeg(int(i))) for i in ids],
                columns=[id_col, "payload"],
            )

    return df.select(id_col).mapInPandas(build, f"{id_col} long, payload binary")


def synth_jpeg_progressive(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """``synth_jpeg`` in the PROGRESSIVE layout (r10, d121): identical
    pixel content, but SOF2 with a DC scan + two spectral-selection AC
    band scans (1–5, 6–63).  The scan structure must be
    RESULT-INVISIBLE, so d121 reuses d108's oracle verbatim (the
    d118/d120 isolation discipline).  Arrow-batched mapInPandas."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        q = np.full((8, 8), 16, dtype=np.int64)

        def jpeg(i: int) -> bytes:
            bx, by = 1 + i % 3, 1 + (2 * i) % 3
            coefs = np.zeros((by, bx, 8, 8), dtype=np.int64)
            for y in range(by):
                for x in range(bx):
                    coefs[y, x, 0, 0] = (5 * i + 3 * x + 7 * y) % 21 - 10
            return _jpeg_encode_gray_progressive(coefs, q)

        for pdf in batches:
            ids = pdf[id_col].astype(int)
            yield pd.DataFrame(
                [(int(i), jpeg(int(i))) for i in ids],
                columns=[id_col, "payload"],
            )

    return df.select(id_col).mapInPandas(build, f"{id_col} long, payload binary")


def synth_jpeg_progressive_sa(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """``synth_jpeg`` in the full SUCCESSIVE-APPROXIMATION progressive
    layout (r10, d123): identical pixel content, four scans — DC first
    at Al=1, AC 1–63 first at Al=1, DC refinement, AC refinement.  SA
    must be RESULT-INVISIBLE, so d123 reuses d108's oracle verbatim.
    Arrow-batched mapInPandas."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        q = np.full((8, 8), 16, dtype=np.int64)

        def jpeg(i: int) -> bytes:
            bx, by = 1 + i % 3, 1 + (2 * i) % 3
            coefs = np.zeros((by, bx, 8, 8), dtype=np.int64)
            for y in range(by):
                for x in range(bx):
                    coefs[y, x, 0, 0] = (5 * i + 3 * x + 7 * y) % 21 - 10
            return _jpeg_encode_gray_progressive_sa(coefs, q)

        for pdf in batches:
            ids = pdf[id_col].astype(int)
            yield pd.DataFrame(
                [(int(i), jpeg(int(i))) for i in ids],
                columns=[id_col, "payload"],
            )

    return df.select(id_col).mapInPandas(build, f"{id_col} long, payload binary")


def synth_jpeg_dri(
    df: DataFrame, id_col: str = "doc_id", restart_interval: int = 2
) -> DataFrame:
    """``synth_jpeg`` with RESTART INTERVALS (r10, d118): the identical
    pixel content — width = 8·(1 + id%3), height = 8·(1 + (2·id)%3),
    block DC = (5·id + 3·bx + 7·by) mod 21 − 10 — but the scan carries
    a DRI segment and splits into ``restart_interval``-MCU intervals
    separated by cycling RSTm markers, each byte-aligned with its DC
    predictor reset.  Restart machinery must be RESULT-INVISIBLE, so
    d118 reuses d108's oracle verbatim (the d112/d113 isolation trick):
    a predictor that fails to reset, a mis-consumed RST marker, or a
    broken byte-align breaks d118 while d108 stays green, isolating the
    restart path.  Arrow-batched mapInPandas."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        q = np.full((8, 8), 16, dtype=np.int64)

        def jpeg(i: int) -> bytes:
            bx, by = 1 + i % 3, 1 + (2 * i) % 3
            coefs = np.zeros((by, bx, 8, 8), dtype=np.int64)
            for y in range(by):
                for x in range(bx):
                    coefs[y, x, 0, 0] = (5 * i + 3 * x + 7 * y) % 21 - 10
            return _jpeg_encode_gray(coefs, q, restart_interval=restart_interval)

        for pdf in batches:
            ids = pdf[id_col].astype(int)
            yield pd.DataFrame(
                [(int(i), jpeg(int(i))) for i in ids],
                columns=[id_col, "payload"],
            )

    return df.select(id_col).mapInPandas(build, f"{id_col} long, payload binary")


def decode_jpeg_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL baseline JPEG decode with NO codec library — the lossy-codec
    gap closed for grayscale baseline JPEG: marker walk, DQT zigzag
    rebuild, DHT canonical-Huffman reconstruction, FF00 unstuffing,
    bit-level Huffman decode of the DC-diff chain and AC run-length
    symbols (EOB/ZRL), dequantization, separable IDCT, level shift —
    then the same per-channel stats + position-weighted checksum frame
    as the PNG/BMP/PPM tiers (grayscale = channel 0). Out-of-scope
    shapes (color, progressive, restart markers, 16-bit tables) and any
    structural error degrade to skip, never an executor error.

    d108 certifies the full chain on DC-only blocks where the IDCT is
    exact integer arithmetic; the AC path is unit-tested against a
    reference IDCT. Scale: pure mapInPandas over Arrow batches, zero
    shuffles; the bit-serial entropy decode is per-image sequential BY
    SPEC (DC prediction chains through the scan) — parallelism lives
    across images, which is where 100 TB lives."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                # baseline first (its marker walk exits cheaply at SOF2),
                # then the progressive decoder (r10, d121)
                try:
                    img = _jpeg_decode_gray(bytes(buf))
                    if img is None:
                        img = _jpeg_decode_gray_progressive(bytes(buf))
                except Exception:
                    img = None
                if img is None:
                    continue
                h, w = img.shape
                v = img.astype(np.int64)
                n = w * h
                xw = np.arange(w) + 1
                yw = np.arange(h) + 2
                wgt = yw[:, None] * xw[None, :]
                s, ss = int(v.sum()), int((v * v).sum())
                mean = s / n
                rows.append(
                    (
                        int(i),
                        "jpeg",
                        w,
                        h,
                        0,
                        round(mean, 6),
                        int(v.min()),
                        int(v.max()),
                        round((ss / n - mean * mean) ** 0.5, 6),
                        int((v * wgt).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "format", "width", "height", "channel",
                    "mean", "min", "max", "std", "pos_sum",
                ],
            )

    return df.mapInPandas(
        stats,
        f"{id_col} long, format string, width int, height int, channel int, "
        "mean double, min int, max int, std double, pos_sum long",
    )


def synth_pcm_wav(
    df: DataFrame, id_col: str = "doc_id", gain: int = 1, offset: int = 0
) -> DataFrame:
    """Manufacture a REAL mono 16-bit PCM WAV per row — valid RIFF/WAVE
    with fmt and data chunks — whose samples derive from the id
    arithmetically: n = 256 + id%64 samples at 8000 Hz with
    s(t) = gain·(((a·t + b) mod 2048) − 1024) + offset, a = 3 + id%5,
    b = id mod 97 (defaults gain=1, offset=0 — the d109/d119/d142
    fixture unchanged; gain/offset exist for the d156 fingerprint
    invariance twins: a volume-shifted or DC-offset copy of the same
    underlying signal).  The fixture generator for
    :func:`resample_pcm_stats`: an engine-independent oracle can
    replay every sample, so the whole parse→resample→aggregate chain
    hash-certifies with no audio library. Arrow-batched mapInPandas,
    same contract as ``synth_media_payload``."""
    if not (-16 <= gain <= 16 and -1024 <= offset <= 1024):
        raise ValueError(
            "synth_pcm_wav: |gain| <= 16 and |offset| <= 1024 keep "
            "gain*1024 + offset inside int16"
        )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        def wav(i: int) -> bytes:
            n = 256 + i % 64
            a, b = 3 + i % 5, i % 97
            t = np.arange(n, dtype=np.int64)
            samples = (
                gain * ((a * t + b) % 2048 - 1024) + offset
            ).astype("<i2")
            data = samples.tobytes()
            sr, ch = 8000, 1
            fmt = struct.pack("<HHIIHH", 1, ch, sr, sr * ch * 2, ch * 2, 16)
            body = b"WAVEfmt " + struct.pack("<I", 16) + fmt
            body += b"data" + struct.pack("<I", len(data)) + data
            return b"RIFF" + struct.pack("<I", len(body)) + body

        for pdf in batches:
            ids = pdf[id_col].astype(int)
            yield pd.DataFrame(
                [(int(i), wav(int(i))) for i in ids],
                columns=[id_col, "payload"],
            )

    return df.select(id_col).mapInPandas(build, f"{id_col} long, payload binary")


def synth_chirp_wav(
    df: DataFrame,
    id_col: str = "doc_id",
    gain: int = 1,
    offset: int = 0,
    extra: int = 0,
) -> DataFrame:
    """Quadratic-phase CHIRP WAV fixture — the d156 fingerprint
    generator.  :func:`synth_pcm_wav`'s linear ramp is spectrally
    STATIC frame-over-frame (frame f+1 = frame f + a constant, which
    moves only the DC bin), so every double-difference fingerprint
    degenerates to zero; a chirp's instantaneous frequency grows with
    t, so band energies move between frames and fingerprints are
    discriminative (measured on the fixture: same-track copies at
    Hamming 0, distinct tracks at 6-17).  Same RIFF container and
    gain/offset contract as synth_pcm_wav; samples are
    s(t) = gain·(((a·t² + b·t + id) mod 2048) − 1024) + offset with
    a = 1 + id%7, b = 3 + id%13, n = 256 + id%64 + extra — every term
    integer and oracle-replayable.  ``extra`` lengthens every track by
    a constant sample count (the LONG-audio fixture for the d170
    chunked-fingerprint tier: extra=1024 gives 20-21 frames, past the
    64-bit head cap ``audio_fingerprint`` documents in
    n_frames_used)."""
    if not (-16 <= gain <= 16 and -1024 <= offset <= 1024):
        raise ValueError(
            "synth_chirp_wav: |gain| <= 16 and |offset| <= 1024 keep "
            "gain*1024 + offset inside int16"
        )
    if extra < 0:
        raise ValueError("synth_chirp_wav: extra must be >= 0")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        def wav(i: int) -> bytes:
            n = 256 + i % 64 + extra
            a, b = 1 + i % 7, 3 + i % 13
            t = np.arange(n, dtype=np.int64)
            samples = (
                gain * ((a * t * t + b * t + i) % 2048 - 1024) + offset
            ).astype("<i2")
            data = samples.tobytes()
            sr, ch = 8000, 1
            fmt = struct.pack("<HHIIHH", 1, ch, sr, sr * ch * 2, ch * 2, 16)
            body = b"WAVEfmt " + struct.pack("<I", 16) + fmt
            body += b"data" + struct.pack("<I", len(data)) + data
            return b"RIFF" + struct.pack("<I", len(body)) + body

        for pdf in batches:
            ids = pdf[id_col].astype(int)
            yield pd.DataFrame(
                [(int(i), wav(int(i))) for i in ids],
                columns=[id_col, "payload"],
            )

    return df.select(id_col).mapInPandas(build, f"{id_col} long, payload binary")


def synth_speech_wav(
    df: DataFrame, id_col: str = "doc_id", gain: int = 1
) -> DataFrame:
    """Speech-shaped WAV fixture for the VAD tier (d165): 64-sample
    blocks cycle through four classes by ``(block + id) % 4`` —
    SILENCE (class 0: ``(3t + id) mod 16 − 8``, amplitude ~8), LOUD
    (classes 1-2: the chirp formula mod 2048, amplitude ~1024), and
    MEDIUM (class 3: the chirp formula mod 720, amplitude ~360, whose
    frame energy lands strictly BETWEEN the d165 open and close
    thresholds, so only the hysteresis rule decides it).  The per-id
    phase shift makes segment layouts differ across documents;
    ``n = 512 + (id % 8)·64`` samples.  Same RIFF/gain contract as
    :func:`synth_chirp_wav`; every term is integer and
    oracle-replayable."""
    if not -16 <= gain <= 16:
        raise ValueError("synth_speech_wav: |gain| <= 16 keeps int16")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        def wav(i: int) -> bytes:
            n = 512 + (i % 8) * 64
            a, b = 1 + i % 7, 3 + i % 13
            t = np.arange(n, dtype=np.int64)
            cls = (t // 64 + i) % 4
            loud = (a * t * t + b * t + i) % 2048 - 1024
            med = (a * t * t + b * t + i) % 720 - 360
            sil = (3 * t + i) % 16 - 8
            base = np.where(cls == 0, sil, np.where(cls == 3, med, loud))
            samples = (gain * base).astype("<i2")
            data = samples.tobytes()
            sr, ch = 8000, 1
            fmt = struct.pack("<HHIIHH", 1, ch, sr, sr * ch * 2, ch * 2, 16)
            body = b"WAVEfmt " + struct.pack("<I", 16) + fmt
            body += b"data" + struct.pack("<I", len(data)) + data
            return b"RIFF" + struct.pack("<I", len(body)) + body

        for pdf in batches:
            ids = pdf[id_col].astype(int)
            yield pd.DataFrame(
                [(int(i), wav(int(i))) for i in ids],
                columns=[id_col, "payload"],
            )

    return df.select(id_col).mapInPandas(build, f"{id_col} long, payload binary")


def vad_segments(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_len: int = 64,
    open_num: int = 1,
    open_den: int = 4,
    close_num: int = 1,
    close_den: int = 16,
) -> DataFrame:
    """Voice-activity ENERGY SEGMENTATION (d165) — the segment-before-
    transcribe step every training-data audio pipeline runs (VERDICT
    r12 #3): per non-overlapping ``frame_len``-sample frame compute
    the exact integer energy Σ s², then run a HYSTERESIS state
    machine against thresholds RELATIVE to the file's peak frame
    energy —

    * OPEN  when  e · open_den  >= peak · open_num   (default e ≥ peak/4),
    * CLOSE when  e · close_den <  peak · close_num  (default e < peak/16),
    * otherwise HOLD the previous state (initial state: closed)

    — and emit the active islands (the c57 gaps-and-islands session
    pattern applied inside the sample array): (id, seg_no, f0, f1,
    n_frames, energy), seg_no 1-based in time order, energy = Σ frame
    energies over the segment.  Because both thresholds are ratios of
    exact integers, a uniform volume change (gain g scales every
    energy by exactly g²) multiplies BOTH sides of each comparison by
    g² — segmentation is EXACTLY volume-invariant (the d165b twin).
    Trailing samples short of a full frame are ignored; files without
    one full frame (or non-PCM16-mono) skip.  Scale: pure Arrow
    mapInPandas, zero shuffles, per-file state bounded by file
    length."""
    if frame_len < 1:
        raise ValueError("vad_segments: frame_len must be >= 1")
    if min(open_num, open_den, close_num, close_den) < 1:
        raise ValueError("vad_segments: threshold ratios must be positive")
    if close_num * open_den >= open_num * close_den:
        raise ValueError(
            "vad_segments: close threshold must be strictly below the "
            "open threshold (hysteresis needs a dead band)"
        )

    def segs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        def parse(b: bytes):
            if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                return None
            pos, ch, bits, codec, data = 12, None, None, None, None
            while pos + 8 <= len(b):
                cid = b[pos : pos + 4]
                (clen,) = struct.unpack("<I", b[pos + 4 : pos + 8])
                if cid == b"fmt " and clen >= 16:
                    codec, ch, _, _, _, bits = struct.unpack(
                        "<HHIIHH", b[pos + 8 : pos + 24]
                    )
                elif cid == b"data":
                    data = b[pos + 8 : pos + 8 + clen]
                    if len(data) != clen:
                        return None
                pos += 8 + clen + (clen & 1)
            if codec != 1 or ch != 1 or bits != 16 or data is None:
                return None
            return np.frombuffer(data, dtype="<i2").astype(np.int64)

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                s = parse(bytes(buf))
                if s is None or s.size < frame_len:
                    continue
                nf = s.size // frame_len
                e = (
                    (s[: nf * frame_len] ** 2)
                    .reshape(nf, frame_len)
                    .sum(axis=1)
                )
                peak = int(e.max())
                # vectorized hysteresis (VERDICT r13 #5): the two
                # threshold masks are mutually exclusive (the dead-band
                # validation guarantees open implies not-close), so the
                # state at frame f is the most recent non-hold event —
                # a forward-fill via running max of event indices.
                # int64 is exact here: e <= 32768^2 * frame_len and the
                # ratio factors are small integers.
                ev = np.where(
                    e * open_den >= peak * open_num,
                    1,
                    np.where(e * close_den < peak * close_num, 0, -1),
                )
                idx = np.where(ev >= 0, np.arange(nf), -1)
                np.maximum.accumulate(idx, out=idx)
                state = np.where(idx >= 0, ev[np.maximum(idx, 0)], 0)
                # islands of state==1 (the c57 gaps-and-islands shape,
                # vectorized): starts/ends from the state delta, exact
                # per-segment energy from one prefix sum
                d = np.diff(np.concatenate(([0], state, [0])))
                starts = np.where(d == 1)[0]
                ends = np.where(d == -1)[0]  # exclusive
                csum = np.concatenate(([0], np.cumsum(e)))
                for seg_no, (a, b) in enumerate(zip(starts, ends), 1):
                    rows.append(
                        (
                            int(i),
                            seg_no,
                            int(a),
                            int(b - 1),
                            int(b - a),
                            int(csum[b] - csum[a]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "seg_no", "f0", "f1", "n_frames", "energy"],
            )

    return df.mapInPandas(
        segs,
        f"{id_col} long, seg_no int, f0 int, f1 int, n_frames int,"
        " energy long",
    )


def _resample_scaled(s, up: int, down: int):
    """The multiplied-through rational linear resample: int64 sample
    vector → (j, y_scaled) int64 vectors with y_scaled[j] = up·s[i0] +
    r·(s[i0+1] − s[i0]), i0 = (j·down)//up, r = (j·down) mod up, and
    n_out = ((n−1)·up)//down + 1. Pure integer arithmetic; r > 0
    implies i0 + 1 < n (num ≤ (n−1)·up forces r = 0 at the last
    sample), so the guard index never contributes."""
    import numpy as np

    n = s.size
    n_out = ((n - 1) * up) // down + 1
    j = np.arange(n_out, dtype=np.int64)
    num = j * down
    i0 = num // up
    r = num % up
    s1 = np.where(i0 + 1 < n, s[np.minimum(i0 + 1, n - 1)], 0)
    return j, up * s[i0] + r * (s1 - s[i0])


def resample_pcm_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    up: int = 3,
    down: int = 2,
) -> DataFrame:
    """REAL audio resampling with no audio library — the resample stub
    closed for the linear-interpolation tier: parse the WAV container
    (RIFF walk, PCM mono 16-bit fmt), lift the int16 samples, and
    resample by the rational factor ``up/down`` with linear
    interpolation on the original sample grid — output j sits at input
    position j·down/up, so y[j] = s[i0] + frac·(s[i0+1] − s[i0]) with
    i0 = (j·down)//up, frac = (j·down mod up)/up.

    Hash-certification trick: every statistic is computed on the
    MULTIPLIED-THROUGH value y_scaled[j] = up·s[i0] +
    (j·down mod up)·(s[i0+1] − s[i0]) — pure INTEGER arithmetic, no
    float division anywhere, so the oracle replays it exactly (the
    CUSUM multiply-through precedent). n_out = ((n−1)·up)//down + 1
    covers exactly the positions inside the input span; when frac = 0
    the s[i0+1] term vanishes, so the final sample never reads past the
    end. Anything non-PCM/mono/16-bit or structurally broken degrades
    to skip. Scale: pure mapInPandas, zero shuffles, one output row per
    file.

    Returns (id, sr_in, sr_out, n_in, n_out, sum_scaled, min_scaled,
    max_scaled, pos_sum) — pos_sum = Σ y_scaled[j]·(j+1), the
    order-sensitive checksum a mis-phased resampler cannot fake."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        def parse(b: bytes):
            if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                return None
            pos, sr, ch, bits, data = 12, None, None, None, None
            while pos + 8 <= len(b):
                cid = b[pos : pos + 4]
                (clen,) = struct.unpack("<I", b[pos + 4 : pos + 8])
                if cid == b"fmt " and clen >= 16:
                    codec, ch, sr, _, _, bits = struct.unpack(
                        "<HHIIHH", b[pos + 8 : pos + 24]
                    )
                    if codec != 1:
                        return None
                elif cid == b"data":
                    data = b[pos + 8 : pos + 8 + clen]
                    if len(data) != clen:
                        return None
                pos += 8 + clen + (clen & 1)
            if sr is None or data is None or ch != 1 or bits != 16:
                return None
            return sr, np.frombuffer(data, dtype="<i2").astype(np.int64)

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                try:
                    got = parse(bytes(buf))
                except Exception:
                    got = None
                if got is None:
                    continue
                sr, s = got
                n = s.size
                if n < 2:
                    continue
                j, ys = _resample_scaled(s, up, down)
                n_out = j.size
                rows.append(
                    (
                        int(i),
                        int(sr),
                        int(sr * up // down),
                        int(n),
                        int(n_out),
                        int(ys.sum()),
                        int(ys.min()),
                        int(ys.max()),
                        int((ys * (j + 1)).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "sr_in", "sr_out", "n_in", "n_out",
                    "sum_scaled", "min_scaled", "max_scaled", "pos_sum",
                ],
            )

    return df.mapInPandas(
        stats,
        f"{id_col} long, sr_in int, sr_out int, n_in long, n_out long, "
        "sum_scaled long, min_scaled long, max_scaled long, pos_sum long",
    )


def sinc_taps(up: int, down: int, half: int = 4, scale: int = 1 << 14):
    """Fixed-point POLYPHASE WINDOWED-SINC filter bank (r10, d119) —
    how production resamplers actually run (SoX/speexdsp-style): one
    integer tap row per output phase p ∈ 0..up−1, tap m ∈ −half+1..half
    weighting input sample i0+m for an output at position i0 + p/up,
    coefficient round(scale · sinc(d) · hann(d)) with d = m − p/up and
    hann(d) = ½ + ½cos(πd/half). Pure ``math`` module (no numpy) so the
    SAME call can build both the executor-side filter and the DuckDB
    oracle's literal tap table — bit-identical by construction; the
    float→int quantization happens HERE, once, and the certified
    contract is the integer convolution. Phase 0 degenerates to the
    identity tap row (sinc vanishes at nonzero integers), so aligned
    outputs reproduce inputs exactly at DC gain ``scale``.

    Upsampling form (cutoff at the input Nyquist): for down > up,
    scale the cutoff by up/down before calling — documented, not
    needed by the d119 tier."""
    import math

    taps = []
    for ph in range(up):
        frac = ph / up
        row = []
        for m in range(-half + 1, half + 1):
            d = m - frac
            if abs(d) >= half:
                row.append(0)
                continue
            sinc = 1.0 if d == 0 else math.sin(math.pi * d) / (math.pi * d)
            window = 0.5 + 0.5 * math.cos(math.pi * d / half)
            row.append(round(scale * sinc * window))
        taps.append(row)
    return taps


def resample_fir_stats(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    up: int = 160,
    down: int = 147,
    taps=None,
) -> DataFrame:
    """Arbitrary-ratio polyphase FIR resampling (r10, d119) — the
    windowed-sinc tier above d109's linear interpolation, at the
    CD→DAT ratio 160/147 (44.1 kHz → 48 kHz) by default: parse the WAV
    container (same RIFF walk as ``resample_pcm_stats``), then for
    output j at input position j·down/up compute the PURE-INTEGER
    convolution y_scaled[j] = Σ_m taps[phase][m] · s[i0+m] with
    i0 = (j·down)//up, phase = (j·down) mod up, zero-padding outside
    the signal. No float arithmetic anywhere past tap construction, so
    the oracle replays every output sample exactly; the checksum
    Σ y_scaled·(j+1) catches phase, boundary, and tap-selection errors.
    Same output schema as the linear tier. Scale: pure mapInPandas,
    zero shuffles, one output row per file."""
    if taps is None:
        taps = sinc_taps(up, down)

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        C = np.asarray(taps, dtype=np.int64)  # (up, 2*half)
        half = C.shape[1] // 2

        def parse(b: bytes):
            if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                return None
            pos, sr, ch, bits, data = 12, None, None, None, None
            while pos + 8 <= len(b):
                cid = b[pos : pos + 4]
                (clen,) = struct.unpack("<I", b[pos + 4 : pos + 8])
                if cid == b"fmt " and clen >= 16:
                    codec, ch, sr, _, _, bits = struct.unpack(
                        "<HHIIHH", b[pos + 8 : pos + 24]
                    )
                    if codec != 1:
                        return None
                elif cid == b"data":
                    data = b[pos + 8 : pos + 8 + clen]
                    if len(data) != clen:
                        return None
                pos += 8 + clen + (clen & 1)
            if sr is None or data is None or ch != 1 or bits != 16:
                return None
            return sr, np.frombuffer(data, dtype="<i2").astype(np.int64)

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                try:
                    got = parse(bytes(buf))
                except Exception:
                    got = None
                if got is None:
                    continue
                sr, s = got
                n = s.size
                if n < 2:
                    continue
                n_out = ((n - 1) * up) // down + 1
                j = np.arange(n_out, dtype=np.int64)
                num = j * down
                i0 = num // up
                ph = num % up
                pad = np.zeros(n + 2 * half - 1, dtype=np.int64)
                pad[half - 1 : half - 1 + n] = s
                ys = np.zeros(n_out, dtype=np.int64)
                for t_idx, m in enumerate(range(-half + 1, half + 1)):
                    ys += C[ph, t_idx] * pad[i0 + m + half - 1]
                rows.append(
                    (
                        int(i),
                        int(sr),
                        int(sr * up // down),
                        int(n),
                        int(n_out),
                        int(ys.sum()),
                        int(ys.min()),
                        int(ys.max()),
                        int((ys * (j + 1)).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "sr_in", "sr_out", "n_in", "n_out",
                    "sum_scaled", "min_scaled", "max_scaled", "pos_sum",
                ],
            )

    return df.mapInPandas(
        stats,
        f"{id_col} long, sr_in int, sr_out int, n_in long, n_out long, "
        "sum_scaled long, min_scaled long, max_scaled long, pos_sum long",
    )


def _jpeg_encode_color_420(yc, cbc, crc, qt_luma, qt_chroma):
    """Encode quantized coefficient grids into a baseline YCbCr 4:2:0
    color JPEG — interleaved MCU scan (Y00 Y01 Y10 Y11 Cb Cr), separate
    luma/chroma quant + Huffman tables, per-component DC predictors.

    yc: (2·my, 2·mx, 8, 8) luma coefficients; cbc/crc: (my, mx, 8, 8);
    image dimensions (my·16, mx·16)."""
    import struct

    zz = _jpeg_zigzag()
    my, mx = cbc.shape[0], cbc.shape[1]
    h, w = my * 16, mx * 16
    dc_codes = _canonical_codes(_JPEG_DC_LENGTHS)
    ac_codes = _canonical_codes(_JPEG_AC_LENGTHS)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(payload)) + payload

    out = bytearray(b"\xff\xd8")
    for tid, qt in ((0, qt_luma), (1, qt_chroma)):
        qzz = bytes(int(qt[r][c]) for r, c in zz)
        out += seg(0xDB, bytes([tid]) + qzz)
    out += seg(
        0xC0,
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    # the same canonical tables registered under BOTH table ids —
    # exercises the 4-table DHT parse without changing code assignments
    for tid in (0, 1):
        out += seg(0xC4, _dht_payload(0, tid, _JPEG_DC_LENGTHS))
        out += seg(0xC4, _dht_payload(1, tid, _JPEG_AC_LENGTHS))
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))

    wtr = _BitWriter()

    def put_amplitude(v):
        s = int(v).bit_length() if v > 0 else int(-v).bit_length()
        bits = v if v > 0 else v + (1 << s) - 1
        return s, bits

    def put_block(block, pred):
        dc = int(block[0, 0])
        diff = dc - pred
        if diff == 0:
            c, ln = dc_codes[0]
            wtr.write(c, ln)
        else:
            s, bits = put_amplitude(diff)
            c, ln = dc_codes[s]
            wtr.write(c, ln)
            wtr.write(bits, s)
        acs = [int(block[r][cc]) for r, cc in zz[1:]]
        run = 0
        for v in acs:
            if v == 0:
                run += 1
                continue
            while run >= 16:
                c, ln = ac_codes[0xF0]
                wtr.write(c, ln)
                run -= 16
            s, bits = put_amplitude(v)
            c, ln = ac_codes[(run << 4) | s]
            wtr.write(c, ln)
            wtr.write(bits, s)
            run = 0
        if run:
            c, ln = ac_codes[0x00]
            wtr.write(c, ln)
        return dc

    py = pcb = pcr = 0
    for m_y in range(my):
        for m_x in range(mx):
            for dy in (0, 1):
                for dx in (0, 1):
                    py = put_block(yc[2 * m_y + dy, 2 * m_x + dx], py)
            pcb = put_block(cbc[m_y, m_x], pcb)
            pcr = put_block(crc[m_y, m_x], pcr)
    out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _jpeg_decode_color_420(b):
    """Decode a baseline YCbCr 4:2:0 color JPEG to an (h, w, 3) uint8 RGB
    grid, or None when out of scope / broken: interleaved-MCU Huffman
    decode with per-component DC predictors, dual quant tables, sample-
    replication chroma upsampling, JFIF YCbCr→RGB with floor(x+0.5)
    rounding."""
    import struct

    import numpy as np

    if b[:2] != b"\xff\xd8":
        return None
    zz = _jpeg_zigzag()
    pos = 2
    qtables = {}
    huff = {}
    w = h = None
    comps = None
    scan_tabs = None
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        payload = b[pos + 4 : pos + 2 + ln]
        if len(payload) != ln - 2:
            return None
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 15
                if pq != 0:
                    return None
                vals = payload[p + 1 : p + 65]
                if len(vals) != 64:
                    return None
                q = np.zeros((8, 8), dtype=np.int64)
                for (r, c), v in zip(zz, vals):
                    q[r, c] = v
                qtables[tq] = q
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 15
                counts = payload[p + 1 : p + 17]
                nsym = sum(counts)
                syms = payload[p + 17 : p + 17 + nsym]
                if len(syms) != nsym:
                    return None
                table = {}
                code = 0
                k = 0
                for lln in range(1, 17):
                    for _ in range(counts[lln - 1]):
                        table[(code, lln)] = syms[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tc, th)] = table
                p += 17 + nsym
        elif marker == 0xC0:
            prec = payload[0]
            h, w = struct.unpack(">HH", payload[1:5])
            ncomp = payload[5]
            if prec != 8 or ncomp != 3:
                return None
            comps = {}
            for ci in range(3):
                cid = payload[6 + 3 * ci]
                samp = payload[7 + 3 * ci]
                tq = payload[8 + 3 * ci]
                comps[cid] = (samp, tq)
            # strict 4:2:0: Y 2x2, chroma 1x1
            if comps.get(1, (0, 0))[0] != 0x22:
                return None
            if comps.get(2, (0, 0))[0] != 0x11 or comps.get(3, (0, 0))[0] != 0x11:
                return None
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xDD):
            return None
        elif marker == 0xDA:
            ns = payload[0]
            if ns != 3:
                return None
            scan_tabs = {}
            for si in range(3):
                cid = payload[1 + 2 * si]
                scan_tabs[cid] = (payload[2 + 2 * si] >> 4, payload[2 + 2 * si] & 15)
            pos = pos + 2 + ln
            break
        pos += 2 + ln
    if scan_tabs is None or comps is None or w is None:
        return None
    for cid in (1, 2, 3):
        if comps[cid][1] not in qtables:
            return None
        td, ta = scan_tabs[cid]
        if (0, td) not in huff or (1, ta) not in huff:
            return None

    data = bytearray()
    p = pos
    while p < len(b):
        byte = b[p]
        if byte == 0xFF:
            nxt = b[p + 1] if p + 1 < len(b) else None
            if nxt == 0x00:
                data.append(0xFF)
                p += 2
                continue
            break
        data.append(byte)
        p += 1

    class Bits:
        def __init__(self, buf):
            self.buf = buf
            self.pos = 0

        def read1(self):
            byte_i, bit_i = self.pos >> 3, self.pos & 7
            if byte_i >= len(self.buf):
                raise EOFError
            self.pos += 1
            return (self.buf[byte_i] >> (7 - bit_i)) & 1

        def read(self, n):
            v = 0
            for _ in range(n):
                v = (v << 1) | self.read1()
            return v

        def huffman(self, table):
            code, lln = 0, 0
            while lln < 16:
                code = (code << 1) | self.read1()
                lln += 1
                sym = table.get((code, lln))
                if sym is not None:
                    return sym
            raise EOFError

    def extend(bits, s):
        if s == 0:
            return 0
        if bits >> (s - 1):
            return bits
        return bits - (1 << s) + 1

    mx, my = (w + 15) // 16, (h + 15) // 16
    yc = np.zeros((2 * my, 2 * mx, 8, 8), dtype=np.int64)
    cbc = np.zeros((my, mx, 8, 8), dtype=np.int64)
    crc = np.zeros((my, mx, 8, 8), dtype=np.int64)
    rdr = Bits(bytes(data))
    preds = {1: 0, 2: 0, 3: 0}

    def read_block(cid, target):
        dc_tab = huff[(0, scan_tabs[cid][0])]
        ac_tab = huff[(1, scan_tabs[cid][1])]
        s = rdr.huffman(dc_tab)
        preds[cid] += extend(rdr.read(s), s)
        target[0, 0] = preds[cid]
        k = 1
        while k < 64:
            rs = rdr.huffman(ac_tab)
            if rs == 0x00:
                break
            if rs == 0xF0:
                k += 16
                continue
            run, size = rs >> 4, rs & 15
            k += run
            if k > 63 or size == 0:
                raise EOFError
            r, c = zz[k]
            target[r, c] = extend(rdr.read(size), size)
            k += 1

    try:
        for m_y in range(my):
            for m_x in range(mx):
                for dy in (0, 1):
                    for dx in (0, 1):
                        read_block(1, yc[2 * m_y + dy, 2 * m_x + dx])
                read_block(2, cbc[m_y, m_x])
                read_block(3, crc[m_y, m_x])
    except EOFError:
        return None

    return _jpeg_color_reconstruct(
        yc, cbc, crc,
        qtables[comps[1][1]], qtables[comps[2][1]], qtables[comps[3][1]],
        w, h,
    )


def _jpeg_color_reconstruct(yc, cbc, crc, qy, qcb, qcr, w, h):
    """Dequant + IDCT per plane, 4:2:0 sample-replication upsampling,
    JFIF YCbCr→RGB — shared by the baseline (interleaved scan) and
    progressive (multi-scan accumulated) color decoders."""
    import numpy as np

    my, mx = cbc.shape[0], cbc.shape[1]
    alpha = np.full(8, np.sqrt(2.0 / 8.0))
    alpha[0] = np.sqrt(1.0 / 8.0)
    xs = np.arange(8)
    C = alpha[:, None] * np.cos((2 * xs[None, :] + 1) * xs[:, None] * np.pi / 16.0)

    def plane(coefs, q):
        deq = coefs * q[None, None, :, :]
        sp = np.einsum("ux,vy,bcuv->bcxy", C, C, deq.astype(np.float64))
        by, bx = coefs.shape[0], coefs.shape[1]
        return (sp + 128.0).transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)

    yp = plane(yc, qy)
    cbp = plane(cbc, qcb)
    crp = plane(crc, qcr)
    # 4:2:0 upsampling by sample replication
    cbu = np.repeat(np.repeat(cbp, 2, axis=0), 2, axis=1)
    cru = np.repeat(np.repeat(crp, 2, axis=0), 2, axis=1)
    yv, cb, cr = yp[: my * 16, : mx * 16], cbu - 128.0, cru - 128.0
    r = yv + 1.402 * cr
    g = yv - 0.344136 * cb - 0.714136 * cr
    bl = yv + 1.772 * cb
    rgb = np.stack([r, g, bl], axis=-1)
    out = np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)
    return out[:h, :w]


def _jpeg_encode_color_420_progressive(
    yc, cbc, crc, qt_luma, qt_chroma, sa: bool = False, al: int = 1
):
    """Encode quantized 4:2:0 coefficient grids as a PROGRESSIVE color
    JPEG (SOF2, r10 d126) — the structure T.81 §G prescribes for color:
    ONE INTERLEAVED DC scan (all three components in MCU order,
    per-component predictors), then one NON-interleaved AC scan per
    component over that component's own block raster (1–63; progressive
    AC scans are single-component BY SPEC). ``sa=True`` (r10, d128)
    emits the full SUCCESSIVE-APPROXIMATION script: DC/AC first scans
    at point transform ``al`` (must be 1), then an interleaved one-bit
    DC refinement and three per-component AC refinements. Same
    tables/geometry as ``_jpeg_encode_color_420``."""
    if sa and al != 1:
        raise ValueError("single-refinement SA only: al must be 1")
    a0 = al if sa else 0
    import struct

    zz = _jpeg_zigzag()
    my, mx = cbc.shape[0], cbc.shape[1]
    h, w = my * 16, mx * 16
    dc_codes = _canonical_codes(_JPEG_DC_LENGTHS)
    ac_codes = _canonical_codes(_JPEG_AC_LENGTHS)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(payload)) + payload

    out = bytearray(b"\xff\xd8")
    for tid, qt in ((0, qt_luma), (1, qt_chroma)):
        qzz = bytes(int(qt[r][c]) for r, c in zz)
        out += seg(0xDB, bytes([tid]) + qzz)
    out += seg(
        0xC2,
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    for tid in (0, 1):
        out += seg(0xC4, _dht_payload(0, tid, _JPEG_DC_LENGTHS))
        out += seg(0xC4, _dht_payload(1, tid, _JPEG_AC_LENGTHS))

    wtr = _BitWriter()

    def put_dc(block, pred):
        dc = int(block[0, 0]) >> a0  # arithmetic shift (spec, a0=0 plain)
        diff = dc - pred
        if diff == 0:
            c, ln = dc_codes[0]
            wtr.write(c, ln)
        else:
            s, bits = _jpeg_put_amplitude(diff)
            c, ln = dc_codes[s]
            wtr.write(c, ln)
            wtr.write(bits, s)
        return dc

    # scan 1: interleaved DC first (Ss=Se=0, Al=a0), MCU order
    out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0, a0]))
    py = pcb = pcr = 0
    for m_y in range(my):
        for m_x in range(mx):
            for dy in (0, 1):
                for dx in (0, 1):
                    py = put_dc(yc[2 * m_y + dy, 2 * m_x + dx], py)
            pcb = put_dc(cbc[m_y, m_x], pcb)
            pcr = put_dc(crc[m_y, m_x], pcr)
    out += wtr.flush()

    # scans 2-4: per-component AC 1-63 first (Al=a0), block raster
    for cid, tid, grid in ((1, 0, yc), (2, 1, cbc), (3, 1, crc)):
        out += seg(0xDA, bytes([1, cid, (tid << 4) | tid, 1, 63, a0]))
        wtr = _BitWriter()
        for by_ in range(grid.shape[0]):
            for bx_ in range(grid.shape[1]):
                block = grid[by_, bx_]
                run = 0
                for rr, cc in zz[1:]:
                    v = int(block[rr, cc])
                    if a0:
                        v = (abs(v) >> a0) * (1 if v > 0 else -1)
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        c, ln = ac_codes[0xF0]
                        wtr.write(c, ln)
                        run -= 16
                    s, bits = _jpeg_put_amplitude(v)
                    c, ln = ac_codes[(run << 4) | s]
                    wtr.write(c, ln)
                    wtr.write(bits, s)
                    run = 0
                if run:
                    c, ln = ac_codes[0x00]
                    wtr.write(c, ln)
        out += wtr.flush()
    if sa:
        # scan 5: interleaved DC refinement — one bit per block, MCU order
        out += seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0,
                                (al << 4) | (al - 1)]))
        wtr = _BitWriter()
        for m_y in range(my):
            for m_x in range(mx):
                for dy in (0, 1):
                    for dx in (0, 1):
                        wtr.write(
                            (int(yc[2 * m_y + dy, 2 * m_x + dx, 0, 0])
                             >> (al - 1)) & 1, 1)
                wtr.write((int(cbc[m_y, m_x, 0, 0]) >> (al - 1)) & 1, 1)
                wtr.write((int(crc[m_y, m_x, 0, 0]) >> (al - 1)) & 1, 1)
        out += wtr.flush()
        # scans 6-8: per-component AC refinement (shared helper)
        for cid, tid, grid in ((1, 0, yc), (2, 1, cbc), (3, 1, crc)):
            out += seg(0xDA, bytes([1, cid, (tid << 4) | tid, 1, 63,
                                    (al << 4) | (al - 1)]))
            wtr = _BitWriter()
            _jpeg_emit_ac_refine(wtr, grid, zz, ac_codes, al)
            out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


def _jpeg_decode_color_420_progressive(b):
    """Decode a PROGRESSIVE 4:2:0 color JPEG (SOF2, spectral selection,
    Ah=Al=0) to (h, w, 3) RGB, or None when out of scope / broken: the
    interleaved DC scan walks MCUs with per-component predictors;
    single-component AC scans walk that component's block raster with
    EOBRUN handling; coefficients accumulate across scans before the
    shared 4:2:0 reconstruction."""
    import struct

    import numpy as np

    if b[:2] != b"\xff\xd8":
        return None
    zz = _jpeg_zigzag()
    pos = 2
    qtables = {}
    huff = {}
    w = h = None
    comps = None
    scans = []  # (ncomp, comp_spec, ss, se, ah, al, data)
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        payload = b[pos + 4 : pos + 2 + ln]
        if len(payload) != ln - 2:
            return None
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 15
                if pq != 0:
                    return None
                vals = payload[p + 1 : p + 65]
                if len(vals) != 64:
                    return None
                q = np.zeros((8, 8), dtype=np.int64)
                for (r, c), v in zip(zz, vals):
                    q[r, c] = v
                qtables[tq] = q
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 15
                counts = payload[p + 1 : p + 17]
                nsym = sum(counts)
                syms = payload[p + 17 : p + 17 + nsym]
                if len(syms) != nsym:
                    return None
                table = {}
                code = 0
                k = 0
                for lln in range(1, 17):
                    for _ in range(counts[lln - 1]):
                        table[(code, lln)] = syms[k]
                        code += 1
                        k += 1
                    code <<= 1
                huff[(tc, th)] = table
                p += 17 + nsym
        elif marker == 0xC2:
            if payload[0] != 8 or payload[5] != 3:
                return None
            h, w = struct.unpack(">HH", payload[1:5])
            comps = {}
            for ci in range(3):
                cid = payload[6 + 3 * ci]
                samp = payload[7 + 3 * ci]
                tq = payload[8 + 3 * ci]
                comps[cid] = (samp, tq)
            if comps.get(1, (0,))[0] != 0x22:
                return None  # luma 2x2 only (4:2:0)
            for cid in (2, 3):
                if comps.get(cid, (0,))[0] != 0x11:
                    return None
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xDD):
            return None
        elif marker == 0xDA:
            ncomp = payload[0]
            spec = []
            for si in range(ncomp):
                spec.append(
                    (payload[1 + 2 * si], payload[2 + 2 * si] >> 4,
                     payload[2 + 2 * si] & 15)
                )
            ss, se = payload[1 + 2 * ncomp], payload[2 + 2 * ncomp]
            ahal = payload[3 + 2 * ncomp]
            data = bytearray()
            p = pos + 2 + ln
            while p < len(b):
                byte = b[p]
                if byte == 0xFF:
                    nxt = b[p + 1] if p + 1 < len(b) else None
                    if nxt == 0x00:
                        data.append(0xFF)
                        p += 2
                        continue
                    break
                data.append(byte)
                p += 1
            scans.append(
                (ncomp, spec, ss, se, ahal >> 4, ahal & 15, bytes(data))
            )
            pos = p
            continue
        pos += 2 + ln
    if w is None or comps is None or not scans:
        return None
    for cid in (1, 2, 3):
        if cid not in comps or comps[cid][1] not in qtables:
            return None

    class Bits:
        def __init__(self, buf):
            self.buf = buf
            self.pos = 0

        def read1(self):
            byte_i, bit_i = self.pos >> 3, self.pos & 7
            if byte_i >= len(self.buf):
                raise EOFError
            self.pos += 1
            return (self.buf[byte_i] >> (7 - bit_i)) & 1

        def read(self, n):
            v = 0
            for _ in range(n):
                v = (v << 1) | self.read1()
            return v

        def huffman(self, table):
            code, lln = 0, 0
            while lln < 16:
                code = (code << 1) | self.read1()
                lln += 1
                sym = table.get((code, lln))
                if sym is not None:
                    return sym
            raise EOFError

    def extend(bits, s):
        if s == 0:
            return 0
        if bits >> (s - 1):
            return bits
        return bits - (1 << s) + 1

    mx, my = (w + 15) // 16, (h + 15) // 16
    grids = {
        1: np.zeros((2 * my, 2 * mx, 8, 8), dtype=np.int64),
        2: np.zeros((my, mx, 8, 8), dtype=np.int64),
        3: np.zeros((my, mx, 8, 8), dtype=np.int64),
    }
    # successive-approximation state (r10, d128): refinement depth per
    # channel — None until the first scan; a refinement must present
    # Ah == previous Al and Al == Ah − 1 (the d123 bookkeeping, split
    # into the DC chain and three per-component AC chains)
    dc_state = None
    ac_state = {1: None, 2: None, 3: None}
    try:
        for ncomp, spec, ss, se, ah, al, data in scans:
            rdr = Bits(data)
            if ss == 0:
                # interleaved DC scan over MCUs
                if se != 0 or ncomp != 3:
                    return None
                if ah == 0:
                    if dc_state is not None:
                        return None
                elif dc_state != ah or al != ah - 1:
                    return None
                dc_state = al
                if ah == 0:
                    tabs = {cid: huff.get((0, td)) for cid, td, _ in spec}
                    if any(t is None for t in tabs.values()):
                        return None
                    preds = {1: 0, 2: 0, 3: 0}

                    def read_dc(cid, target):
                        s = rdr.huffman(tabs[cid])
                        preds[cid] += extend(rdr.read(s), s)
                        target[0, 0] = preds[cid] << al

                    for m_y in range(my):
                        for m_x in range(mx):
                            for dy in (0, 1):
                                for dx in (0, 1):
                                    read_dc(
                                        1, grids[1][2 * m_y + dy, 2 * m_x + dx]
                                    )
                            read_dc(2, grids[2][m_y, m_x])
                            read_dc(3, grids[3][m_y, m_x])
                else:
                    # interleaved DC refinement: one bit per block, MCU order
                    for m_y in range(my):
                        for m_x in range(mx):
                            for dy in (0, 1):
                                for dx in (0, 1):
                                    if rdr.read1():
                                        grids[1][
                                            2 * m_y + dy, 2 * m_x + dx, 0, 0
                                        ] |= 1 << al
                            if rdr.read1():
                                grids[2][m_y, m_x, 0, 0] |= 1 << al
                            if rdr.read1():
                                grids[3][m_y, m_x, 0, 0] |= 1 << al
            else:
                # single-component AC band scan over the block raster
                if ncomp != 1 or se > 63:
                    return None
                cid, _, ta = spec[0]
                if cid not in grids or ss != 1 or se != 63:
                    return None
                if ah == 0:
                    if ac_state[cid] is not None:
                        return None
                elif ac_state[cid] != ah or al != ah - 1:
                    return None
                ac_state[cid] = al
                ac_tab = huff.get((1, ta))
                if ac_tab is None:
                    return None
                grid = grids[cid]
                if ah != 0:
                    _jpeg_decode_ac_refine(grid, zz, rdr, ac_tab, ss, se, al)
                    continue
                eobrun = 0
                for by_ in range(grid.shape[0]):
                    for bx_ in range(grid.shape[1]):
                        if eobrun > 0:
                            eobrun -= 1
                            continue
                        k = ss
                        while k <= se:
                            rs = rdr.huffman(ac_tab)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += rdr.read(r)
                                break
                            k += r
                            if k > se:
                                return None
                            rr, cc = zz[k]
                            grid[by_, bx_, rr, cc] = extend(rdr.read(s), s) << al
                            k += 1
    except (EOFError, ValueError):
        return None
    states = [dc_state] + [ac_state[c] for c in (1, 2, 3)]
    if any(st != 0 for st in states):
        return None  # incomplete scan script / unfinished refinement
    return _jpeg_color_reconstruct(
        grids[1], grids[2], grids[3],
        qtables[comps[1][1]], qtables[comps[2][1]], qtables[comps[3][1]],
        w, h,
    )


def synth_jpeg_color(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Manufacture a REAL baseline YCbCr 4:2:0 COLOR JPEG per row —
    3-component SOF0 (Y 2x2, chroma 1x1), two quant tables, four Huffman
    tables, interleaved MCU scan with per-component DC predictors.
    Dimensions: width = 16·(1 + id%2), height = 16·(1 + (3·id)%2); luma
    block (bx, by) carries DC dc = (5·id + 3·bx + 7·by) mod 21 − 10
    (q0 = 16 ⇒ flat 128 + 2·dc, exact); chroma DCs are ZERO (neutral —
    Cb = Cr = 128 exactly), so YCbCr→RGB collapses to R = G = B = Y with
    no float rounding freedom and the oracle replays every pixel. A
    chroma mis-decode (wrong predictor chain, MCU order, table id, or
    upsampling) shifts the decoded chroma off 128 and the checksum
    catches it; NONZERO chroma is exercised by unit tests against the
    reference conversion. Arrow-batched mapInPandas."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        ql = np.full((8, 8), 16, dtype=np.int64)
        qc = np.full((8, 8), 8, dtype=np.int64)

        def jpeg(i: int) -> bytes:
            mx, my = 1 + i % 2, 1 + (3 * i) % 2
            yc = np.zeros((2 * my, 2 * mx, 8, 8), dtype=np.int64)
            for y in range(2 * my):
                for x in range(2 * mx):
                    yc[y, x, 0, 0] = (5 * i + 3 * x + 7 * y) % 21 - 10
            cbc = np.zeros((my, mx, 8, 8), dtype=np.int64)
            crc = np.zeros((my, mx, 8, 8), dtype=np.int64)
            return _jpeg_encode_color_420(yc, cbc, crc, ql, qc)

        for pdf in batches:
            ids = pdf[id_col].astype(int)
            yield pd.DataFrame(
                [(int(i), jpeg(int(i))) for i in ids],
                columns=[id_col, "payload"],
            )

    return df.select(id_col).mapInPandas(build, f"{id_col} long, payload binary")


def decode_jpeg_color_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL baseline COLOR JPEG decode (YCbCr 4:2:0) with no codec
    library — the d108 grayscale tier extended to the common color
    case: interleaved-MCU Huffman decode with per-component DC
    predictors, dual quant tables, 2×2 sample-replication chroma
    upsampling, JFIF YCbCr→RGB. Emits the standard per-channel stats +
    position-weighted checksum frame (channels 0/1/2 = R/G/B).
    Grayscale, progressive, restart-marker and non-4:2:0 inputs degrade
    to skip. Scale: pure mapInPandas, zero shuffles."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                # baseline first (cheap SOF2 exit), then progressive
                # (r10, d126)
                try:
                    img = _jpeg_decode_color_420(bytes(buf))
                    if img is None:
                        img = _jpeg_decode_color_420_progressive(bytes(buf))
                except Exception:
                    img = None
                if img is None:
                    continue
                h, w = img.shape[0], img.shape[1]
                arr = img.astype(np.int64)
                n = w * h
                xw = np.arange(w) + 1
                yw = np.arange(h) + 2
                wgt = yw[:, None] * xw[None, :]
                for ch in range(3):
                    v = arr[:, :, ch]
                    s, ss = int(v.sum()), int((v * v).sum())
                    mean = s / n
                    rows.append(
                        (
                            int(i),
                            "jpeg",
                            w,
                            h,
                            ch,
                            round(mean, 6),
                            int(v.min()),
                            int(v.max()),
                            round((ss / n - mean * mean) ** 0.5, 6),
                            int((v * wgt).sum()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "format", "width", "height", "channel",
                    "mean", "min", "max", "std", "pos_sum",
                ],
            )

    return df.mapInPandas(
        stats,
        f"{id_col} long, format string, width int, height int, channel int, "
        "mean double, min int, max int, std double, pos_sum long",
    )


def synth_jpeg_color_progressive(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """``synth_jpeg_color`` in the PROGRESSIVE layout (r10, d126):
    identical pixel content — SOF2, one interleaved DC scan, three
    single-component AC scans.  Scan structure must be
    RESULT-INVISIBLE, so d126 reuses d110's oracle verbatim.
    Arrow-batched mapInPandas."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        ql = np.full((8, 8), 16, dtype=np.int64)
        qc = np.full((8, 8), 8, dtype=np.int64)

        def jpeg(i: int) -> bytes:
            mx, my = 1 + i % 2, 1 + (3 * i) % 2
            yc = np.zeros((2 * my, 2 * mx, 8, 8), dtype=np.int64)
            for y in range(2 * my):
                for x in range(2 * mx):
                    yc[y, x, 0, 0] = (5 * i + 3 * x + 7 * y) % 21 - 10
            cbc = np.zeros((my, mx, 8, 8), dtype=np.int64)
            crc = np.zeros((my, mx, 8, 8), dtype=np.int64)
            return _jpeg_encode_color_420_progressive(yc, cbc, crc, ql, qc)

        for pdf in batches:
            ids = pdf[id_col].astype(int)
            yield pd.DataFrame(
                [(int(i), jpeg(int(i))) for i in ids],
                columns=[id_col, "payload"],
            )

    return df.select(id_col).mapInPandas(build, f"{id_col} long, payload binary")


def synth_jpeg_color_progressive_sa(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """``synth_jpeg_color`` in the FULL eight-scan successive-
    approximation progressive layout (r10, d128): DC/AC first scans at
    Al=1, interleaved one-bit DC refinement, three per-component AC
    refinements.  Oracle is d110's verbatim.  Arrow-batched
    mapInPandas."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        ql = np.full((8, 8), 16, dtype=np.int64)
        qc = np.full((8, 8), 8, dtype=np.int64)

        def jpeg(i: int) -> bytes:
            mx, my = 1 + i % 2, 1 + (3 * i) % 2
            yc = np.zeros((2 * my, 2 * mx, 8, 8), dtype=np.int64)
            for y in range(2 * my):
                for x in range(2 * mx):
                    yc[y, x, 0, 0] = (5 * i + 3 * x + 7 * y) % 21 - 10
            cbc = np.zeros((my, mx, 8, 8), dtype=np.int64)
            crc = np.zeros((my, mx, 8, 8), dtype=np.int64)
            return _jpeg_encode_color_420_progressive(
                yc, cbc, crc, ql, qc, sa=True
            )

        for pdf in batches:
            ids = pdf[id_col].astype(int)
            yield pd.DataFrame(
                [(int(i), jpeg(int(i))) for i in ids],
                columns=[id_col, "payload"],
            )

    return df.select(id_col).mapInPandas(build, f"{id_col} long, payload binary")


def _warc_records(i: int, uri: str, html: str) -> list:
    """The two spec-valid WARC/1.0 records (warcinfo + HTTP response)
    for one page, as separate byte strings — exact Content-Lengths,
    CRLF CRLF terminators, UTF-8 bodies. Shared by the plain
    concatenation (``synth_warc``) and the per-record-gzip-member
    Common-Crawl layout (``synth_warc_gz``)."""

    def record(headers: list, block: bytes) -> bytes:
        head = b"WARC/1.0\r\n" + b"".join(
            k.encode() + b": " + v.encode() + b"\r\n" for k, v in headers
        )
        head += b"Content-Length: " + str(len(block)).encode() + b"\r\n\r\n"
        return head + block + b"\r\n\r\n"

    info = record(
        [
            ("WARC-Type", "warcinfo"),
            ("WARC-Record-ID", f"<urn:uuid:info-{i}>"),
            ("WARC-Date", "2024-01-01T00:00:00Z"),
            ("Content-Type", "application/warc-fields"),
        ],
        b"software: pandas-db-sdk-spark synth\r\n",
    )
    body = html.encode("utf-8")
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body
    )
    resp = record(
        [
            ("WARC-Type", "response"),
            ("WARC-Target-URI", uri),
            ("WARC-Record-ID", f"<urn:uuid:resp-{i}>"),
            ("WARC-Date", "2024-01-01T00:00:00Z"),
            ("Content-Type", "application/http; msgtype=response"),
        ],
        http,
    )
    return [info, resp]

def parse_wet(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """WET parsing — the conversion-record sibling of :func:`parse_warc`
    (Common Crawl ships crawl text as WET files: WARC/1.0 containers
    whose records are ``WARC-Type: conversion`` with a text/plain block
    of exactly Content-Length bytes).  Same length-driven record walk,
    same skip-never-error contract; emits one row per conversion
    record: (id, n_records, target_uri, content_length, text).  Gzip
    payloads inflate member-by-member first.  Pure mapInPandas, zero
    shuffles."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        inflate_members = _gz_inflate_members
        records = _warc_split_records

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                try:
                    raw = bytes(buf)
                    if raw[:2] == b"\x1f\x8b":
                        raw = inflate_members(raw)
                    recs = records(raw) if raw is not None else None
                except Exception:
                    recs = None
                if not recs:
                    continue
                for headers, block in recs:
                    try:
                        if headers.get("warc-type") != "conversion":
                            continue
                        clen = headers.get("content-length")
                        rows.append(
                            (
                                int(i),
                                len(recs),
                                headers.get("warc-target-uri"),
                                int(clen) if clen is not None else None,
                                block.decode("utf-8", "replace"),
                            )
                        )
                    except Exception:
                        continue
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_records", "target_uri", "content_length", "text",
                ],
            )

    return df.mapInPandas(
        parse,
        f"{id_col} long, n_records int, target_uri string,"
        " content_length long, text string",
    )


def synth_warc(
    df: DataFrame, html_col: str = "html", uri_col: str = "uri", id_col: str = "doc_id"
) -> DataFrame:
    """Manufacture a REAL WARC/1.0 file per row — the Common-Crawl
    container: a ``warcinfo`` record followed by a ``response`` record
    whose block is a full HTTP/1.1 response (status line, headers,
    blank line, HTML body). Content-Length fields are exact byte
    counts, records end with the spec's CRLF CRLF separator, and bodies
    are UTF-8 — so a parser must honor lengths, not delimiters.
    Arrow-batched mapInPandas, same contract as ``synth_media_payload``."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                [
                    (int(i), b"".join(_warc_records(int(i), u, h)))
                    for i, u, h in zip(pdf[id_col], pdf[uri_col], pdf[html_col])
                ],
                columns=[id_col, "payload"],
            )

    return df.select(id_col, uri_col, html_col).mapInPandas(
        build, f"{id_col} long, payload binary"
    )


def synth_warc_gz(
    df: DataFrame, html_col: str = "html", uri_col: str = "uri", id_col: str = "doc_id"
) -> DataFrame:
    """The Common-Crawl ON-DISK layout: a ``.warc.gz`` where EVERY record
    is its own gzip member and the members are concatenated — the
    property that lets a crawler index byte offsets and a reader inflate
    one record without touching the rest. Deterministic members
    (mtime=0). Same contract as ``synth_warc``."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import gzip

        for pdf in batches:
            yield pd.DataFrame(
                [
                    (
                        int(i),
                        b"".join(
                            gzip.compress(r, mtime=0)
                            for r in _warc_records(int(i), u, h)
                        ),
                    )
                    for i, u, h in zip(pdf[id_col], pdf[uri_col], pdf[html_col])
                ],
                columns=[id_col, "payload"],
            )

    return df.select(id_col, uri_col, html_col).mapInPandas(
        build, f"{id_col} long, payload binary"
    )


def _gz_inflate_members(b: bytes):
    """Inflate a multi-member gzip stream (the ``.warc.gz`` layout):
    each decompressobj consumes ONE member; unused_data carries the
    next member's bytes. None on truncation."""
    import zlib

    out = bytearray()
    buf = b
    while buf:
        d = zlib.decompressobj(wbits=47)  # gzip header + window
        out.extend(d.decompress(buf))
        out.extend(d.flush())
        if not d.eof:  # truncated member
            return None
        buf = d.unused_data
    return bytes(out)


def _gz_member_spans(b: bytes):
    """(offset, length, inflated_bytes) per gzip member — the byte
    geometry a CDX index records so one record can be fetched without
    touching the rest of the file (r10, d129). None on truncation."""
    import zlib

    spans = []
    pos = 0
    while pos < len(b):
        d = zlib.decompressobj(wbits=47)
        chunk = d.decompress(b[pos:]) + d.flush()
        if not d.eof:
            return None
        consumed = len(b) - pos - len(d.unused_data)
        spans.append((pos, consumed, chunk))
        pos += consumed
    return spans


def _warc_split_records(b: bytes):
    """Length-driven WARC record walk: a structural error ANYWHERE
    invalidates the whole file (None), never a partial record list —
    lengths are the only authority, so a bad length would misalign
    every later record. Returns [(headers dict, block bytes)]."""
    out = []
    pos = 0
    while pos < len(b):
        if not b[pos:].startswith(b"WARC/"):
            return None
        hdr_end = b.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            return None
        lines = b[pos:hdr_end].split(b"\r\n")[1:]
        headers = {}
        for ln in lines:
            k, _, v = ln.partition(b":")
            headers[k.strip().lower().decode()] = v.strip().decode(
                "utf-8", "replace"
            )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            return None
        block = b[hdr_end + 4 : hdr_end + 4 + clen]
        if len(block) != clen:
            return None
        out.append((headers, block))
        pos = hdr_end + 4 + clen
        if b[pos : pos + 4] != b"\r\n\r\n":
            return None
        pos += 4
    return out


def parse_warc(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """REAL WARC/1.0 parsing — the FIRST stage of every Common-Crawl
    pipeline, no library: walk records by Content-Length (never by
    delimiter scanning — bodies may contain anything), parse WARC
    headers case-insensitively, and for ``response`` records split the
    HTTP block into status line / headers / body (again by the blank
    line + remaining bytes). Emits one row per response record:
    (id, n_records, warc_type, target_uri, http_status, body string) —
    body decoded UTF-8 so downstream codegen (html_main_text, quality
    gates) chains directly. Gzip payloads (the ``.warc.gz`` on-disk
    layout — one gzip member PER RECORD, members concatenated) are
    sniffed by magic and inflated member-by-member with a stdlib
    decompressobj loop before the record walk, so plain and compressed
    crawls read through the same parser. Structurally broken files
    degrade to skip. Scale: pure mapInPandas, zero shuffles; at 100 TB
    one WARC file is one row of a binaryFile/payload table and the
    fleet is embarrassingly parallel."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        inflate_members = _gz_inflate_members
        records = _warc_split_records

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                try:
                    raw = bytes(buf)
                    if raw[:2] == b"\x1f\x8b":  # gzip magic
                        raw = inflate_members(raw)
                    recs = records(raw) if raw is not None else None
                except Exception:
                    recs = None
                if not recs:
                    continue
                for headers, block in recs:
                    # record-level guard (ADVICE r9): the skip-never-error
                    # contract must hold PER RECORD too — e.g. an all-digit
                    # status token past int32 range passes isdigit() but
                    # overflows the declared int schema at Arrow conversion
                    try:
                        if headers.get("warc-type") != "response":
                            continue
                        http_end = block.find(b"\r\n\r\n")
                        if http_end < 0 or not block.startswith(b"HTTP/"):
                            continue
                        status_line = block[: block.find(b"\r\n")].decode(
                            "utf-8", "replace"
                        )
                        parts = status_line.split(" ")
                        status = None
                        if len(parts) > 1 and parts[1].isdigit() and len(parts[1]) == 3:
                            s = int(parts[1])
                            if 100 <= s <= 599:  # RFC 9110 status range
                                status = s
                        body = block[http_end + 4 :].decode("utf-8", "replace")
                        rows.append(
                            (
                                int(i),
                                len(recs),
                                headers.get("warc-type"),
                                headers.get("warc-target-uri"),
                                status,
                                body,
                            )
                        )
                    except Exception:
                        continue
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_records", "warc_type", "target_uri",
                    "http_status", "body",
                ],
            )

    return df.mapInPandas(
        parse,
        f"{id_col} long, n_records int, warc_type string, target_uri string, "
        "http_status int, body string",
    )


def warc_gz_cdx_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """CDX-style RANDOM ACCESS over ``.warc.gz`` (r10, d129) — the
    access pattern Common Crawl's index exists for: record the byte
    GEOMETRY of every gzip member ((offset, length) per record, which
    is exactly what a CDX line's offset/length fields carry), then
    PROVE the geometry by re-fetching each record through it — slice
    ``payload[offset : offset+length]``, inflate that single member
    INDEPENDENTLY, parse it as a standalone WARC record, and compare
    byte-for-byte against the sequential full-file walk.  Emits one
    verification row per file:

      (id, n_members, n_response, coverage_ok, fetch_ok, http_status)

    coverage_ok = the member spans tile the file exactly (contiguous,
    ending at EOF); fetch_ok = every random-access fetch reproduced its
    sequential record AND the response body matched. A geometry slip of
    even one byte breaks the member's gzip header and fails the fetch —
    the property that lets a 100 TB crawl serve single-record reads off
    an index instead of streaming whole files. Structurally broken
    files degrade to skip. Pure mapInPandas, zero shuffles."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                try:
                    raw = bytes(buf)
                    if raw[:2] != b"\x1f\x8b":
                        continue
                    spans = _gz_member_spans(raw)
                    if spans is None:
                        continue
                    full = _warc_split_records(
                        b"".join(chunk for _, _, chunk in spans)
                    )
                    if full is None or len(full) != len(spans):
                        continue
                    coverage_ok = int(
                        spans[0][0] == 0
                        and all(
                            spans[k][0] + spans[k][1] == spans[k + 1][0]
                            for k in range(len(spans) - 1)
                        )
                        and spans[-1][0] + spans[-1][1] == len(raw)
                    )
                    fetch_ok = 1
                    status = None
                    n_resp = 0
                    for (off, ln, chunk), (hdrs, block) in zip(spans, full):
                        refetched = _gz_inflate_members(raw[off : off + ln])
                        if refetched != chunk:
                            fetch_ok = 0
                            continue
                        rec = _warc_split_records(refetched)
                        if rec is None or len(rec) != 1:
                            fetch_ok = 0
                            continue
                        if rec[0][0] != hdrs or rec[0][1] != block:
                            fetch_ok = 0
                        if hdrs.get("warc-type") == "response":
                            n_resp += 1
                            http_end = block.find(b"\r\n\r\n")
                            if http_end >= 0 and block.startswith(b"HTTP/"):
                                parts = block[: block.find(b"\r\n")].split(b" ")
                                if (
                                    len(parts) > 1
                                    and parts[1].isdigit()
                                    and len(parts[1]) == 3
                                ):
                                    status = int(parts[1])
                    rows.append(
                        (
                            int(i),
                            len(spans),
                            n_resp,
                            coverage_ok,
                            fetch_ok,
                            status,
                        )
                    )
                except Exception:
                    continue
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_members", "n_response",
                    "coverage_ok", "fetch_ok", "http_status",
                ],
            )

    return df.mapInPandas(
        stats,
        f"{id_col} long, n_members int, n_response int, coverage_ok int, "
        "fetch_ok int, http_status int",
    )


def warc_gz_cdx_index(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """CDX index WRITE (r11, d135) — the other half of d129's read-side
    proof: produce the index rows a crawler RECORDS during ingest, one
    per gzip member of a ``.warc.gz``: (id, member_idx, offset, length,
    warc_type, target_uri, http_status).  offset/length are the member's
    exact byte geometry (what a CDX(J) line's offset/length fields
    carry); target_uri/status come from parsing the inflated record, so
    the index row is self-describing — a URL→(file, offset, length)
    lookup needs nothing else.  Downstream the urlkey is
    ``text.surt_key(target_uri)`` (d125) — kept OUT of this function so
    the key policy stays one codegen expression, not Python.
    Structurally broken files degrade to skip (no rows).  Scale: pure
    mapInPandas, zero shuffles — at 100 TB each WARC file is one row of
    a binaryFile table and indexing is embarrassingly parallel; the
    emitted index is then a tiny, partitionable table served through the
    engine's storage layout."""

    def index(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                try:
                    raw = bytes(buf)
                    if raw[:2] != b"\x1f\x8b":
                        continue
                    spans = _gz_member_spans(raw)
                    if spans is None:
                        continue
                    for k, (off, ln, chunk) in enumerate(spans):
                        rec = _warc_split_records(chunk)
                        if rec is None or len(rec) != 1:
                            continue
                        hdrs, block = rec[0]
                        status = None
                        if hdrs.get("warc-type") == "response" and block.startswith(
                            b"HTTP/"
                        ):
                            parts = block[: block.find(b"\r\n")].split(b" ")
                            if (
                                len(parts) > 1
                                and parts[1].isdigit()
                                and len(parts[1]) == 3
                                and 100 <= int(parts[1]) <= 599
                            ):
                                status = int(parts[1])
                        rows.append(
                            (
                                int(i),
                                k,
                                off,
                                ln,
                                hdrs.get("warc-type"),
                                hdrs.get("warc-target-uri"),
                                status,
                            )
                        )
                except Exception:
                    continue
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "member_idx", "offset", "length",
                    "warc_type", "target_uri", "http_status",
                ],
            )

    return df.mapInPandas(
        index,
        f"{id_col} long, member_idx int, offset long, length long, "
        "warc_type string, target_uri string, http_status int",
    )


def warc_gz_indexed_fetch(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    offset_col: str = "offset",
    length_col: str = "length",
) -> DataFrame:
    """Indexed single-record FETCH (r11, d135): given rows carrying a
    payload plus an index entry's (offset, length), slice
    ``payload[offset : offset+length]``, inflate that one gzip member
    INDEPENDENTLY (never touching the rest of the file), parse it as a
    standalone WARC record, and emit what was served: (id, offset,
    fetch_ok, warc_type, target_uri, http_status, body).  fetch_ok=0
    rows (geometry slip → broken gzip header, or a slice that is not
    exactly one record) keep their identity columns with NULL content —
    the skip-never-error contract, so one bad index row cannot fail a
    fleet.  Scale: pure mapInPandas, zero shuffles; the caller joins
    index→payload however its storage co-locates them."""

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf, off, ln in zip(
                pdf[id_col], pdf[payload_col], pdf[offset_col], pdf[length_col]
            ):
                i, off, ln = int(i), int(off), int(ln)
                wtype = uri = body = None
                status = None
                ok = 0
                try:
                    raw = bytes(buf)[off : off + ln]
                    chunk = _gz_inflate_members(raw) if raw[:2] == b"\x1f\x8b" else None
                    rec = _warc_split_records(chunk) if chunk is not None else None
                    if rec is not None and len(rec) == 1:
                        hdrs, block = rec[0]
                        wtype = hdrs.get("warc-type")
                        uri = hdrs.get("warc-target-uri")
                        ok = 1
                        if wtype == "response" and block.startswith(b"HTTP/"):
                            http_end = block.find(b"\r\n\r\n")
                            parts = block[: block.find(b"\r\n")].split(b" ")
                            if (
                                len(parts) > 1
                                and parts[1].isdigit()
                                and len(parts[1]) == 3
                                and 100 <= int(parts[1]) <= 599
                            ):
                                status = int(parts[1])
                            if http_end >= 0:
                                body = block[http_end + 4 :].decode(
                                    "utf-8", "replace"
                                )
                except Exception:
                    ok = 0
                rows.append((i, off, ok, wtype, uri, status, body))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "offset", "fetch_ok", "warc_type",
                    "target_uri", "http_status", "body",
                ],
            )

    return df.mapInPandas(
        fetch,
        f"{id_col} long, offset long, fetch_ok int, warc_type string, "
        "target_uri string, http_status int, body string",
    )

def synth_y4m(
    df: DataFrame,
    id_col: str = "doc_id",
    width: int = 16,
    height: int = 16,
    chroma: str = "444",
) -> DataFrame:
    """Deterministic YUV4MPEG2 (.y4m) stream per row — a REAL public
    container format (the uncompressed video interchange format mjpegtools
    defined; ffmpeg/x264 consume it directly), built byte-for-byte:
    ``YUV4MPEG2 W.. H.. F25:1 Ip A1:1 C444\n`` then per frame a
    ``FRAME\n`` marker + raw Y, U, V planes.  ``3 + id % 4`` frames per
    stream; plane value at (frame f, x, y) is ``(7*id + 3x + 5y + 13f
    + k) mod 256`` with k = 0/11/22 for Y/U/V — the d99 pattern, so an
    oracle regenerates every byte arithmetically.  chroma='420' halves
    both chroma dimensions (C420 subsampling) for parser coverage.
    Arrow-batched mapInPandas, zero shuffles."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        cw, ch = (width, height) if chroma == "444" else (width // 2, height // 2)
        yy, yx = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
        ybase = (3 * yx + 5 * yy).astype(np.int64)
        cy, cx = np.meshgrid(np.arange(ch), np.arange(cw), indexing="ij")
        cbase = (3 * cx + 5 * cy).astype(np.int64)
        header = (
            f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C{chroma}\n".encode()
        )
        for pdf in batches:
            out = []
            for i in pdf[id_col]:
                i = int(i)
                n_frames = 3 + i % 4
                parts = [header]
                for f in range(n_frames):
                    parts.append(b"FRAME\n")
                    parts.append(
                        ((7 * i + ybase + 13 * f) % 256).astype(np.uint8).tobytes()
                    )
                    parts.append(
                        ((7 * i + cbase + 13 * f + 11) % 256)
                        .astype(np.uint8)
                        .tobytes()
                    )
                    parts.append(
                        ((7 * i + cbase + 13 * f + 22) % 256)
                        .astype(np.uint8)
                        .tobytes()
                    )
                out.append((i, b"".join(parts)))
            yield pd.DataFrame(out, columns=[id_col, "payload"])

    return df.select(id_col).mapInPandas(
        build, f"{id_col} long, payload binary"
    )


def synth_textured_y4m(
    df: DataFrame,
    id_col: str = "doc_id",
    width: int = 16,
    height: int = 16,
    n_frames_base: int = 3,
    n_frames_step: int = 1,
) -> DataFrame:
    """TEXTURED YUV4MPEG2 fixture (the d175 generator) —
    :func:`synth_y4m`'s plane pattern is LINEAR in (x, y), so every
    4×4 block-mean gradient points the same way and the d175 grid
    signature degenerates to one value for every frame of every video;
    this variant uses a quadratic pattern whose mod-256 wraps vary the
    gradient signs with position, frame, AND id:
    ``Y(x,y,f) = (7·id + x² + 2·x·y + 3·y² + f·(x + 7·y + 13)) mod
    256`` (U/V add 11/22) — every term integer, oracle-replayable.
    ``n_frames_base + (id % 4) * n_frames_step`` frames per stream
    (defaults reproduce the d175 fleet byte-for-byte; the d177 fleet
    uses 21 + 5·(id%4) so tick sampling at F25:1 spans 5 + id%4
    whole ticks), C444.  Arrow-batched mapInPandas, zero shuffles."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        yy, xx = np.meshgrid(
            np.arange(height), np.arange(width), indexing="ij"
        )
        quad = (xx * xx + 2 * xx * yy + 3 * yy * yy).astype(np.int64)
        lin = (xx + 7 * yy + 13).astype(np.int64)
        header = (
            f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C444\n".encode()
        )
        for pdf in batches:
            out = []
            for i in pdf[id_col]:
                i = int(i)
                parts = [header]
                for f in range(n_frames_base + (i % 4) * n_frames_step):
                    base = 7 * i + quad + f * lin
                    parts.append(b"FRAME\n")
                    for k in (0, 11, 22):
                        parts.append(
                            ((base + k) % 256).astype(np.uint8).tobytes()
                        )
                out.append((i, b"".join(parts)))
            yield pd.DataFrame(out, columns=[id_col, "payload"])

    return df.select(id_col).mapInPandas(
        build, f"{id_col} long, payload binary"
    )


def y4m_frame_sample(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n: int = 2,
) -> DataFrame:
    """Y4M frame-sampling + per-frame features — the video tier's
    decode / frame-sample step over a REAL container: parse the
    YUV4MPEG2 stream header (W/H/C parameters; C444 and C420 plane
    geometry both supported), walk the FRAME markers (parameters after
    FRAME, if any, run to the newline per spec), keep every
    ``every_n``-th frame, and emit per sampled frame the plane means
    plus a POSITION-WEIGHTED luma checksum sum(Y[y][x]*(x+1)*(y+2))
    that a transposed, flipped, or off-by-one-plane parse cannot fake
    (the d99 certification trick).  Malformed streams (bad magic,
    truncated frame) skip — a poison stream never kills the fleet.

    Returns (id, frame_no, width, height, n_frames, y_mean, u_mean,
    v_mean, y_pos_sum).  Scale: frame sampling is the pipeline's data
    EXCLUSION valve — the unsampled frames never leave this operator,
    so downstream stages see 1/every_n of the bytes; pure Arrow
    mapInPandas, zero shuffles, embarrassingly parallel."""

    if every_n < 1:
        raise ValueError("y4m_frame_sample: every_n must be >= 1")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(buf)
                nl = b.find(b"\n")
                if nl < 0 or not b.startswith(b"YUV4MPEG2"):
                    continue
                w = h = None
                chroma = "420"  # the spec default when no C tag
                for tok in b[:nl].split(b" ")[1:]:
                    if tok[:1] == b"W":
                        w = int(tok[1:])
                    elif tok[:1] == b"H":
                        h = int(tok[1:])
                    elif tok[:1] == b"C":
                        chroma = tok[1:].decode("ascii", "replace")
                if not w or not h:
                    continue
                if chroma.startswith("444"):
                    csize = w * h
                elif chroma.startswith("420"):
                    csize = (w // 2) * (h // 2)
                else:
                    continue  # 422/mono: not in fixture scope
                frame_bytes = w * h + 2 * csize
                # first pass: count frames (n_frames is part of the output)
                frames = []
                pos = nl + 1
                while pos < len(b):
                    if b[pos : pos + 5] != b"FRAME":
                        break  # malformed marker: stop, keep prior frames
                    fnl = b.find(b"\n", pos)
                    if fnl < 0 or fnl + 1 + frame_bytes > len(b):
                        break  # truncated frame drops
                    frames.append(fnl + 1)
                    pos = fnl + 1 + frame_bytes
                for f, start in enumerate(frames):
                    if f % every_n:
                        continue
                    y = (
                        np.frombuffer(b, np.uint8, w * h, start)
                        .reshape(h, w)
                        .astype(np.int64)
                    )
                    u = np.frombuffer(
                        b, np.uint8, csize, start + w * h
                    ).astype(np.int64)
                    v = np.frombuffer(
                        b, np.uint8, csize, start + w * h + csize
                    ).astype(np.int64)
                    xs = np.arange(1, w + 1, dtype=np.int64)
                    ys = np.arange(2, h + 2, dtype=np.int64)
                    rows.append(
                        (
                            int(i),
                            f,
                            w,
                            h,
                            len(frames),
                            round(float(y.sum()) / (w * h), 6),
                            round(float(u.sum()) / csize, 6),
                            round(float(v.sum()) / csize, 6),
                            int((y * xs[None, :] * ys[:, None]).sum()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "frame_no",
                    "width",
                    "height",
                    "n_frames",
                    "y_mean",
                    "u_mean",
                    "v_mean",
                    "y_pos_sum",
                ],
            )

    return df.mapInPandas(
        sample,
        f"{id_col} long, frame_no int, width int, height int, n_frames int,"
        " y_mean double, u_mean double, v_mean double, y_pos_sum long",
    )

def resize_area(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    out_w: int = 4,
    out_h: int = 4,
) -> DataFrame:
    """Area-average (box) image resize — the downsample step every
    multimodal pipeline runs before hashing / thumbnailing / feature
    extraction: each output cell is the mean of its (h/out_h x w/out_w)
    input block, per channel.  Frames whose dimensions don't divide the
    output grid skip (fixtures are exact multiples; a production build
    pads or crops — the geometry contract stays the same).

    Exact-arithmetic discipline: output pixel = (block_sum + area/2) /
    area in INTEGER math (round-half-up), block_sum emitted alongside so
    the oracle certifies the actual summation, not just the quotient.
    Long output layout (id, cell_x, cell_y, channel, block_sum, pixel)
    keeps arrays out of the hash compare.  Scale: pure Arrow
    mapInPandas, zero shuffles; the resized frame is out_w*out_h/(w*h)
    of the input bytes — like frame sampling, a data valve."""

    if out_w < 1 or out_h < 1:
        raise ValueError("resize_area: output grid must be >= 1x1")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for i, w, h, buf in zip(
                pdf[id_col], pdf["width"], pdf["height"], pdf[payload_col]
            ):
                w, h = int(w), int(h)
                if w == 0 or h == 0 or w % out_w or h % out_h:
                    continue
                try:
                    arr = (
                        np.frombuffer(bytes(buf), dtype=np.uint8)
                        .reshape(h, w, 3)
                        .astype(np.int64)
                    )
                except ValueError:
                    continue
                bh, bw = h // out_h, w // out_w
                area = bh * bw
                sums = arr.reshape(out_h, bh, out_w, bw, 3).sum(axis=(1, 3))
                px = (sums + area // 2) // area
                for cy in range(out_h):
                    for cx in range(out_w):
                        for c in range(3):
                            rows.append(
                                (
                                    int(i),
                                    cx,
                                    cy,
                                    c,
                                    int(sums[cy, cx, c]),
                                    int(px[cy, cx, c]),
                                )
                            )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "cell_x", "cell_y", "channel", "block_sum", "pixel"],
            )

    return df.mapInPandas(
        resize,
        f"{id_col} long, cell_x int, cell_y int, channel int,"
        " block_sum long, pixel long",
    )

def _pow2_u64():
    import numpy as np

    return np.uint64(1) << np.arange(64, dtype=np.uint64)


_POW2 = _pow2_u64()  # bit weights for packing fingerprint bit grids


def _band_energy_limbs(re_m, im_m):
    """EXACT band energies ``re² + im²`` of int64 DFT outputs, as five
    int64 limb coefficients of base 2^21 — shape ``(..., 5)`` appended to
    the input shape.  |re| < 2^63 splits into three 21-bit limbs
    (a, b, c); the square's coefficients a², 2ab, 2ac+b², 2bc, c² each
    stay below 2^43 and the two-energy sum below 2^44, so sums and
    differences of a handful of energies never overflow int64.  This is
    the vectorized replacement for the arbitrary-precision Python-int
    energy loops (guide §4.2): bit-identical decisions, no per-frame
    Python."""
    import numpy as np

    mask = (1 << 21) - 1
    out = None
    for x in (re_m, im_m):
        u = np.abs(x)
        a = u >> 42
        b = (u >> 21) & mask
        c = u & mask
        coeff = np.empty(x.shape + (5,), dtype=np.int64)
        coeff[..., 0] = c * c
        coeff[..., 1] = 2 * b * c
        coeff[..., 2] = 2 * a * c + b * b
        coeff[..., 3] = 2 * a * b
        coeff[..., 4] = a * a
        out = coeff if out is None else out + coeff
    return out


def _limb_sign_positive(d):
    """Boolean array: is the signed multi-limb number Σ d[..., i]·2^(21·i)
    strictly positive?  Limbs may be non-normalized and negative (|limb|
    < 2^47 after the gradient double-differences).  Carry-normalizes the
    lower limbs into [0, 2^21); the top limb then carries the sign."""
    import numpy as np

    d = d.copy()
    last = d.shape[-1] - 1
    for i in range(last):
        carry = d[..., i] >> 21  # arithmetic shift = floor division
        d[..., i] -= carry << 21
        d[..., i + 1] += carry
    top = d[..., last]
    lower_any = (d[..., :last] > 0).any(axis=-1)
    return (top > 0) | ((top == 0) & lower_any)


def _chroma_ddiff_bits(re_m, im_m):
    """Chromaprint double-difference bit grid for a whole file: from the
    (frames, n_bins) int64 DFT outputs, the EXACT comparison
    (E[f][p+1]−E[f][p+2]) − (E[f−1][p+1]−E[f−1][p+2]) > 0 as a boolean
    array of shape (frames−1, n_bands−1) — row f−1 holds frame f's bits
    in band order.  Shared by :func:`audio_fingerprint` and
    :func:`audio_chunk_fingerprints` (their former per-frame Python
    big-int loops computed exactly these signs)."""
    e = _band_energy_limbs(re_m[:, 1:], im_m[:, 1:])  # (F, n_bands, 5)
    grads = e[:, :-1, :] - e[:, 1:, :]  # adjacent-band gradients
    dd = grads[1:] - grads[:-1]  # frame-over-frame double differences
    return _limb_sign_positive(dd)


def _limb_argmax_first(e):
    """First-max argmax along axis 1 of a (rows, cands, limbs) array of
    CANONICAL-izable non-negative limb numbers — the exact integer
    replacement for ``np.argmax`` over object-dtype big-int energies
    (ties break to the lowest index, np.argmax's rule)."""
    import numpy as np

    e = e.copy()
    last = e.shape[-1] - 1
    for i in range(last):
        carry = e[..., i] >> 21
        e[..., i] -= carry << 21
        e[..., i + 1] += carry
    rows, cands, nl = e.shape
    best = e[:, 0, :].copy()
    besti = np.zeros(rows, dtype=np.int64)
    for bi in range(1, cands):
        cand = e[:, bi, :]
        sign = np.zeros(rows, dtype=np.int64)
        for l in range(nl - 1, -1, -1):
            dl = np.sign(cand[:, l] - best[:, l])
            sign = np.where(sign != 0, sign, dl)
        gt = sign > 0
        if gt.any():
            best[gt] = cand[gt]
            besti[gt] = bi
    return besti


def stft_frame_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_len: int = 64,
    hop: int = 64,
    n_bins: int = 9,
) -> DataFrame:
    """Short-time Fourier features over PCM WAV — the audio
    feature-extraction step (spectrogram frames) with NO audio/DSP
    library: parse the RIFF container, frame the int16 samples
    (``frame_len`` window, ``hop`` stride, tail dropped), and compute
    per frame the DFT at bins 0..n_bins-1 — rectangular window, so
    every quantity stays in the exact-integer domain.

    Hash-certification trick (the d141 integer-basis pattern): the
    Fourier basis is an INTEGER table Ck[t] = round_half_away(
    cos(2*pi*k*t/frame_len) * 10^6) (resp. sin), so re/im are exact
    int64 (|re| <= 1024 * 64 * 10^6 < 2^63) and an oracle replays
    them.  ``is_peak`` marks each frame's dominant NON-DC bin by exact
    integer power compare (re^2 + im^2 in arbitrary-precision Python /
    HUGEINT SQL; ties break to the lowest bin).  Non-PCM / broken
    containers skip.  Returns (id, frame_no, bin, re_scaled,
    im_scaled, is_peak).  Scale: pure Arrow mapInPandas, zero
    shuffles; frames x bins rows per file, independent of corpus
    size."""

    if frame_len < 1 or hop < 1 or n_bins < 2 or n_bins > frame_len:
        raise ValueError(
            "stft_frame_features needs frame_len >= 1, hop >= 1 and "
            "2 <= n_bins <= frame_len (bin 0 is DC; the peak needs a "
            "non-DC bin to point at)"
        )
    # exact-int64 bound: |re| <= 32768 (int16) * 1e6 (basis scale) *
    # frame_len must stay under 2^63 — beyond it numpy wraps silently
    if frame_len > (2**63 - 1) // (32768 * 10**6):
        raise ValueError(
            "stft_frame_features: frame_len > 281474 overflows the "
            "exact-int64 accumulator (|re| <= 32768 * 1e6 * frame_len); "
            "use a shorter window"
        )

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        k = np.arange(n_bins).reshape(-1, 1).astype(np.float64)
        t = np.arange(frame_len).reshape(1, -1).astype(np.float64)
        ang = 2 * np.pi * k * t / frame_len
        cos_t = np.cos(ang) * 1e6
        sin_t = np.sin(ang) * 1e6
        cos_i = (np.sign(cos_t) * np.floor(np.abs(cos_t) + 0.5)).astype(np.int64)
        sin_i = (np.sign(sin_t) * np.floor(np.abs(sin_t) + 0.5)).astype(np.int64)

        def parse(b: bytes):
            if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                return None
            pos, ch, bits, codec, data = 12, None, None, None, None
            while pos + 8 <= len(b):
                cid = b[pos : pos + 4]
                (clen,) = struct.unpack("<I", b[pos + 4 : pos + 8])
                if cid == b"fmt " and clen >= 16:
                    codec, ch, _, _, _, bits = struct.unpack(
                        "<HHIIHH", b[pos + 8 : pos + 24]
                    )
                elif cid == b"data":
                    data = b[pos + 8 : pos + 8 + clen]
                    if len(data) != clen:
                        return None
                pos += 8 + clen + (clen & 1)
            if codec != 1 or ch != 1 or bits != 16 or data is None:
                return None
            return np.frombuffer(data, dtype="<i2").astype(np.int64)

        bin_idx = np.arange(n_bins, dtype=np.int32)
        for pdf in batches:
            # pass 1: parse + frame every file; the DFT and the exact
            # peak compare then run ONCE over the whole batch's frames
            # (one big matmul + one limb pass amortizes the fixed numpy
            # call overhead that a per-file pass would pay ~50x per file)
            metas: list = []
            wins: list = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                s = parse(bytes(buf))
                if s is None or s.size < frame_len:
                    continue
                win = np.lib.stride_tricks.sliding_window_view(
                    s, frame_len
                )[::hop]
                metas.append((int(i), win.shape[0]))
                wins.append(win)
            cid, cf, cb, cre, cim, cpk = [], [], [], [], [], []
            if metas:
                allw = np.concatenate(wins, axis=0)
                # stacked DFT (one int64 matmul, exact — bit-identical
                # to the per-frame loop it replaces)
                re_all = allw @ cos_i.T
                im_all = allw @ (-sin_i.T)
                # dominant non-DC bin via EXACT int64-limb power compare
                # (re² overflows int64, so energies live as five 21-bit
                # limb coefficients — _band_energy_limbs); first-max IS
                # the lowest-bin tie-break the object-dtype np.argmax
                # implemented, without per-element Python big ints.
                # Frames are per-frame independent, so one batch-wide
                # argmax is exactly the per-file result.
                peaks_all = 1 + _limb_argmax_first(
                    _band_energy_limbs(re_all[:, 1:], im_all[:, 1:])
                ).astype(np.int32)
            off = 0
            for ii, n_frames in metas:
                re_m = re_all[off : off + n_frames]
                im_m = im_all[off : off + n_frames]
                peaks = peaks_all[off : off + n_frames]
                off += n_frames
                # vectorized row assembly (one row per frame × bin): the
                # per-element Python tuple building dominated this map
                cid.append(np.full(n_frames * n_bins, ii, dtype=np.int64))
                cf.append(np.repeat(np.arange(n_frames, dtype=np.int32), n_bins))
                cb.append(np.tile(bin_idx, n_frames))
                cre.append(re_m.ravel())
                cim.append(im_m.ravel())
                cpk.append(
                    (np.tile(bin_idx, n_frames) == np.repeat(peaks, n_bins))
                    .astype(np.int32)
                )

            def cat(parts, dt):
                return (
                    np.concatenate(parts) if parts else np.array([], dtype=dt)
                )

            yield pd.DataFrame(
                {
                    id_col: cat(cid, np.int64),
                    "frame_no": cat(cf, np.int32),
                    "bin": cat(cb, np.int32),
                    "re_scaled": cat(cre, np.int64),
                    "im_scaled": cat(cim, np.int64),
                    "is_peak": cat(cpk, np.int32),
                }
            )

    return df.mapInPandas(
        feats,
        f"{id_col} long, frame_no int, bin int, re_scaled long,"
        " im_scaled long, is_peak int",
    )


def audio_fingerprint(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_len: int = 64,
    hop: int = 64,
    n_bands: int = 8,
) -> DataFrame:
    """Chromaprint-style AUDIO perceptual fingerprint (d156) — the
    audio near-dup key completing the perceptual trio's media coverage
    (pHash/dHash/aHash are image-side; this is the sound-side sieve):
    STFT the PCM stream exactly as :func:`stft_frame_features` (same
    integer Fourier basis, same RIFF walk), take per-frame BAND
    energies E[f][b] = re² + im² at the non-DC bins 1..n_bands, and
    set bit (n_bands-1)·(f-1) + p when the adjacent-band energy
    gradient GROWS frame-over-frame:

        (E[f][p+1] − E[f][p+2]) − (E[f−1][p+1] − E[f−1][p+2]) > 0

    — Chromaprint's double-difference filter (sign of the time
    derivative of the spectral gradient).  Energies and differences
    are arbitrary-precision Python ints (HUGEINT in the oracle), so
    the bits are exact.  Uniform volume change scales every energy by
    c², preserving every sign — the fingerprint is EXACTLY
    volume-invariant (pinned in tests); a small DC offset perturbs
    only basis rounding residue, landing within small Hamming
    distance.

    Bits cap at 64: frames f = 1..min(n_frames−1, 63//(n_bands−1)).
    Returns (id, n_frames, n_frames_used, n_ones, fp_lo, fp_hi) — the
    (lo, hi) 32-bit-halves layout the Hamming tier shares, so near-dup
    clustering rides ``dedup.hamming_clusters`` unchanged.
    ``n_frames_used`` = min(n_frames, 63//(n_bands−1) + 1) is the
    HEAD-COVERAGE signal (the r12 ADVICE fix): long tracks fingerprint
    only their first n_frames_used frames, so two tracks sharing a
    head collide at Hamming 0 even when their tails differ — dedup on
    long audio must compare n_frames vs n_frames_used (or chunk tracks
    to ≤ n_frames_used frames first) instead of trusting the 64-bit
    signature alone.  Files shorter than one frame (or non-PCM) skip.
    Scale: pure Arrow mapInPandas, zero shuffles, one row per file."""
    if frame_len < 1 or hop < 1 or n_bands < 2 or n_bands + 1 > frame_len:
        raise ValueError(
            "audio_fingerprint needs frame_len >= 1, hop >= 1 and "
            "2 <= n_bands <= frame_len - 1 (bands are the non-DC bins "
            "1..n_bands; the gradient needs two adjacent bands)"
        )
    if frame_len > (2**63 - 1) // (32768 * 10**6):
        raise ValueError(
            "audio_fingerprint: frame_len > 281474 overflows the "
            "exact-int64 DFT accumulator; use a shorter window"
        )

    def fps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        n_bins = n_bands + 1  # DC + bands
        k = np.arange(n_bins).reshape(-1, 1).astype(np.float64)
        t = np.arange(frame_len).reshape(1, -1).astype(np.float64)
        ang = 2 * np.pi * k * t / frame_len
        cos_t = np.cos(ang) * 1e6
        sin_t = np.sin(ang) * 1e6
        cos_i = (np.sign(cos_t) * np.floor(np.abs(cos_t) + 0.5)).astype(np.int64)
        sin_i = (np.sign(sin_t) * np.floor(np.abs(sin_t) + 0.5)).astype(np.int64)
        max_f = 63 // (n_bands - 1)  # double-diff frames that fit 64 bits

        def parse(b: bytes):
            if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                return None
            pos, ch, bits, codec, data = 12, None, None, None, None
            while pos + 8 <= len(b):
                cid = b[pos : pos + 4]
                (clen,) = struct.unpack("<I", b[pos + 4 : pos + 8])
                if cid == b"fmt " and clen >= 16:
                    codec, ch, _, _, _, bits = struct.unpack(
                        "<HHIIHH", b[pos + 8 : pos + 24]
                    )
                elif cid == b"data":
                    data = b[pos + 8 : pos + 8 + clen]
                    if len(data) != clen:
                        return None
                pos += 8 + clen + (clen & 1)
            if codec != 1 or ch != 1 or bits != 16 or data is None:
                return None
            return np.frombuffer(data, dtype="<i2").astype(np.int64)

        for pdf in batches:
            # batch-wide DFT + exact limb double-difference pass (one
            # matmul + one bit grid for ALL files; per-file numpy call
            # overhead was the cost — guide §4.2), then per-file packing
            metas: list = []
            wins: list = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                s = parse(bytes(buf))
                if s is None or s.size < frame_len:
                    continue
                n_frames = (s.size - frame_len) // hop + 1
                nf_used = min(n_frames, max_f + 1)
                win = np.lib.stride_tricks.sliding_window_view(
                    s, frame_len
                )[::hop][:nf_used]
                metas.append((int(i), n_frames, nf_used))
                wins.append(win)
            rows = []
            if metas:
                allw = np.concatenate(wins, axis=0)
                re_all = allw @ cos_i.T
                im_all = allw @ (-sin_i.T)
                # one bit grid over the concatenated frames; rows that
                # pair the last frame of one file with the first of the
                # next are sliced away below (exact double-difference
                # bits — int64 limbs replace the per-frame Python
                # big-int energy loop, decisions bit-identical)
                bits_all = _chroma_ddiff_bits(re_all, im_all)
            off = 0
            for ii, n_frames, nf_used in metas:
                bits = bits_all[off : off + nf_used - 1].ravel()
                off += nf_used
                # bit (n_bands-1)·(f-1)+p is bits[(f-1)·(n_bands-1)+p]:
                # frame-major ravel order matches the bit layout, and
                # nf_used caps the count at 63 bits
                val = int(bits.astype(np.uint64) @ _POW2[: bits.size])
                rows.append(
                    (
                        ii,
                        int(n_frames),
                        int(nf_used),
                        int(bits.sum()),
                        int(val & 0xFFFFFFFF),
                        int(val >> 32),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_frames", "n_frames_used", "n_ones",
                    "fp_lo", "fp_hi",
                ],
            )

    return df.mapInPandas(
        fps,
        f"{id_col} long, n_frames long, n_frames_used long, n_ones int,"
        " fp_lo long, fp_hi long",
    )


def dhash_64(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Difference-hash (dHash) over decoded RGB frames — the third of
    the canonical perceptual-hash trio (aHash :func:`ahash_64` = mean
    threshold, pHash :func:`phash_64` = DCT median, dHash = horizontal
    GRADIENT sign): sample the grayscale frame to a 9x8 grid and set
    bit (8*y + x) when cell (x, y) is brighter than its right
    neighbor (x+1, y) — 8 comparisons per row, 64 bits.  Gradients
    survive global brightness shifts and are cheap enough for the
    first-pass dedup sieve.

    Exact-arithmetic discipline: grayscale is the unscaled channel sum
    and the 9x8 grid is NEAREST-NEIGHBOR sampling at src = (i * w) // 9
    (resp. (j * h) // 8) — pure integer ops, so the oracle replays
    every comparison.  Emitted as the (n_ones, hash_lo, hash_hi)
    layout shared by the trio; Hamming clustering rides
    dedup.hamming_clusters.  Zero shuffles (mapInPandas)."""

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for i, w, h, buf in zip(
                pdf[id_col], pdf["width"], pdf["height"], pdf[payload_col]
            ):
                w, h = int(w), int(h)
                if w < 9 or h < 8:
                    continue
                try:
                    arr = (
                        np.frombuffer(bytes(buf), dtype=np.uint8)
                        .reshape(h, w, 3)
                        .astype(np.int64)
                    )
                except ValueError:
                    continue
                gray = arr.sum(axis=2)
                xs = (np.arange(9) * w) // 9
                ys = (np.arange(8) * h) // 8
                grid = gray[np.ix_(ys, xs)]  # 8 rows x 9 cols
                bits = grid[:, :-1] > grid[:, 1:]
                val = 0
                for y in range(8):
                    for x in range(8):
                        if bits[y, x]:
                            val |= 1 << (8 * y + x)
                rows.append(
                    (int(i), int(bits.sum()), int(val & 0xFFFFFFFF), int(val >> 32))
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "n_ones", "hash_lo", "hash_hi"]
            )

    return df.mapInPandas(
        hashes,
        f"{id_col} long, n_ones int, hash_lo long, hash_hi long",
    )


def phash_64(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Perceptual DCT-hash (pHash) over decoded RGB frames — the
    frequency-domain sibling of :func:`ahash_64` and the standard
    perceptual key robust to brightness/contrast shifts: grayscale the
    frame, 2-D DCT-II, keep the top-left 8x8 low-frequency block, drop
    the DC term, and set bit (8*v+u) when the coefficient beats the
    MEDIAN of the 63 AC coefficients.  An affine gray transform
    v' = a*v + b scales every AC coefficient by a and moves only the
    DC term, so the median comparison — and therefore the hash — is
    exactly invariant (pinned in tests/test_multimodal.py).

    Exact-arithmetic discipline so the oracle can replay it: the DCT
    basis is an INTEGER cosine table C[k][i] = round_half_away(
    cos(pi*(2i+1)*k / (2N)) * 10^6), and the median of an ODD count
    (63) is the exact middle element — DuckDB's quantile_disc(0.5) —
    so no interpolation and no float ever enters the comparison.
    Products stay in int64 while the bound |coef| <= 765 * 10^12 * w*h
    < 2^63 holds (w*h <= 12_056, e.g. any frame up to ~109x109); for
    larger frames the second matmul switches to arbitrary-precision
    Python ints (object dtype) — slower per frame but still exact, so
    a 128x128 frame hashes correctly instead of silently wrapping.
    Emitted as two unsigned 32-bit halves (hash_lo bits 0-31, hash_hi
    bits 32-63) + the AC popcount.  Frames smaller than 8x8 skip.
    Scale: pure Arrow mapInPandas, zero shuffles; Hamming clustering
    rides dedup.hamming_clusters."""

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def cos_table(n: int) -> "np.ndarray":
            k = np.arange(n).reshape(-1, 1).astype(np.float64)
            i = np.arange(n).reshape(1, -1).astype(np.float64)
            c = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * 1e6
            return (np.sign(c) * np.floor(np.abs(c) + 0.5)).astype(np.int64)

        # |t1| <= 765e6 * w never overflows; |coef| <= 765e12 * w * h
        # overflows int64 once w*h exceeds this bound
        INT64_SAFE_PIXELS = (2**63 - 1) // (765 * 10**12)

        tables: dict = {}
        for pdf in batches:
            rows = []
            for i, w, h, buf in zip(
                pdf[id_col], pdf["width"], pdf["height"], pdf[payload_col]
            ):
                w, h = int(w), int(h)
                if w < 8 or h < 8:
                    continue
                try:
                    arr = (
                        np.frombuffer(bytes(buf), dtype=np.uint8)
                        .reshape(h, w, 3)
                        .astype(np.int64)
                    )
                except ValueError:
                    continue
                gray = arr.sum(axis=2)  # r+g+b, unscaled (affine-safe)
                if w not in tables:
                    tables[w] = cos_table(w)
                if h not in tables:
                    tables[h] = cos_table(h)
                # coef[v][u] = sum_y sum_x gray[y][x] * Ch[v][y] * Cw[u][x]
                t1 = gray @ tables[w][:8, :].T  # h x 8, |.| <= 765e6*w
                if w * h <= INT64_SAFE_PIXELS:
                    coef = tables[h][:8, :] @ t1
                else:
                    # exact big-int path: 8 x h @ h x 8 = 64h Python ops
                    coef = tables[h][:8, :].astype(object) @ t1.astype(object)
                ac = np.delete(coef.ravel(), 0)  # drop DC at (v=0,u=0)
                med = int(np.sort(ac)[31])  # exact middle of 63
                val = 0
                pop = 0
                for v in range(8):
                    for u in range(8):
                        if (u or v) and int(coef[v, u]) > med:
                            val |= 1 << (8 * v + u)
                            pop += 1
                rows.append(
                    (int(i), pop, int(val & 0xFFFFFFFF), int(val >> 32))
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "n_ones", "hash_lo", "hash_hi"]
            )

    return df.mapInPandas(
        hashes,
        f"{id_col} long, n_ones int, hash_lo long, hash_hi long",
    )


def ahash_64(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Perceptual average-hash (aHash) over decoded RGB frames — the
    classic IMAGE near-dup key (the pixel-space analogue of MinHash for
    text and cosine blocking for embeddings): grayscale the frame,
    average-pool to an 8×8 grid, set bit (8·by+bx) when the cell beats
    the global mean, giving a 64-bit signature whose Hamming distance
    tracks visual similarity.

    Exact-arithmetic discipline so the oracle can replay it: grayscale
    is the UNSCALED channel sum r+g+b (dividing by 3 changes nothing a
    comparison can see), pooling keeps integer block SUMS, and the
    mean test is multiplied through — ``64·block_sum > total_sum`` —
    so no division ever happens. The hash is emitted as two unsigned
    32-bit halves in BIGINTs (``hash_lo`` bits 0–31, ``hash_hi`` bits
    32–63) plus the popcount. Frames must be divisible into the 8×8
    grid (others skip); input shape is ``synth_raw_rgb``'s
    (id, width, height, payload). Scale: pure mapInPandas, zero
    shuffles; downstream near-dup clustering rides the existing
    SimHash/banding machinery over the emitted bits."""

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for i, w, h, buf in zip(
                pdf[id_col], pdf["width"], pdf["height"], pdf[payload_col]
            ):
                w, h = int(w), int(h)
                if w % 8 or h % 8 or w == 0 or h == 0:
                    continue
                try:
                    arr = (
                        np.frombuffer(bytes(buf), dtype=np.uint8)
                        .reshape(h, w, 3)
                        .astype(np.int64)
                    )
                except ValueError:
                    continue
                gray = arr.sum(axis=2)  # r+g+b, unscaled
                by, bx = h // 8, w // 8
                blocks = gray.reshape(8, by, 8, bx).sum(axis=(1, 3))
                total = int(gray.sum())
                bits = (64 * blocks > total).astype(np.int64)
                val = 0
                for yy in range(8):
                    for xx in range(8):
                        if bits[yy, xx]:
                            val |= 1 << (8 * yy + xx)
                rows.append(
                    (
                        int(i),
                        int(bits.sum()),
                        int(val & 0xFFFFFFFF),
                        int(val >> 32),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "n_ones", "hash_lo", "hash_hi"]
            )

    return df.mapInPandas(
        hashes,
        f"{id_col} long, n_ones int, hash_lo long, hash_hi long",
    )


def _exif_app1(i: int) -> bytes:
    """The deterministic EXIF APP1 segment :func:`synth_jpeg_exif`
    inserts: little-endian TIFF, one IFD0 with Make/Model/Orientation/
    DateTime — every field an arithmetic function of the id so an
    engine-independent oracle replays the extraction."""
    import struct

    make = f"cam{i % 7}\x00".encode()
    model = f"m{i % 13}\x00".encode()
    orientation = 1 + i % 8
    dt = f"2024:01:{1 + i % 28:02d} 03:04:05\x00".encode()  # 20 bytes

    # TIFF body: header (8) + count (2) + 4 entries (48) + next (4) = 62
    data_off = 8 + 2 + 4 * 12 + 4
    entries = b""
    data = b""

    def entry(tag, typ, cnt, payload):
        nonlocal entries, data, data_off
        if len(payload) <= 4:
            entries += struct.pack("<HHI4s", tag, typ, cnt, payload.ljust(4, b"\x00"))
        else:
            entries += struct.pack("<HHII", tag, typ, cnt, data_off)
            data += payload
            data_off += len(payload)

    entry(0x010F, 2, len(make), make)          # Make, ASCII
    entry(0x0110, 2, len(model), model)        # Model, ASCII
    entry(0x0112, 3, 1, struct.pack("<H", orientation))  # Orientation
    entry(0x0132, 2, len(dt), dt)              # DateTime, ASCII
    tiff = b"II" + struct.pack("<HI", 42, 8) + struct.pack("<H", 4)
    tiff += entries + struct.pack("<I", 0) + data
    body = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + (len(body) + 2).to_bytes(2, "big") + body


def synth_jpeg_exif(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """:func:`synth_jpeg` with a deterministic EXIF APP1 segment
    inserted right after SOI — the metadata-bearing fixture for the
    d159 EXIF tier.  Because the segment is INSERTED into the plain
    synth_jpeg byte stream, ``exif_strip ∘ synth_jpeg_exif`` must
    reproduce ``synth_jpeg`` byte-exactly (the d159b guarantee)."""
    plain = synth_jpeg(df, id_col)

    def add(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf["payload"]):
                b = bytes(buf)
                rows.append((int(i), b[:2] + _exif_app1(int(i)) + b[2:]))
            yield pd.DataFrame(rows, columns=[id_col, "payload"])

    return plain.mapInPandas(add, f"{id_col} long, payload binary")


def _jpeg_segments(b: bytes):
    """Walk JPEG marker segments up to SOS: yields (marker, start, end)
    byte ranges, end exclusive.  Stops at SOS/EOI (entropy data follows,
    which has no segment structure).  Real-world tolerant (the r12
    ADVICE fix): consecutive 0xFF FILL bytes between segments are legal
    padding (ITU T.81 §B.1.1.2) and are skipped, and standalone markers
    (TEM 0x01, RST0–7 0xD0–0xD7) carry no length field; a malformed
    length (< 2) ends the walk instead of yielding garbage ranges —
    callers then see the segments parsed so far (extract emits
    has_exif=0, strip passes the payload through) rather than dropping
    the row."""
    if b[:2] != b"\xff\xd8":
        return
    pos = 2
    n = len(b)
    while pos + 2 <= n:
        if b[pos] != 0xFF:
            return
        # skip 0xFF fill (padding) bytes: marker byte is the first
        # non-0xFF after the run
        while pos + 1 < n and b[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > n:
            return
        marker = b[pos + 1]
        if marker in (0xDA, 0xD9):  # SOS / EOI
            return
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn
            pos += 2
            continue
        if pos + 4 > n:
            return
        seg_len = int.from_bytes(b[pos + 2 : pos + 4], "big")
        if seg_len < 2:
            return
        yield marker, pos, pos + 2 + seg_len
        pos += 2 + seg_len


def exif_extract(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """EXIF metadata EXTRACTION (d159) — the media-metadata op every
    crawl pipeline runs before shipping images (and the PII surface
    the strip pass removes): walk the JPEG marker segments, find the
    APP1 ``Exif\\0\\0`` payload, parse the TIFF container (byte order,
    IFD0 entry walk, ASCII values resolved through their data-area
    offsets) and emit the canonical identity fields: (id, has_exif,
    byte_order, make, model, orientation, datetime).  Files without
    EXIF emit has_exif = 0 with NULL fields — the audit view, never a
    dropped row.  Broken containers skip per the codec-ladder
    contract.  Scale: pure Arrow mapInPandas, zero shuffles."""
    import struct

    def parse_tiff(t: bytes):
        if len(t) < 8 or t[:2] not in (b"II", b"MM"):
            return None
        le = t[:2] == b"II"
        e = "<" if le else ">"
        (magic,) = struct.unpack(e + "H", t[2:4])
        if magic != 42:
            return None
        (ifd,) = struct.unpack(e + "I", t[4:8])
        if ifd + 2 > len(t):
            return None
        (n,) = struct.unpack(e + "H", t[ifd : ifd + 2])
        out = {"byte_order": "II" if le else "MM"}
        for j in range(n):
            off = ifd + 2 + 12 * j
            if off + 12 > len(t):
                return out
            tag, typ, cnt = struct.unpack(e + "HHI", t[off : off + 8])
            raw = t[off + 8 : off + 12]
            if typ == 2:  # ASCII
                if cnt <= 4:
                    val = raw[:cnt]
                else:
                    (doff,) = struct.unpack(e + "I", raw)
                    val = t[doff : doff + cnt]
                s = val.split(b"\x00", 1)[0].decode("ascii", "replace")
                if tag == 0x010F:
                    out["make"] = s
                elif tag == 0x0110:
                    out["model"] = s
                elif tag == 0x0132:
                    out["datetime"] = s
            elif typ == 3 and tag == 0x0112:
                (out["orientation"],) = struct.unpack(e + "H", raw[:2])
        return out

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(buf)
                if b[:2] != b"\xff\xd8":
                    continue
                meta = None
                for marker, s, epos in _jpeg_segments(b):
                    if marker == 0xE1 and b[s + 4 : s + 10] == b"Exif\x00\x00":
                        meta = parse_tiff(b[s + 10 : epos])
                        break
                if meta is None:
                    rows.append((int(i), 0, None, None, None, None, None))
                else:
                    rows.append(
                        (
                            int(i),
                            1,
                            meta.get("byte_order"),
                            meta.get("make"),
                            meta.get("model"),
                            meta.get("orientation"),
                            meta.get("datetime"),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "has_exif", "byte_order", "make", "model",
                    "orientation", "datetime",
                ],
            )

    return df.mapInPandas(
        extract,
        f"{id_col} long, has_exif int, byte_order string, make string,"
        " model string, orientation int, datetime string",
    )


def exif_strip(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """EXIF STRIP (d159's redaction half — the media twin of the text
    tier's PII redact d44): remove every APP1 ``Exif\\0\\0`` segment
    from the JPEG byte stream, leaving all other bytes untouched, so
    image content (and every other segment) survives byte-exactly.
    Returns (id, payload, n_stripped).  Scale: pure Arrow mapInPandas,
    zero shuffles."""

    def strip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(buf)
                if b[:2] != b"\xff\xd8":
                    continue
                cuts = [
                    (s, e)
                    for marker, s, e in _jpeg_segments(b)
                    if marker == 0xE1 and b[s + 4 : s + 10] == b"Exif\x00\x00"
                ]
                out, pos = b"", 0
                for s, e in cuts:
                    out += b[pos:s]
                    pos = e
                out += b[pos:]
                rows.append((int(i), out, len(cuts)))
            yield pd.DataFrame(
                rows, columns=[id_col, "payload", "n_stripped"]
            )

    return df.mapInPandas(
        strip, f"{id_col} long, payload binary, n_stripped int"
    )


def y4m_trim(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    start: int = 0,
    count: int | None = None,
) -> DataFrame:
    """Y4M CLIP EXTRACTION — keep frames [start, start+count) of a
    YUV4MPEG2 stream by byte-splicing the container (header + the
    selected FRAME blobs verbatim; no plane decode, no re-encode), the
    video twin of the audio tier's sample-range ops and the d167
    trimmed-copy fixture generator.  ``count=None`` keeps everything
    from ``start``.  Streams left with zero frames, or malformed
    streams, skip (poison contract).  Scale: pure Arrow mapInPandas,
    zero shuffles, output bytes <= input bytes."""
    if start < 0 or (count is not None and count < 1):
        raise ValueError("y4m_trim: start >= 0 and count >= 1 required")

    def trim(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(buf)
                nl = b.find(b"\n")
                if nl < 0 or not b.startswith(b"YUV4MPEG2"):
                    continue
                w = h = None
                chroma = "420"
                for tok in b[:nl].split(b" ")[1:]:
                    if tok[:1] == b"W":
                        w = int(tok[1:])
                    elif tok[:1] == b"H":
                        h = int(tok[1:])
                    elif tok[:1] == b"C":
                        chroma = tok[1:].decode("ascii", "replace")
                if not w or not h:
                    continue
                if chroma.startswith("444"):
                    csize = w * h
                elif chroma.startswith("420"):
                    csize = (w // 2) * (h // 2)
                else:
                    continue
                frame_bytes = w * h + 2 * csize
                frames = []  # (marker_start, data_end) byte ranges
                pos = nl + 1
                while pos < len(b):
                    if b[pos : pos + 5] != b"FRAME":
                        break
                    fnl = b.find(b"\n", pos)
                    if fnl < 0 or fnl + 1 + frame_bytes > len(b):
                        break
                    frames.append((pos, fnl + 1 + frame_bytes))
                    pos = fnl + 1 + frame_bytes
                stop = len(frames) if count is None else start + count
                keep = frames[start:stop]
                if not keep:
                    continue
                out = b[: nl + 1] + b"".join(b[s:e] for s, e in keep)
                rows.append((int(i), out))
            yield pd.DataFrame(rows, columns=[id_col, "payload"])

    return df.mapInPandas(trim, f"{id_col} long, payload binary")


def video_shingle_near_dup(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    shingle_len: int = 2,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """VIDEO TEMPORAL NEAR-DUP (d167 — VERDICT r12 #5): single-frame
    hashing misses re-encoded/TRIMMED duplicates; this catches them by
    matching frame-SEQUENCE n-grams.  Compose the certified pieces:
    :func:`y4m_frame_sample` (every_n=1) emits the position-weighted
    luma checksum per frame (the exact frame signature a transposed
    or off-by-one parse cannot fake); consecutive ``shingle_len``
    checksums concatenate into a SHINGLE (the d02 shingle idea in
    time rather than token space); videos sharing a shingle pair up
    via the shingle equi-join (candidate work Σ bucket², never
    videos²); the aggregate verifies ALIGNMENT: n_shared matching
    shingle occurrences, n_offsets distinct frame offsets, and the
    minimum offset — a trimmed copy shows one consistent offset
    (n_offsets=1) equal to the trim length.

    Returns (id_a, id_b, n_shared, n_offsets, offset) with id_a <
    id_b.  ``max_bucket_size`` is the d02-style frequency valve: a
    degenerate shingle shared by more than this many frames (e.g. an
    all-black frame pair in millions of videos) is dropped from
    pairing rather than exploding Σ bucket².  Scale: one window per
    video (lead over frame_no), one equi-join on the shingle, one
    pair aggregate — no cartesian, no driver state."""
    from pyspark.sql import Window

    if shingle_len < 2:
        raise ValueError("video_shingle_near_dup: shingle_len must be >= 2")
    fs = y4m_frame_sample(df, payload_col, id_col, every_n=1).select(
        F.col(id_col).alias("__vid"),
        F.col("frame_no").alias("__f"),
        "y_pos_sum",
    )
    return _frame_sig_shingle_near_dup(
        fs, "y_pos_sum", shingle_len, max_bucket_size,
        "video_shingle_near_dup.shingles",
    )


def _frame_sig_shingle_near_dup(
    fs: DataFrame,
    sig_col: str,
    shingle_len: int,
    max_bucket_size: int | None,
    tag: str,
) -> DataFrame:
    """Shared shingle tail of the video near-dup family
    (:func:`video_shingle_near_dup`, :func:`video_rescale_near_dup`):
    shingle consecutive per-frame signatures from (__vid, __f,
    sig_col) rows, equi-join videos sharing a shingle, and
    alignment-aggregate per pair."""
    from pyspark.sql import Window

    if shingle_len < 2:
        raise ValueError("shingle_len must be >= 2")
    _warn_unvalved(tag.split(".")[0], max_bucket_size)
    w = Window.partitionBy("__vid").orderBy("__f")
    parts = [F.col(sig_col).cast("string")]
    for k in range(1, shingle_len):
        parts.append(F.lit(":"))
        parts.append(F.lead(sig_col, k).over(w).cast("string"))
    from ._scratch import scratch_persist

    # The shingle table feeds BOTH sides of the self-join (and the
    # frequency valve when enabled); without a persist each branch
    # re-runs the y4m decode Arrow map + window over the raw payloads.
    # Persist the SLIM projection (id, frame_no, shingle string) —
    # payload bytes never enter the cache.
    sh = scratch_persist(
        fs.select(
            "__vid", "__f", F.concat(*parts).alias("__sh")
        ).filter(F.col("__sh").isNotNull()),
        tag,
    )
    if max_bucket_size is not None:
        ok = (
            sh.groupBy("__sh")
            .agg(F.count("*").alias("__n"))
            .filter(F.col("__n") <= max_bucket_size)
            .select("__sh")
        )
        sh = sh.join(ok, "__sh")
    a = sh.select(
        F.col("__vid").alias("id_a"), F.col("__f").alias("__fa"), "__sh"
    )
    b = sh.select(
        F.col("__vid").alias("id_b"), F.col("__f").alias("__fb"), "__sh"
    )
    pairs = a.join(b, "__sh").filter(F.col("id_a") < F.col("id_b"))
    return pairs.groupBy("id_a", "id_b").agg(
        F.count("*").cast("long").alias("n_shared"),
        F.count_distinct(F.col("__fb") - F.col("__fa"))
        .cast("long")
        .alias("n_offsets"),
        F.min(F.col("__fb") - F.col("__fa")).cast("long").alias("offset"),
    )


def _warn_unvalved(op_name: str, max_bucket_size: int | None) -> None:
    """One-line guard rail for the banded near-dup family (r13 VERDICT
    'what's wrong' #4): with ``max_bucket_size=None`` a degenerate
    signature/shingle shared by k items costs k² join work — fine on a
    bounded fleet, quadratic on a corpus with silence/black frames.
    Correctness is unaffected, so this warns instead of defaulting to
    a valve (a silent default would change certified answers)."""
    if max_bucket_size is None:
        import warnings

        warnings.warn(
            f"{op_name}: max_bucket_size=None — a degenerate signature "
            "shared by k items costs k^2 candidate work; set the valve "
            "for corpus-scale runs (pairs beyond it are dropped, see "
            "SCALE.md)",
            stacklevel=3,
        )


def _parse_y4m(b: bytes):
    """Parse a YUV4MPEG2 stream into (w, h, csize, [frame data starts]).
    Returns None on bad magic / missing geometry / unsupported chroma;
    truncated or malformed frames stop the walk (prior frames kept) —
    the house y4m poison contract."""
    nl = b.find(b"\n")
    if nl < 0 or not b.startswith(b"YUV4MPEG2"):
        return None
    w = h = None
    chroma = "420"  # the spec default when no C tag
    for tok in b[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"C":
            chroma = tok[1:].decode("ascii", "replace")
    if not w or not h:
        return None
    if chroma.startswith("444"):
        csize = w * h
    elif chroma.startswith("420"):
        csize = (w // 2) * (h // 2)
    else:
        return None
    frame_bytes = w * h + 2 * csize
    starts = []
    pos = nl + 1
    while pos < len(b):
        if b[pos : pos + 5] != b"FRAME":
            break
        fnl = b.find(b"\n", pos)
        if fnl < 0 or fnl + 1 + frame_bytes > len(b):
            break
        starts.append(fnl + 1)
        pos = fnl + 1 + frame_bytes
    return w, h, csize, starts


def y4m_rescale_area(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    factor: int = 2,
) -> DataFrame:
    """Y4M AREA-AVERAGE DOWNSCALE by an integer factor — the video
    twin of :func:`image_resize_area` (d144) and the d175
    rescaled-copy fixture generator: every plane pixel of the output
    is the rounded mean of its ``factor × factor`` source block,
    ``floor((block_sum + factor²/2) / factor²)`` — integer-exact
    round-half-up, oracle-replayable.  The container is rebuilt with
    the scaled W/H tags; frame count, chroma layout, and frame order
    are untouched.  Streams whose plane dimensions are not divisible
    by ``factor`` skip (poison contract), as do malformed streams.
    Scale: pure Arrow mapInPandas, zero shuffles, output bytes =
    input bytes / factor²."""
    if factor < 2:
        raise ValueError("y4m_rescale_area: factor must be >= 2")

    def rescale(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        half = factor * factor // 2

        def shrink(plane: "np.ndarray") -> bytes:
            h, w = plane.shape
            blocks = plane.reshape(
                h // factor, factor, w // factor, factor
            ).astype(np.int64)
            sums = blocks.sum(axis=(1, 3))
            return ((sums + half) // (factor * factor)).astype(
                np.uint8
            ).tobytes()

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(buf)
                parsed = _parse_y4m(b)
                if parsed is None:
                    continue
                w, h, csize, starts = parsed
                cw = w if csize == w * h else w // 2
                chh = h if csize == w * h else h // 2
                if (
                    w % factor or h % factor or cw % factor
                    or chh % factor or not starts
                ):
                    continue
                ctag = "444" if csize == w * h else "420"
                parts = [
                    (
                        f"YUV4MPEG2 W{w // factor} H{h // factor} F25:1 "
                        f"Ip A1:1 C{ctag}\n"
                    ).encode()
                ]
                for start in starts:
                    parts.append(b"FRAME\n")
                    y = np.frombuffer(b, np.uint8, w * h, start).reshape(
                        h, w
                    )
                    u = np.frombuffer(
                        b, np.uint8, csize, start + w * h
                    ).reshape(chh, cw)
                    v = np.frombuffer(
                        b, np.uint8, csize, start + w * h + csize
                    ).reshape(chh, cw)
                    parts.append(shrink(y))
                    parts.append(shrink(u))
                    parts.append(shrink(v))
                rows.append((int(i), b"".join(parts)))
            yield pd.DataFrame(rows, columns=[id_col, payload_col])

    return df.select(id_col, payload_col).mapInPandas(
        rescale, f"{id_col} long, {payload_col} binary"
    )


def _pack_gradient_signs(sums, grid: int) -> int:
    """Pack the SIGNS of adjacent block-sum gradients into an int —
    horizontal bits (right > left, row-major) then vertical bits
    (below > above, column-major), 2·grid·(grid−1) bits total.  The
    shared bit layout of :func:`y4m_frame_grid_sig` and
    :func:`y4m_tick_grid_sig`; equal block pixel counts make sum
    comparisons equal mean comparisons, so the result is
    integer-exact at every resolution."""
    val = 0
    bit = 0
    for r in range(grid):
        for c in range(grid - 1):
            if sums[r, c + 1] > sums[r, c]:
                val |= 1 << bit
            bit += 1
    for c in range(grid):
        for r in range(grid - 1):
            if sums[r + 1, c] > sums[r, c]:
                val |= 1 << bit
            bit += 1
    return int(val)


def y4m_frame_grid_sig(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    grid: int = 4,
) -> DataFrame:
    """RESOLUTION-INVARIANT per-frame luma signature (the d175 frame
    feature): divide each frame's Y plane into a fixed ``grid × grid``
    block lattice and pack the SIGNS of adjacent block-mean gradients
    — horizontal bits (right > left, row-major) then vertical bits
    (below > above, column-major), 2·grid·(grid−1) bits total (24 for
    grid=4) — the d141 image-pHash idea per frame.  Block boundaries
    are PROPORTIONAL (block c spans [c·w/grid, (c+1)·w/grid)), so an
    area-rescaled copy aggregates exactly the same source regions and
    the gradient signs survive as long as true gradients beat the
    per-pixel rounding bound (±0.5) — which exact luma checksums
    (d167's ``y_pos_sum``) never do; equal block pixel counts within a
    frame make sum comparisons equal mean comparisons, so the
    signature is integer-exact at every resolution.  Frames whose
    plane dimensions are not divisible by ``grid`` skip (the
    proportional lattice would need fractional boundaries).

    Returns (id, frame_no, n_frames, width, height, grid_sig).
    Scale: pure Arrow mapInPandas, zero shuffles, one row per frame."""
    if grid < 2:
        raise ValueError("y4m_frame_grid_sig: grid must be >= 2")

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(buf)
                parsed = _parse_y4m(b)
                if parsed is None:
                    continue
                w, h, csize, starts = parsed
                if w % grid or h % grid:
                    continue
                bh, bw = h // grid, w // grid
                for f, start in enumerate(starts):
                    y = np.frombuffer(b, np.uint8, w * h, start).reshape(
                        h, w
                    )
                    sums = (
                        y.reshape(grid, bh, grid, bw)
                        .astype(np.int64)
                        .sum(axis=(1, 3))
                    )
                    rows.append(
                        (
                            int(i), f, len(starts), w, h,
                            _pack_gradient_signs(sums, grid),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "frame_no", "n_frames", "width", "height",
                    "grid_sig",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(
        sig,
        f"{id_col} long, frame_no long, n_frames long, width int,"
        " height int, grid_sig long",
    )


def video_rescale_near_dup(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    shingle_len: int = 2,
    max_bucket_size: int | None = None,
    grid: int = 4,
) -> DataFrame:
    """RESOLUTION-INVARIANT video temporal near-dup (d175 — VERDICT
    r13 #6): :func:`video_shingle_near_dup` matches EXACT luma
    checksums, so a re-encoded copy at a different resolution never
    pairs (the same blindness class d173 fixed in audio).  This
    variant feeds the SAME shingle machinery the
    :func:`y4m_frame_grid_sig` downsampled-grid gradient signature —
    invariant under area rescaling — so a rescaled (and/or trimmed)
    copy pairs with its original at one consistent frame offset.

    Returns the :func:`video_shingle_near_dup` schema (id_a, id_b,
    n_shared, n_offsets, offset).  The grid signature carries
    2·grid·(grid−1) bits (24 at the default), far less entropy than an
    exact checksum — at corpus scale set ``max_bucket_size`` (the d02
    frequency valve) and treat pairs as CANDIDATES for a pixel-level
    verify, exactly the LSH two-pass economics.  Scale: zero-shuffle
    signatures, one window per video, shingle equi-join Σ bucket²,
    never videos²."""
    fs = y4m_frame_grid_sig(df, payload_col, id_col, grid=grid).select(
        F.col(id_col).alias("__vid"),
        F.col("frame_no").alias("__f"),
        "grid_sig",
    )
    return _frame_sig_shingle_near_dup(
        fs, "grid_sig", shingle_len, max_bucket_size,
        "video_rescale_near_dup.shingles",
    )


def _parse_y4m_fps(b: bytes):
    """Read the YUV4MPEG2 F (frame rate) header tag → (num, den) or
    None when absent/malformed.  The spec writes the rate as
    ``F<num>:<den>`` (e.g. F25:1, F30000:1001); streams without it
    carry no timebase, so the fps-anchored ops skip them (poison
    contract)."""
    nl = b.find(b"\n")
    if nl < 0 or not b.startswith(b"YUV4MPEG2"):
        return None
    for tok in b[:nl].split(b" ")[1:]:
        if tok[:1] == b"F":
            try:
                num, den = tok[1:].split(b":")
                num, den = int(num), int(den)
            except ValueError:
                return None
            return (num, den) if num > 0 and den > 0 else None
    return None


def y4m_decimate(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_n: int = 2,
) -> DataFrame:
    """Y4M TEMPORAL DECIMATION — keep every ``every_n``-th frame
    (0, n, 2n, …) by byte-splicing the container and rewrite the F
    tag's denominator (``F25:1`` → ``F25:5`` at every_n=5) so the
    retained frames keep their ORIGINAL timestamps — the frame-rate
    twin of :func:`y4m_rescale_area` and the d177 re-encoded-copy
    fixture generator.  Streams without an F tag, or malformed
    streams, skip (poison contract).  Scale: pure Arrow mapInPandas,
    zero shuffles, output bytes <= input bytes."""
    if every_n < 1:
        raise ValueError("y4m_decimate: every_n must be >= 1")

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(buf)
                parsed = _parse_y4m(b)
                fps = _parse_y4m_fps(b)
                if parsed is None or fps is None:
                    continue
                w, h, csize, starts = parsed
                if not starts:
                    continue
                nl = b.find(b"\n")
                num, den = fps
                toks = [
                    b"F%d:%d" % (num, den * every_n)
                    if tok[:1] == b"F"
                    else tok
                    for tok in b[:nl].split(b" ")
                ]
                frame_bytes = w * h + 2 * csize
                # each frame blob runs from its FRAME marker to data
                # end; the marker begins at the previous data end (or
                # the header newline for frame 0)
                marker = [nl + 1] + [s + frame_bytes for s in starts[:-1]]
                keep = list(range(0, len(starts), every_n))
                out = b" ".join(toks) + b"\n" + b"".join(
                    b[marker[f] : starts[f] + frame_bytes] for f in keep
                )
                rows.append((int(i), out))
            yield pd.DataFrame(rows, columns=[id_col, "payload"])

    return df.mapInPandas(dec, f"{id_col} long, payload binary")


def y4m_tick_grid_sig(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    tick_hz: int = 5,
    grid: int = 4,
) -> DataFrame:
    """TIME-ANCHORED resolution-invariant frame signature (the d177
    frame feature): sample the stream at fixed WALL-CLOCK ticks
    (t = k / tick_hz seconds) instead of frame indices — tick k reads
    the frame on screen at that instant, index ⌊t·fps⌋ =
    (k·num) // (den·tick_hz) from the stream's own F tag — and emit
    the :func:`y4m_frame_grid_sig` block-gradient signature of that
    frame.  Two encodes of the same content at DIFFERENT frame rates
    sample the same instants, so their tick signatures agree wherever
    the displayed frames agree (exactly, when one rate divides the
    other and ticks land on retained frames); frame-indexed
    signatures (d167/d175) can never pair them.  Streams without an
    F tag skip (poison contract); frames whose plane dimensions are
    not divisible by ``grid`` skip as in :func:`y4m_frame_grid_sig`.

    Returns (id, tick, n_ticks, fps_num, fps_den, grid_sig) — one row
    per tick, ticks 0..⌈n_frames·den·tick_hz/num⌉−1.  Scale: pure
    Arrow mapInPandas, zero shuffles, ≤ one decoded frame resident
    per tick."""
    if tick_hz < 1:
        raise ValueError("y4m_tick_grid_sig: tick_hz must be >= 1")
    if grid < 2:
        raise ValueError("y4m_tick_grid_sig: grid must be >= 2")

    def sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(buf)
                parsed = _parse_y4m(b)
                fps = _parse_y4m_fps(b)
                if parsed is None or fps is None:
                    continue
                w, h, csize, starts = parsed
                if w % grid or h % grid or not starts:
                    continue
                num, den = fps
                bh, bw = h // grid, w // grid
                # ticks whose displayed frame exists: frame index
                # (k*num) // (den*tick_hz) < n_frames
                n_ticks = -(-len(starts) * den * tick_hz // num)
                for k in range(n_ticks):
                    f = k * num // (den * tick_hz)
                    y = np.frombuffer(
                        b, np.uint8, w * h, starts[f]
                    ).reshape(h, w)
                    sums = (
                        y.reshape(grid, bh, grid, bw)
                        .astype(np.int64)
                        .sum(axis=(1, 3))
                    )
                    rows.append(
                        (
                            int(i), k, n_ticks, num, den,
                            _pack_gradient_signs(sums, grid),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "tick", "n_ticks", "fps_num", "fps_den",
                    "grid_sig",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(
        sig,
        f"{id_col} long, tick long, n_ticks long, fps_num int,"
        " fps_den int, grid_sig long",
    )


def video_fps_near_dup(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    shingle_len: int = 2,
    max_bucket_size: int | None = None,
    grid: int = 4,
    tick_hz: int = 5,
) -> DataFrame:
    """FRAME-RATE-INVARIANT video temporal near-dup (d177 — the same
    blindness-promotion step d175 took for resolution):
    :func:`video_shingle_near_dup` and :func:`video_rescale_near_dup`
    shingle FRAME-INDEXED signatures, so a re-encode at a different
    frame rate (a 25fps master decimated to 5fps for preview, the
    most common video re-encode after rescaling) never pairs — its
    frame n shows different content.  This variant feeds the SAME
    shingle machinery the :func:`y4m_tick_grid_sig` TIME-anchored
    signature: tick k reads whatever frame is on screen at
    t = k/tick_hz seconds via the stream's own F tag, so two encodes
    of the same content at different rates (and/or resolutions — the
    grid signature is the d175 one) emit identical tick sequences and
    pair at one consistent TICK offset.  Ticks that fall between
    retained frames sample the nearest earlier frame, so
    non-divisible rate pairs match only where gradient signs survive
    the sub-tick sampling skew — divisible decimations (the fixture)
    match exactly.

    Returns the :func:`video_shingle_near_dup` schema (id_a, id_b,
    n_shared, n_offsets, offset) with offsets measured in TICKS.
    Scale: zero-shuffle signatures, one window per video, shingle
    equi-join Σ bucket² with the d02 frequency valve, never videos²;
    at corpus scale pairs are CANDIDATES for a pixel verify (24-bit
    signatures — LSH two-pass economics)."""
    fs = y4m_tick_grid_sig(
        df, payload_col, id_col, tick_hz=tick_hz, grid=grid
    ).select(
        F.col(id_col).alias("__vid"),
        F.col("tick").alias("__f"),
        "grid_sig",
    )
    return _frame_sig_shingle_near_dup(
        fs, "grid_sig", shingle_len, max_bucket_size,
        "video_fps_near_dup.shingles",
    )


def audio_chunk_fingerprints(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    frame_len: int = 64,
    hop: int = 64,
    n_bands: int = 8,
    chunk_hop: int | None = None,
) -> DataFrame:
    """CHUNKED audio fingerprints (d170) — the LONG-audio completion of
    :func:`audio_fingerprint`'s documented head-coverage cap: a single
    64-bit signature covers only the first ``63//(n_bands-1) + 1``
    frames (``n_frames_used``), so long tracks sharing a head collide.
    This op fingerprints EVERY consecutive chunk of that many frames
    with the same double-difference bits (chunk 0 is bit-identical to
    :func:`audio_fingerprint`'s signature — the d170b parity twin), so
    whole-track near-dup becomes chunk-sequence matching: Hamming-band
    each chunk, or shingle chunk signatures exactly like the video
    tier (``video_shingle_near_dup``'s frame n-grams in audio space).

    Returns (id, chunk_no, n_frames_used, n_ones, fp_lo, fp_hi) — one
    row per chunk, Σ n_frames_used = n_frames (complete coverage, the
    other half of the d170b twin).  Double-differences never cross a
    chunk boundary (each chunk is self-contained, so a chunk-aligned
    splice of two tracks preserves the untouched chunks' signatures).

    ``chunk_hop`` (frames; default None = non-overlapping chunks, the
    d170-certified layout) starts a chunk at EVERY ``chunk_hop``-th
    frame — the MULTI-PHASE probe behind
    :func:`audio_phase_robust_near_dup`: a copy trimmed by any whole
    number of frames then shares bit-exact chunk signatures with its
    original at one consistent phase, where the aligned-only layout is
    blind to every non-chunk-multiple trim (d172's negative control).
    ``chunk_no`` is then ``start_frame // chunk_hop`` and chunks
    overlap, so Σ n_frames_used exceeds n_frames (the coverage
    contract applies to the default layout only); rows scale by
    chunk_size / chunk_hop.  Scale: pure Arrow mapInPandas, zero
    shuffles, rows = frames / chunk_hop per file; the per-frame DFT is
    ONE stacked integer matmul (frames × frame_len @ frame_len × bins,
    exact int64)."""
    if frame_len < 1 or hop < 1 or n_bands < 2 or n_bands + 1 > frame_len:
        raise ValueError(
            "audio_chunk_fingerprints needs frame_len >= 1, hop >= 1 and "
            "2 <= n_bands <= frame_len - 1"
        )
    if chunk_hop is not None and chunk_hop < 1:
        raise ValueError("audio_chunk_fingerprints: chunk_hop must be >= 1")
    if frame_len > (2**63 - 1) // (32768 * 10**6):
        raise ValueError(
            "audio_chunk_fingerprints: frame_len > 281474 overflows the "
            "exact-int64 DFT accumulator; use a shorter window"
        )

    def fps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        n_bins = n_bands + 1
        k = np.arange(n_bins).reshape(-1, 1).astype(np.float64)
        t = np.arange(frame_len).reshape(1, -1).astype(np.float64)
        ang = 2 * np.pi * k * t / frame_len
        cos_t = np.cos(ang) * 1e6
        sin_t = np.sin(ang) * 1e6
        cos_i = (np.sign(cos_t) * np.floor(np.abs(cos_t) + 0.5)).astype(np.int64)
        sin_i = (np.sign(sin_t) * np.floor(np.abs(sin_t) + 0.5)).astype(np.int64)
        chunk = 63 // (n_bands - 1) + 1  # frames per 64-bit signature

        def parse(b: bytes):
            if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                return None
            pos, ch, bits, codec, data = 12, None, None, None, None
            while pos + 8 <= len(b):
                cid = b[pos : pos + 4]
                (clen,) = struct.unpack("<I", b[pos + 4 : pos + 8])
                if cid == b"fmt " and clen >= 16:
                    codec, ch, _, _, _, bits = struct.unpack(
                        "<HHIIHH", b[pos + 8 : pos + 24]
                    )
                elif cid == b"data":
                    data = b[pos + 8 : pos + 8 + clen]
                    if len(data) != clen:
                        return None
                pos += 8 + clen + (clen & 1)
            if codec != 1 or ch != 1 or bits != 16 or data is None:
                return None
            return np.frombuffer(data, dtype="<i2").astype(np.int64)

        step = chunk if chunk_hop is None else chunk_hop

        nb1 = n_bands - 1
        for pdf in batches:
            # batch-wide DFT + ONE exact limb double-difference bit grid
            # for every file (boundary rows sliced away per file); the
            # grid is also SHARED by overlapping chunk layouts
            # (chunk_hop < chunk) instead of recomputing each frame pair
            # up to chunk/chunk_hop times — guide §4.2
            metas: list = []
            wins: list = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                s = parse(bytes(buf))
                if s is None or s.size < frame_len:
                    continue
                win = np.lib.stride_tricks.sliding_window_view(
                    s, frame_len
                )[::hop]
                metas.append((int(i), win.shape[0]))
                wins.append(win)
            rows = []
            if metas:
                allw = np.concatenate(wins, axis=0)
                # stacked DFT: ONE (frames x frame_len) @ (frame_len x
                # bins) integer matmul — int64 matmul is exact (the
                # frame_len guard bounds the linear accumulator);
                # energies live as int64 LIMBS, not Python big ints
                re_all = allw @ cos_i.T
                im_all = allw @ (-sin_i.T)
                bits_all = _chroma_ddiff_bits(re_all, im_all)
            boff = 0
            for ii, n_frames in metas:
                flat = (
                    bits_all[boff : boff + n_frames - 1]
                    .reshape(-1)
                    .astype(np.uint64)
                )
                boff += n_frames
                wlen = (chunk - 1) * nb1
                if n_frames >= chunk:
                    # all FULL chunks at once: frame-major windows over
                    # the flattened grid, one matvec packs every 64-bit
                    # signature
                    wins = np.lib.stride_tricks.sliding_window_view(
                        flat, wlen
                    )[:: step * nb1]
                    vals = wins @ _POW2[:wlen]
                    ones = wins.sum(axis=1)
                    for k in range(vals.shape[0]):
                        v = int(vals[k])
                        rows.append(
                            (
                                ii,
                                k,  # chunk_no = c0 // step with c0 = k·step
                                chunk,
                                int(ones[k]),
                                int(v & 0xFFFFFFFF),
                                int(v >> 32),
                            )
                        )
                    tail0 = vals.shape[0] * step
                else:
                    tail0 = 0
                for c0 in range(tail0, n_frames, step):
                    used = min(chunk, n_frames - c0)
                    blk = flat[c0 * nb1 : (c0 + used - 1) * nb1]
                    v = int(blk @ _POW2[: blk.size])
                    rows.append(
                        (
                            ii,
                            c0 // step,
                            used,
                            int(blk.sum()),
                            int(v & 0xFFFFFFFF),
                            int(v >> 32),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "chunk_no", "n_frames_used", "n_ones",
                    "fp_lo", "fp_hi",
                ],
            )

    return df.mapInPandas(
        fps,
        f"{id_col} long, chunk_no long, n_frames_used long, n_ones int,"
        " fp_lo long, fp_hi long",
    )


def wav_extract_segments(
    df: DataFrame,
    segments: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    seg_col: str = "seg_no",
    f0_col: str = "f0",
    f1_col: str = "f1",
    frame_len: int = 64,
) -> DataFrame:
    """SEGMENT CLIP EXTRACTION (d171) — the step after
    :func:`vad_segments`: materialize each detected speech segment as
    its own byte-valid WAV (frames [f0, f1] → samples [f0·frame_len,
    (f1+1)·frame_len)), the unit a transcription stage consumes.  The
    container is rebuilt (canonical 44-byte PCM header at the source
    sample rate) around the SLICED sample bytes — no resample, no
    re-encode; the audio twin of :func:`y4m_trim`.

    Returns (id, seg_no, payload, n_samples, sample_sum, first_sample,
    last_sample) — the integer invariants make the slice
    oracle-checkable without shipping bytes through the compare.
    Rows whose payload is malformed, or whose frame range falls
    outside the file, skip (poison contract).  Scale: one equi-join
    of the segment list against payloads, then a zero-shuffle Arrow
    map; output bytes <= input bytes."""

    j = segments.select(
        F.col(id_col),
        F.col(seg_col).alias("__seg"),
        F.col(f0_col).alias("__f0"),
        F.col(f1_col).alias("__f1"),
    ).join(df.select(id_col, payload_col), id_col)

    def ext(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        def parse(b: bytes):
            if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                return None
            pos, ch, bits, codec, sr, data = 12, None, None, None, None, None
            while pos + 8 <= len(b):
                cid = b[pos : pos + 4]
                (clen,) = struct.unpack("<I", b[pos + 4 : pos + 8])
                if cid == b"fmt " and clen >= 16:
                    codec, ch, sr, _, _, bits = struct.unpack(
                        "<HHIIHH", b[pos + 8 : pos + 24]
                    )
                elif cid == b"data":
                    data = b[pos + 8 : pos + 8 + clen]
                    if len(data) != clen:
                        return None
                pos += 8 + clen + (clen & 1)
            if codec != 1 or ch != 1 or bits != 16 or data is None:
                return None
            return sr, np.frombuffer(data, dtype="<i2")

        for pdf in batches:
            rows = []
            for i, seg, f0, f1, buf in zip(
                pdf[id_col], pdf["__seg"], pdf["__f0"], pdf["__f1"],
                pdf[payload_col],
            ):
                parsed = parse(bytes(buf))
                if parsed is None:
                    continue
                sr, s = parsed
                lo, hi = int(f0) * frame_len, (int(f1) + 1) * frame_len
                if f0 < 0 or f1 < f0 or hi > s.size:
                    continue
                clip = s[lo:hi]
                data = clip.astype("<i2").tobytes()
                fmt = struct.pack(
                    "<HHIIHH", 1, 1, sr, sr * 2, 2, 16
                )
                body = b"WAVEfmt " + struct.pack("<I", 16) + fmt
                body += b"data" + struct.pack("<I", len(data)) + data
                out = b"RIFF" + struct.pack("<I", len(body)) + body
                c64 = clip.astype(np.int64)
                rows.append(
                    (
                        int(i), int(seg), out, int(clip.size),
                        int(c64.sum()), int(c64[0]), int(c64[-1]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, seg_col, payload_col, "n_samples",
                    "sample_sum", "first_sample", "last_sample",
                ],
            )

    return j.mapInPandas(
        ext,
        f"{id_col} long, {seg_col} int, {payload_col} binary,"
        " n_samples int, sample_sum long, first_sample int,"
        " last_sample int",
    )


def wav_trim(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    start_sample: int = 0,
    n_samples: int | None = None,
) -> DataFrame:
    """WAV TRIM (r13) — byte-splice clip extraction for audio, the
    exact analog of :func:`y4m_trim` for the WAV container: drop the
    first ``start_sample`` samples (and everything past
    ``start_sample + n_samples`` when given) and rebuild the canonical
    44-byte PCM header around the remaining bytes.  No resample, no
    re-encode — sample VALUES are untouched, so any sample-aligned
    downstream signature (a d170 chunk whose frames lie wholly inside
    the kept range, at the same frame phase) is bit-identical.  The
    trimmed-copy fixture generator for :func:`audio_chunk_near_dup`.

    Rows with malformed payloads or a start past the end of the data
    skip (poison contract).  Scale: zero-shuffle Arrow map, output
    bytes <= input bytes."""
    if start_sample < 0 or (n_samples is not None and n_samples < 1):
        raise ValueError(
            "wav_trim: start_sample must be >= 0 and n_samples >= 1"
        )

    def trim(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import struct

        import numpy as np

        def parse(b: bytes):
            if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                return None
            pos, ch, bits, codec, sr, data = 12, None, None, None, None, None
            while pos + 8 <= len(b):
                cid = b[pos : pos + 4]
                (clen,) = struct.unpack("<I", b[pos + 4 : pos + 8])
                if cid == b"fmt " and clen >= 16:
                    codec, ch, sr, _, _, bits = struct.unpack(
                        "<HHIIHH", b[pos + 8 : pos + 24]
                    )
                elif cid == b"data":
                    data = b[pos + 8 : pos + 8 + clen]
                    if len(data) != clen:
                        return None
                pos += 8 + clen + (clen & 1)
            if codec != 1 or ch != 1 or bits != 16 or data is None:
                return None
            return sr, np.frombuffer(data, dtype="<i2")

        for pdf in batches:
            rows = []
            for i, buf in zip(pdf[id_col], pdf[payload_col]):
                parsed = parse(bytes(buf))
                if parsed is None:
                    continue
                sr, s = parsed
                if start_sample >= s.size:
                    continue
                end = (
                    s.size
                    if n_samples is None
                    else min(s.size, start_sample + n_samples)
                )
                data = s[start_sample:end].astype("<i2").tobytes()
                fmt = struct.pack("<HHIIHH", 1, 1, sr, sr * 2, 2, 16)
                body = b"WAVEfmt " + struct.pack("<I", 16) + fmt
                body += b"data" + struct.pack("<I", len(data)) + data
                rows.append(
                    (int(i), b"RIFF" + struct.pack("<I", len(body)) + body)
                )
            yield pd.DataFrame(rows, columns=[id_col, payload_col])

    return df.select(id_col, payload_col).mapInPandas(
        trim, f"{id_col} long, {payload_col} binary"
    )


def audio_chunk_near_dup(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_hamming: int = 2,
    max_bucket_size: int | None = None,
    frame_len: int = 64,
    hop: int = 64,
    n_bands: int = 8,
) -> DataFrame:
    """WHOLE-TRACK audio near-dup for LONG audio (d172) — the matcher
    :func:`audio_chunk_fingerprints` exists for: single-signature
    matching (d156c) is blind past the 64-bit head cap, so a track
    whose duplicate starts one chunk in (a chunk-aligned trim, a
    spliced intro) never pairs.  Compose the certified pieces: chunk
    fingerprints per track -> Hamming-band the CHUNK signatures with
    :func:`dedup.hamming_near_pairs` (pigeonhole banding, equi-joins,
    never tracks x tracks) -> aggregate matching chunks per track
    pair with the d167 alignment verify: ``n_shared`` matching chunk
    pairs, ``n_offsets`` distinct chunk offsets, the minimum offset,
    and ``min_hamming`` (0 = some chunk matched bit-exactly).  A
    trimmed copy shows one consistent negative offset; unrelated
    tracks sharing a degenerate chunk (silence) are bounded by
    ``max_bucket_size`` exactly as in d02.

    Returns (id_a, id_b, n_shared, n_offsets, offset, min_hamming)
    with id_a < id_b; same-track chunk self-matches are excluded.
    Contract (ENFORCED — a violating row raises instead of silently
    corrupting the band key): ids are non-negative and < 2**43, tracks
    shorter than 2**20 chunks (the composite band key is
    id * 2**20 + chunk_no).  Scale: zero-shuffle fingerprinting, then
    banding work proportional to sum(bucket^2) over chunk-band
    buckets."""
    fps = audio_chunk_fingerprints(
        df, payload_col, id_col, frame_len=frame_len, hop=hop,
        n_bands=n_bands,
    )
    return _chunk_sig_near_dup(
        fps, id_col, "audio_chunk_near_dup", max_hamming, max_bucket_size
    )


def _chunk_sig_near_dup(
    fps: DataFrame,
    id_col: str,
    op_name: str,
    max_hamming: int,
    max_bucket_size: int | None,
) -> DataFrame:
    """Shared tail of the chunk-signature near-dup family
    (:func:`audio_chunk_near_dup`, :func:`audio_phase_robust_near_dup`):
    composite-key the (id, chunk_no, fp_lo, fp_hi) rows, Hamming-band
    the chunk signatures, decompose, and alignment-aggregate per track
    pair."""
    from . import dedup

    _warn_unvalved(op_name, max_bucket_size)
    cap = 1 << 20
    # contract guard rides the key expression itself (no extra job, no
    # separate aggregate pass): the ELSE branch of the CASE raises, so
    # Catalyst cannot prune it and a violating id fails loudly
    checked_key = F.when(
        (F.col(id_col) >= 0)
        & (F.col(id_col) < F.lit(1 << 43))
        & (F.col("chunk_no") < F.lit(cap)),
        F.col(id_col) * cap + F.col("chunk_no"),
    ).otherwise(
        F.raise_error(
            F.format_string(
                "%s: composite-key contract violated "
                "(%s=%s, chunk_no=%s; need 0 <= id < 2^43 and "
                "chunk_no < 2^20)",
                F.lit(op_name),
                F.lit(id_col),
                F.col(id_col),
                F.col("chunk_no"),
            )
        )
    )
    from ._scratch import scratch_persist

    # slim (composite key, signature) projection persisted before the
    # band self-join: both join sides otherwise re-evaluate the ENTIRE
    # decode→fingerprint Python-map chain, twice (measured as 12
    # MapInPandas nodes in d173's plan). 16 bytes/row, audio bytes never
    # cached; the slot pool bounds it to one generation (the d167
    # slim-shingle discipline, guide §5).
    sigs = scratch_persist(
        fps.select(
            checked_key.alias("__cid"),
            (F.col("fp_lo") + F.shiftleft(F.col("fp_hi"), 32)).alias("__sig"),
        ),
        "multimodal/chunk_sig_near_dup/sigs",
    )
    pairs = dedup.hamming_near_pairs(
        sigs, "__cid", "__sig", max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
    )
    # decompose with shifts/masks, not division: a float64 round-trip
    # loses exactness above 2**53 and composite keys reach 2**63.
    decomposed = pairs.select(
        F.shiftright(F.col("id_a"), 20).alias("__ta"),
        F.col("id_a").bitwiseAND(F.lit(cap - 1)).alias("__ca"),
        F.shiftright(F.col("id_b"), 20).alias("__tb"),
        F.col("id_b").bitwiseAND(F.lit(cap - 1)).alias("__cb"),
        "hamming",
    ).filter(F.col("__ta") < F.col("__tb"))
    return decomposed.groupBy(
        F.col("__ta").alias("id_a"), F.col("__tb").alias("id_b")
    ).agg(
        F.count("*").cast("long").alias("n_shared"),
        F.count_distinct(F.col("__cb") - F.col("__ca"))
        .cast("long")
        .alias("n_offsets"),
        F.min(F.col("__cb") - F.col("__ca")).cast("long").alias("offset"),
        F.min("hamming").cast("int").alias("min_hamming"),
    )


def audio_phase_robust_near_dup(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_hamming: int = 2,
    max_bucket_size: int | None = None,
    frame_len: int = 64,
    hop: int = 64,
    n_bands: int = 8,
    chunk_hop: int = 1,
    min_frames: int | None = None,
) -> DataFrame:
    """PHASE-ROBUST whole-track audio near-dup (d173) — promotes
    d172's negative control into a capability: ``audio_chunk_near_dup``
    matches only copies trimmed by a whole number of CHUNKS (its d172
    fixture certifies that a half-chunk trim does NOT pair), but real
    re-encodes are rarely chunk-aligned.  This variant fingerprints
    chunks at EVERY ``chunk_hop``-th frame
    (:func:`audio_chunk_fingerprints` with overlapping chunk starts),
    so a copy trimmed by ANY multiple of ``hop`` samples shares
    bit-exact chunk signatures with its original at one consistent
    offset (in ``chunk_hop``-frame units).  Sub-frame trims remain out
    of band at the default ``hop=frame_len``; lowering ``hop`` (e.g.
    ``frame_len // 2``) halves the blind phase at proportional cost.

    Chunks carrying fewer than ``min_frames`` frames (default
    chunk_size // 2 + 1) are EXCLUDED from banding: a short tail chunk
    packs too few double-difference bits to discriminate (a one-frame
    chunk is val=0 for EVERY track — a universal Hamming-0 collision),
    so overlapping tails would otherwise pair unrelated tracks.

    Returns the :func:`audio_chunk_near_dup` schema (id_a, id_b,
    n_shared, n_offsets, offset, min_hamming), offsets in
    ``chunk_hop``-frame units.  Scale: zero-shuffle fingerprinting at
    chunk_size/chunk_hop × the aligned row count, then banding work
    Σ bucket² over chunk-band buckets — never tracks²; same
    composite-key contract (enforced) and ``max_bucket_size`` valve as
    the aligned matcher."""
    if chunk_hop < 1:
        raise ValueError("audio_phase_robust_near_dup: chunk_hop >= 1")
    chunk = 63 // (n_bands - 1) + 1
    lo = chunk // 2 + 1 if min_frames is None else min_frames
    if not 2 <= lo <= chunk:
        raise ValueError(
            "audio_phase_robust_near_dup: min_frames must be in "
            f"[2, {chunk}] (a 1-frame chunk has no double-differences)"
        )
    fps = audio_chunk_fingerprints(
        df, payload_col, id_col, frame_len=frame_len, hop=hop,
        n_bands=n_bands, chunk_hop=chunk_hop,
    ).filter(F.col("n_frames_used") >= lo)
    return _chunk_sig_near_dup(
        fps, id_col, "audio_phase_robust_near_dup", max_hamming,
        max_bucket_size,
    )
