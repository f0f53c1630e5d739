"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data pipelines carry image/audio/video as ``binary`` columns
with struct metadata; decode/feature-extraction runs as Arrow-batched
``mapInPandas``. The image/audio codec libraries are NOT in this
container, so the decode kernel is a clearly-marked stub
(``decode_image_stub``) with a deterministic fake — the Spark-side
plumbing (schema, batch iteration, partitioning) is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("sha", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

MEDIA_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str, id_col: str, mime: str = "application/octet-stream"
) -> DataFrame:
    """Build a media-shaped frame from any source column: payload =
    utf-8 bytes, metadata struct derived in-JVM (no Python)."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha"),
        ).alias("meta"),
    )


def decode_image_stub(payload: bytes) -> list[float]:
    """STUB decode kernel. A real deployment would decode via
    PIL/libvips/ffmpeg here; those libs are not in this container.
    Deterministic fake: 8 floats derived from the payload's sha256 —
    stable across runs and cluster layouts."""
    if payload is None:
        raise NotImplementedError(
            "real media decode requires an image/audio codec library; "
            "this environment ships none (stubbed per round-1 spec)"
        )
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the payload column via
    mapInPandas (the §2.12 extension path: GenericUDTF/PTF →
    mapInPandas). Each batch stays columnar driver→python→driver."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len),
                    "feature": pdf["payload"].map(decode_image_stub),
                }
            )

    return media.select("media_id", "payload").mapInPandas(kernel, FEATURE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL decode path: PPM (P6) — an uncompressed public format needing
# no codec library, so decode here is genuine (header parse + numpy
# frombuffer), not a stub. Compressed formats (JPEG/PNG/audio) stay
# behind decode_image_stub until a codec lib ships.
# ---------------------------------------------------------------------------

IMAGE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
    ]
)


def encode_ppm(width: int, height: int, rgb) -> bytes:
    """Binary PPM (P6, maxval 255) from an (h*w*3,) uint8 buffer —
    the public netpbm format (en.wikipedia.org/wiki/Netpbm)."""
    import numpy as np

    arr = np.asarray(rgb, dtype=np.uint8)
    if arr.size != width * height * 3:
        raise ValueError(f"need {width*height*3} bytes, got {arr.size}")
    return f"P6 {width} {height} 255\n".encode("ascii") + arr.tobytes()


def decode_ppm_pixels(payload: bytes):
    """REAL decode to pixels: parse the P6 header, reinterpret the
    raster with numpy → (width, height, (h,w,3) uint8 array)."""
    import numpy as np

    if payload is None or not payload.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    header, _, raster = payload.partition(b"\n")
    _, w, h, maxval = header.split()
    w, h = int(w), int(h)
    if int(maxval) != 255:
        raise ValueError("only maxval 255 supported")
    px = np.frombuffer(raster, dtype=np.uint8, count=w * h * 3).reshape(h, w, 3)
    return w, h, px


def decode_ppm(payload: bytes) -> tuple[int, int, float, float, float]:
    """REAL decode: parse the P6 header, reinterpret the raster with
    numpy, return (width, height, per-channel means). Means are
    integer-summed then divided once so they hash-compare exactly
    against an engine that never saw the bytes."""
    w, h, px = decode_ppm_pixels(payload)
    n = w * h
    if n == 0:  # crafted "P6 0 0" header — mirror decode_wav's
        return w, h, 0.0, 0.0, 0.0  # empty-data contract, no ÷0
    sums = px.sum(axis=(0, 1), dtype="int64")
    return w, h, float(sums[0]) / n, float(sums[1]) / n, float(sums[2]) / n


# ---------------------------------------------------------------------------
# REAL decode path #2: PNG (8-bit RGB, non-interlaced) — the container
# ships no codec libs, but PNG's IDAT stream is raw deflate, which
# stdlib zlib inflates; the chunk layout, IHDR fields, and the five
# scanline filters are all in the public spec (www.w3.org/TR/png-3).
# This is a genuine from-scratch decoder, not a stub.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, rgb) -> bytes:
    """8-bit RGB non-interlaced PNG from an (h*w*3,) uint8 buffer.
    Scanline filters CYCLE through all five types (row % 5) so that a
    round-trip through decode_png exercises every unfilter path, not
    just the trivial one."""
    import struct
    import zlib

    import numpy as np

    arr = np.asarray(rgb, dtype=np.uint8).reshape(height, width * 3)
    bpp = 3
    lines = []
    prev = np.zeros(width * 3, dtype=np.int64)
    for y in range(height):
        cur = arr[y].astype(np.int64)
        ftype = y % 5
        left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
        upleft = np.concatenate([np.zeros(bpp, dtype=np.int64), prev[:-bpp]])
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - left
        elif ftype == 2:
            filt = cur - prev
        elif ftype == 3:
            filt = cur - (left + prev) // 2
        else:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            filt = cur - pred
        lines.append(bytes([ftype]) + (filt % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png_pixels(payload: bytes):
    """REAL decode to pixels: walk the chunk list, inflate IDAT with
    stdlib zlib, undo the per-scanline filter (all five types) →
    (width, height, (h,w,3) uint8 array)."""
    import struct
    import zlib

    import numpy as np

    if payload is None or payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, ihdr, idat = len(_PNG_SIG), None, []
    while pos + 8 <= len(payload):
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + size]
        if ctype == b"IHDR":
            if len(body) < 13:  # struct.error is not ValueError
                raise ValueError("truncated IHDR chunk")
            ihdr = struct.unpack(">IIBBBBB", body[:13])
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + size  # len + type + crc
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    if (depth, ctype_, comp, filt, interlace) != (8, 2, 0, 0, 0):
        raise ValueError("only 8-bit RGB non-interlaced PNG supported")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:  # corrupt-input uniformity: ValueError
        raise ValueError(f"corrupt IDAT deflate stream: {exc}") from exc
    stride = w * 3
    if len(raw) != h * (1 + stride):
        raise ValueError("IDAT length mismatch")
    bpp = 3
    px = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (1 + stride) + 1
        ).astype(np.int64)
        ftype = raw[y * (1 + stride)]
        if ftype == 0:
            recon = line
        elif ftype == 2:
            recon = (line + prev) % 256
        elif ftype in (1, 3, 4):
            # left-dependent filters are sequential in x by definition
            recon = np.zeros(stride, dtype=np.int64)
            up = prev.astype(np.int64)
            for x in range(stride):
                left = recon[x - bpp] if x >= bpp else 0
                upleft = up[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    pred = left
                elif ftype == 3:
                    pred = (left + up[x]) // 2
                else:
                    p = left + up[x] - upleft
                    pa, pb, pc = abs(p - left), abs(p - up[x]), abs(p - upleft)
                    pred = left if pa <= pb and pa <= pc else (up[x] if pb <= pc else upleft)
                recon[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        px[y] = recon.astype(np.uint8)
        prev = px[y]
    return w, h, px.reshape(h, w, 3)


def decode_png(payload: bytes) -> tuple[int, int, float, float, float]:
    """REAL decode: pixel decode + per-channel means — same contract
    as decode_ppm so a bytes-blind oracle verifies it identically."""
    import numpy as np

    w, h, rgbv = decode_png_pixels(payload)
    n = w * h
    if n == 0:  # zero-dimension IHDR — same contract as decode_ppm
        return w, h, 0.0, 0.0, 0.0
    sums = rgbv.sum(axis=(0, 1), dtype=np.int64)
    return w, h, float(sums[0]) / n, float(sums[1]) / n, float(sums[2]) / n


def decode_jpeg_stats(payload: bytes) -> tuple[int, int, float, float, float]:
    """REAL baseline-JPEG decode (operators/jpeg_py.py — marker walk,
    file-declared Huffman tables, IDCT) -> dims + channel means, same
    contract as decode_ppm/decode_png."""
    from .jpeg_py import decode_jpeg

    w, h, rgb = decode_jpeg(payload)
    n = w * h
    if n == 0:  # zero-width SOF0 — same contract as decode_ppm
        return w, h, 0.0, 0.0, 0.0
    sums = rgb.sum(axis=(0, 1), dtype="int64")
    return w, h, float(sums[0]) / n, float(sums[1]) / n, float(sums[2]) / n


def decode_image(payload: bytes) -> tuple[int, int, float, float, float]:
    """Magic-byte dispatch over the real decoders (PPM P6, PNG,
    baseline JPEG)."""
    if payload is not None and payload[: len(_PNG_SIG)] == _PNG_SIG:
        return decode_png(payload)
    if payload is not None and payload[:2] == b"\xff\xd8":
        return decode_jpeg_stats(payload)
    return decode_ppm(payload)


def extract_image_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL image decode over mapInPandas:
    (media_id, payload[PPM|PNG]) → dims + channel means."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in IMAGE_STATS_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, mr, mg, mb = decode_image(payload)
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["mean_r"].append(mr)
                rows["mean_g"].append(mg)
                rows["mean_b"].append(mb)
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        kernel, IMAGE_STATS_SCHEMA
    )


def synthesize_ppm_media(df: DataFrame, id_col: str, width: int = 8, height: int = 4) -> DataFrame:
    """Deterministic PPM payload per id (pixel i channels =
    (id*7+13i, id*11+17i, id*13+19i) mod 256) — reproducible by any
    engine from the id alone, which is what lets an oracle verify the
    decode path without ever touching bytes."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        i = np.arange(n, dtype=np.int64)
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                rgb = np.empty(n * 3, dtype=np.uint8)
                rgb[0::3] = (mid * 7 + i * 13) % 256
                rgb[1::3] = (mid * 11 + i * 17) % 256
                rgb[2::3] = (mid * 13 + i * 19) % 256
                payloads.append(encode_ppm(width, height, rgb))
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    src = df.select(F.col(id_col).cast("long").alias("media_id"))
    return src.mapInPandas(kernel, MEDIA_PAYLOAD_SCHEMA)


def synthesize_png_media(df: DataFrame, id_col: str, width: int = 8, height: int = 4) -> DataFrame:
    """Deterministic PNG payload per id — SAME pixel formula as
    synthesize_ppm_media, so the same bytes-blind oracle covers both
    containers; only the on-disk encoding differs (deflate + filters
    here, raw raster there)."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = width * height
        i = np.arange(n, dtype=np.int64)
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                rgb = np.empty(n * 3, dtype=np.uint8)
                rgb[0::3] = (mid * 7 + i * 13) % 256
                rgb[1::3] = (mid * 11 + i * 17) % 256
                rgb[2::3] = (mid * 13 + i * 19) % 256
                payloads.append(encode_png(width, height, rgb))
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    src = df.select(F.col(id_col).cast("long").alias("media_id"))
    return src.mapInPandas(kernel, MEDIA_PAYLOAD_SCHEMA)


def synthesize_jpeg_media(
    df: DataFrame, id_col: str, blocks_x: int = 2, blocks_y: int = 2
) -> DataFrame:
    """Deterministic baseline-JPEG payload per id: a grid of 8x8
    blocks, block j uniformly gray g = (id*7 + j*13) mod 256, unit
    quant tables. Block-constant + unit tables means the DCT path is
    EXACT (DC-only blocks, no quantization error), so the bytes-blind
    oracle can predict the decoded means from the block formula alone
    — same verification pattern as synthesize_ppm/png_media, but the
    payload now rides a full entropy-coded JPEG (Huffman + zigzag +
    bit-stuffing), not a raw raster."""
    import numpy as np

    from .jpeg_py import encode_jpeg

    w, h = blocks_x * 8, blocks_y * 8
    n_blocks = blocks_x * blocks_y

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        j = np.arange(n_blocks, dtype=np.int64).reshape(blocks_y, blocks_x)
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                grays = ((mid * 7 + j * 13) % 256).astype(np.uint8)
                img = np.kron(grays, np.ones((8, 8), dtype=np.uint8))
                rgb = np.stack([img] * 3, axis=-1)
                payloads.append(encode_jpeg(w, h, rgb.reshape(-1)))
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    src = df.select(F.col(id_col).cast("long").alias("media_id"))
    return src.mapInPandas(kernel, MEDIA_PAYLOAD_SCHEMA)


# ---------------------------------------------------------------------------
# REAL audio decode: WAV (RIFF/PCM16) — header layout is public
# (multimedia.cx/mirror RIFF spec); numpy parses it without codecs.
# ---------------------------------------------------------------------------

AUDIO_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("mean_square", T.DoubleType(), True),
        T.StructField("peak", T.IntegerType(), True),
    ]
)


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """Mono 16-bit PCM WAV from an int16 sample buffer (canonical
    44-byte RIFF header)."""
    import struct

    import numpy as np

    pcm = np.asarray(samples, dtype="<i2").tobytes()
    n = len(pcm)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + n)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", n)
        + pcm
    )


def decode_wav(payload: bytes) -> tuple[int, int, float, int]:
    """REAL decode: walk the RIFF chunks, require PCM16 mono, and
    return (sample_rate, n_samples, mean_square, peak). mean_square
    is integer-summed (int64 exact for any real clip length) then
    divided once — cross-engine hashable."""
    import numpy as np

    rate, s = decode_wav_samples(payload)
    n = len(s)
    if n == 0:  # valid RIFF with an empty data chunk — no samples to
        return rate, 0, 0.0, 0  # average (ZeroDivisionError guard)
    return rate, n, float((s * s).sum()) / n, int(np.abs(s).max())


def extract_audio_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL WAV decode via mapInPandas."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in AUDIO_STATS_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, n, ms, peak = decode_wav(payload)
                rows["media_id"].append(mid)
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["mean_square"].append(ms)
                rows["peak"].append(peak)
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        kernel, AUDIO_STATS_SCHEMA
    )


AUDIO_SPECTRO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("dc_total", T.DoubleType(), True),
        T.StructField("nyquist_total", T.DoubleType(), True),
        T.StructField("parseval_ok", T.BooleanType(), True),
    ]
)


def extract_audio_spectrogram(
    media: DataFrame, frame_len: int = 16
) -> DataFrame:
    """Spectrogram feature extraction — the framing+FFT front half of
    every speech/audio training pipeline (log-mel, MFCC, …), minus
    the mel filterbank (its triangle weights are arbitrary constants;
    the FFT is the part worth proving). Non-overlapping rectangular
    frames → ``numpy.fft.rfft`` per frame, vectorized over a 2-D
    ``(n_frames, frame_len)`` array inside Arrow batches — one FFT
    call per clip, no per-frame Python.

    The emitted features are chosen to be INDEPENDENTLY derivable by
    a SQL oracle that never runs an FFT, so a decode / framing /
    transform bug cannot cancel out:
    - ``dc_total``     = Σ_frames Re(X[0])   ≡ Σ x_i over complete
      frames (bin-0 identity);
    - ``nyquist_total``= Σ_frames Re(X[N/2]) ≡ Σ (-1)^i · x_i
      (Nyquist-bin identity — sign-alternating, catches off-by-one
      framing and ordering bugs the DC sum is blind to);
    - ``parseval_ok``  = |Σ|X|²/N − Σx²| ≤ 1e-6·Σx² per clip
      (Parseval: validates the transform's unitary scaling).
    """
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in AUDIO_SPECTRO_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rate, samples = decode_wav_samples(payload)
                n_frames = len(samples) // frame_len
                frames = (
                    samples[: n_frames * frame_len]
                    .astype(np.float64)
                    .reshape(n_frames, frame_len)
                )
                spec = np.fft.rfft(frames, axis=1)
                dc = float(spec[:, 0].real.sum())
                nyq = float(spec[:, frame_len // 2].real.sum())
                # |X|² over the full spectrum: rfft halves it, so
                # double the interior bins (not DC, not Nyquist).
                mag2 = np.abs(spec) ** 2
                full_energy = (
                    mag2[:, 0]
                    + mag2[:, frame_len // 2]
                    + 2 * mag2[:, 1 : frame_len // 2].sum(axis=1)
                ) / frame_len
                time_energy = (frames * frames).sum()
                ok = bool(
                    abs(full_energy.sum() - time_energy)
                    <= 1e-6 * max(time_energy, 1.0)
                )
                rows["media_id"].append(mid)
                rows["n_frames"].append(n_frames)
                rows["dc_total"].append(dc)
                rows["nyquist_total"].append(nyq)
                rows["parseval_ok"].append(ok)
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        kernel, AUDIO_SPECTRO_SCHEMA
    )


def decode_wav_samples(payload: bytes):
    """RIFF walk returning (sample_rate, int64 sample array) — the
    raw-sample twin of decode_wav for transform stages."""
    import struct

    import numpy as np

    if payload is None or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:  # struct.error is not ValueError
                raise ValueError("truncated fmt chunk")
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if (fmt, channels, bits) != (1, 1, 16):
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return rate, np.frombuffer(data, dtype="<i2").astype(np.int64)


def synthesize_wav_media(
    df: DataFrame, id_col: str, n_samples: int = 64, sample_rate: int = 16000
) -> DataFrame:
    """Deterministic PCM16 clip per id: sample i =
    ((id*31 + i*7) mod 65536) - 32768 — reproducible by a bytes-blind
    oracle, like synthesize_ppm_media."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        i = np.arange(n_samples, dtype=np.int64)
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                s = ((mid * 31 + i * 7) % 65536) - 32768
                payloads.append(encode_wav(s.astype("<i2"), sample_rate))
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    src = df.select(F.col(id_col).cast("long").alias("media_id"))
    return src.mapInPandas(kernel, MEDIA_PAYLOAD_SCHEMA)


# ---------------------------------------------------------------------------
# REAL video decode: MJPEG-in-AVI. AVI is a RIFF container (public
# Microsoft spec, same chunk walk as WAV); MJPEG stores one baseline
# JPEG per '00dc' chunk, decoded by operators/jpeg_py.py. Frame
# sampling over this path is genuine video decode, not a byte-slice
# stub.
# ---------------------------------------------------------------------------

VIDEO_FRAME_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
    ]
)


def encode_avi_mjpeg(width: int, height: int, frames: list[bytes], fps: int = 25) -> bytes:
    """Minimal spec-shaped AVI: RIFF('AVI ') { LIST hdrl { avih,
    LIST strl { strh vids/MJPG, strf BITMAPINFOHEADER } }, LIST movi
    { '00dc' <jpeg> ... } }. Chunks are 2-byte aligned like all RIFF."""
    import struct

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,  # microseconds per frame
        0, 0, 0x10,        # max bytes/s, padding, flags (AVIF_HASINDEX off)
        len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0, 0, 0)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(payload: bytes) -> list[bytes]:
    """Walk the RIFF tree and return the '00dc'/'00db' frame payloads
    (each one baseline JPEG for MJPG streams)."""
    import struct

    if payload is None or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    frames: list[bytes] = []

    # explicit (pos, end) stack, NOT recursion: a crafted file nesting
    # one LIST per 12 bytes hit the interpreter recursion limit at a
    # few KB of payload (RecursionError on corrupt input). Ends are
    # clamped to the buffer so a lying size field can't walk past it.
    buf = payload
    stack: list[tuple[int, int]] = [(12, len(buf))]
    while stack:
        pos, end = stack.pop()
        end = min(end, len(buf))
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body_start = pos + 8
            if cid == b"LIST":
                # resume the remainder of THIS level after the list
                stack.append((body_start + size + (size & 1), end))
                pos, end = body_start + 4, min(body_start + size, end)
                continue
            if cid in (b"00dc", b"00db"):
                frames.append(bytes(buf[body_start : body_start + size]))
            pos = body_start + size + (size & 1)
    if not frames:
        raise ValueError("AVI contains no video frame chunks")
    return frames


def sample_video_frames_decoded(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """REAL video frame sampling: RIFF walk -> pick n evenly spaced
    MJPEG frames (index floor(i*F/n)) -> baseline-JPEG-decode each ->
    per-frame dims + channel means. UDTF-shaped 1->N fan-out over
    mapInPandas, Arrow both ways."""
    from .jpeg_py import decode_jpeg

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in VIDEO_FRAME_STATS_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames = decode_avi_mjpeg(payload)
                total = len(frames)
                take = min(n_frames, total)
                for i in range(take):
                    idx = i * total // take
                    w, h, rgb = decode_jpeg(frames[idx])
                    sums = rgb.sum(axis=(0, 1), dtype="int64")
                    n = max(w * h, 1)  # zero-width SOF0: means are 0
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["mean_r"].append(float(sums[0]) / n)
                    rows["mean_g"].append(float(sums[1]) / n)
                    rows["mean_b"].append(float(sums[2]) / n)
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        kernel, VIDEO_FRAME_STATS_SCHEMA
    )


def synthesize_avi_media(
    df: DataFrame, id_col: str, n_total_frames: int = 8, blocks_x: int = 2, blocks_y: int = 2
) -> DataFrame:
    """Deterministic MJPEG AVI per id: frame f is a block-constant
    JPEG (block j gray = (id*7 + f*29 + j*13) mod 256, unit quant
    tables — exact decode), so a bytes-blind oracle can predict every
    sampled frame's means from (id, f, j) alone."""
    import numpy as np

    from .jpeg_py import encode_jpeg

    w, h = blocks_x * 8, blocks_y * 8
    n_blocks = blocks_x * blocks_y

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        j = np.arange(n_blocks, dtype=np.int64).reshape(blocks_y, blocks_x)
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                frames = []
                for f in range(n_total_frames):
                    grays = ((mid * 7 + f * 29 + j * 13) % 256).astype(np.uint8)
                    img = np.kron(grays, np.ones((8, 8), dtype=np.uint8))
                    rgb = np.stack([img] * 3, axis=-1)
                    frames.append(encode_jpeg(w, h, rgb.reshape(-1)))
                payloads.append(encode_avi_mjpeg(w, h, frames))
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": payloads})

    src = df.select(F.col(id_col).cast("long").alias("media_id"))
    return src.mapInPandas(kernel, MEDIA_PAYLOAD_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


IMAGE_CHECKSUM_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("r_sum", T.LongType(), True),
        T.StructField("g_sum", T.LongType(), True),
        T.StructField("b_sum", T.LongType(), True),
        T.StructField("wsum", T.LongType(), True),
    ]
)


def resize_area(payload: bytes, factor: int = 2) -> bytes:
    """REAL image resize: factor×factor box-filter (area) downsample
    of the decoded raster — each output pixel is the floor of the
    mean of its source block, all-integer arithmetic so any engine
    can reproduce the exact bytes. PPM (P6) in → PPM out; trailing
    rows/cols that don't fill a block are cropped (the standard
    area-resize contract for non-divisible dims)."""
    import numpy as np

    if payload is None or not payload.startswith(b"P6"):
        raise ValueError("resize_area expects a P6 PPM payload")
    header, _, raster = payload.partition(b"\n")
    _, w, h, _maxval = header.split()
    w, h = int(w), int(h)
    px = (
        np.frombuffer(raster, dtype=np.uint8, count=w * h * 3)
        .reshape(h, w, 3)
        .astype(np.int64)
    )
    H, W = h // factor, w // factor
    if H == 0 or W == 0:
        raise ValueError(f"image {w}x{h} too small for factor {factor}")
    block = px[: H * factor, : W * factor].reshape(H, factor, W, factor, 3)
    out = block.sum(axis=(1, 3)) // (factor * factor)
    return encode_ppm(W, H, out.astype(np.uint8).reshape(-1))


def resize_images_area(media: DataFrame, factor: int = 2) -> DataFrame:
    """Batch REAL area resize over mapInPandas: decode → box filter →
    re-encode, Arrow both ways. Output dims come from each payload's
    own header (images in one batch may differ in size)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in RESIZED_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                small = resize_area(payload, factor)
                header = small.split(b"\n", 1)[0].split()
                rows["media_id"].append(mid)
                rows["width"].append(int(header[1]))
                rows["height"].append(int(header[2]))
                rows["payload"].append(small)
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        kernel, RESIZED_SCHEMA
    )


def extract_image_checksum(media: DataFrame) -> DataFrame:
    """Position-weighted raster checksum: per-channel integer sums
    plus Σ (1 + y·w + x)·(r + 2g + 3b) — unlike a plain mean, the
    weight makes pixel ORDER matter, so a transposed / flipped /
    misindexed raster cannot hash the same."""
    import numpy as np

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in IMAGE_CHECKSUM_SCHEMA.fieldNames()}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                header, _, raster = payload.partition(b"\n")
                _, w, h, _mx = header.split()
                w, h = int(w), int(h)
                px = (
                    np.frombuffer(raster, dtype=np.uint8, count=w * h * 3)
                    .reshape(h * w, 3)
                    .astype(np.int64)
                )
                weight = 1 + np.arange(h * w, dtype=np.int64)
                value = px[:, 0] + 2 * px[:, 1] + 3 * px[:, 2]
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["r_sum"].append(int(px[:, 0].sum()))
                rows["g_sum"].append(int(px[:, 1].sum()))
                rows["b_sum"].append(int(px[:, 2].sum()))
                rows["wsum"].append(int((weight * value).sum()))
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        kernel, IMAGE_CHECKSUM_SCHEMA
    )


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling (video → n evenly-spaced frames): UDTF-shaped
    mapInPandas emitting 0..n rows per input row. STUB frame cut:
    byte-range slices of the payload standing in for decoded frames;
    the row-explosion plumbing (schema, 1→N fan-out, Arrow batches)
    is the real contract."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None or len(payload) == 0:
                    continue
                step = max(1, len(payload) // n_frames)
                for i in range(min(n_frames, len(payload))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(payload[i * step : i * step + step]))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media.select("media_id", "payload").mapInPandas(kernel, FRAME_SCHEMA)


def resize_images(
    media: DataFrame, width: int, height: int, method: str = "box"
) -> DataFrame:
    """Distributed image RESIZE (the standard preprocessing step of a
    multimodal training pipeline): decode PPM/PNG pixels, resample to
    (width, height) with numpy, re-encode as PPM. ``method='box'``
    averages each source cell block (the downsample that preserves
    channel means — asserted in tests); ``'nearest'`` picks the
    block's top-left pixel (exact pixel preservation for integer
    upscales).

    Scale shape: map-only Arrow-batched kernel (same contract as
    extract_image_stats) — pipelines with whatever filter/sink
    follows; per-image memory is one decoded frame. Real codec in,
    real codec out: the output payload round-trips through
    decode_image like any other media row."""
    if method not in ("box", "nearest"):
        raise ValueError(f"unknown resize method {method!r}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out_ids, out_payloads = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:2] == b"P6":
                    w, h, px = decode_ppm_pixels(b)
                else:
                    w, h, px = decode_png_pixels(b)
                src = np.asarray(px, dtype=np.float64).reshape(h, w, 3)
                # per-axis block boundaries (clamped to >=1 source px)
                ys = np.linspace(0, h, height + 1)
                xs = np.linspace(0, w, width + 1)
                y0 = ys[:-1].astype(np.int64)
                y1 = np.maximum(np.minimum(ys[1:].astype(np.int64), h), y0 + 1)
                x0 = xs[:-1].astype(np.int64)
                x1 = np.maximum(np.minimum(xs[1:].astype(np.int64), w), x0 + 1)
                if method == "nearest":
                    dst = src[y0][:, x0]
                else:
                    # integral image -> every block mean with NO
                    # per-pixel Python loop (a 224x224 resize would
                    # otherwise cost ~50k interpreted iterations/image)
                    integ = np.zeros((h + 1, w + 1, 3))
                    integ[1:, 1:] = src.cumsum(axis=0).cumsum(axis=1)
                    sums = (
                        integ[y1][:, x1]
                        - integ[y0][:, x1]
                        - integ[y1][:, x0]
                        + integ[y0][:, x0]
                    )
                    area = ((y1 - y0)[:, None] * (x1 - x0)[None, :])[..., None]
                    dst = sums / area
                raster = np.rint(dst).astype(np.uint8).reshape(-1)
                out_ids.append(mid)
                out_payloads.append(encode_ppm(width, height, raster))
            yield pd.DataFrame({"media_id": out_ids, "payload": out_payloads})

    return media.select("media_id", "payload").mapInPandas(
        kernel, MEDIA_PAYLOAD_SCHEMA
    )



def synthesize_structured_avi(
    df: DataFrame, id_col: str, n_total_frames: int = 8
) -> DataFrame:
    """MJPEG AVI per id with NOISE-LIKE 16×16 frames: pixel gray =
    ((id%256)·73856093 XOR pixel·19349663 XOR frame·83492791) mod
    251 — the XOR-multiply spatial-hash family. Unlike
    :func:`synthesize_avi_media`'s block formula — where two ids
    differ by a CONSTANT brightness shift, which brightness-invariant
    perceptual hashes correctly ignore — and unlike any additive
    phase formula (same sawtooth, shifted), different id%256 values
    here produce structurally unrelated rasters: measured over ALL
    256×255/2 seed pairs × 4×4 frame pairs, the minimum cross-seed
    pHash distance is 14 bits (zero pairs within the ≤6 near-dup
    band), while ids equal mod 256 render identical frames from
    different container bytes. The planted-pair synthesizer for
    video near-dup benchmarks."""
    import numpy as np

    from .jpeg_py import encode_jpeg

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        idx = np.arange(256, dtype=np.int64)
        for pdf in batches:
            payloads = []
            for mid in pdf["media_id"]:
                seed = int(mid) % 256
                frames = []
                for f in range(n_total_frames):
                    v = (seed * 73856093) ^ (idx * 19349663) ^ (
                        f * 83492791
                    )
                    gray = (v % 251).astype(np.uint8).reshape(16, 16)
                    rgb = np.stack([gray] * 3, axis=-1)
                    frames.append(encode_jpeg(16, 16, rgb.reshape(-1)))
                payloads.append(encode_avi_mjpeg(16, 16, frames))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    src = df.select(F.col(id_col).cast("long").alias("media_id"))
    return src.mapInPandas(kernel, MEDIA_PAYLOAD_SCHEMA)
