"""Pure-stdlib media codecs for the multimodal pipeline seam.

The container ships no image/audio libraries, but three formats are
fully decodable (and encodable) with ``struct`` / ``wave`` alone:

- BMP (Windows bitmap, uncompressed 24-bit, BITMAPINFOHEADER)
- PPM (binary P6)
- WAV (RIFF PCM, via the stdlib ``wave`` module)

These make the decode seam in :mod:`graph_loom_spark.ops.multimodal`
*real*: headers are parsed from actual bytes, pixels are decoded, and a
64-bit average-hash perceptual fingerprint is computed from the decoded
raster. Formats that genuinely need external codecs (PNG/JPEG/MP4)
still raise ``UnsupportedMediaError`` — the documented seam where a
production build plugs in Pillow/pyav.

Everything here is per-row Python executed inside Arrow-batched
``mapInPandas`` workers (see multimodal.py) — the Spark plan stays
columnar; only the byte-level codec work is Python, which is the same
shape a Pillow-based build would have.
"""

from __future__ import annotations

import io
import struct
import wave


class UnsupportedMediaError(Exception):
    """Raised for formats that need an external codec (PNG/JPEG/MP4...)."""


# ----------------------------------------------------------------------- BMP


def encode_bmp(width: int, height: int, pixel_fn) -> bytes:
    """Minimal uncompressed 24-bit BMP (BITMAPINFOHEADER, bottom-up).

    ``pixel_fn(x, y) -> (r, g, b)`` with (0, 0) the TOP-left pixel.
    Deterministic: used by tests/fixtures to build real payloads.
    """
    row_size = (width * 3 + 3) & ~3  # rows padded to 4-byte boundary
    image_size = row_size * height
    file_size = 54 + image_size
    header = struct.pack(
        "<2sIHHI", b"BM", file_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    rows = []
    pad = b"\x00" * (row_size - width * 3)
    for y in range(height - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(width):
            r, g, b = pixel_fn(x, y)
            row += bytes((b & 0xFF, g & 0xFF, r & 0xFF))  # BGR on disk
        rows.append(bytes(row) + pad)
    return header + b"".join(rows)


def decode_bmp(data: bytes) -> dict:
    """Parse an uncompressed 24-bit BMP → ``{width, height, pixels}``
    where ``pixels`` is a row-major list of (r, g, b), (0,0) top-left."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise UnsupportedMediaError(f"BMP core-header variant (size {hdr_size})")
    width, height = struct.unpack_from("<ii", data, 18)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise UnsupportedMediaError(f"BMP bpp={bpp} compression={compression}")
    bottom_up = height > 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3
    if data_offset + row_size * height > len(data):
        raise ValueError("truncated BMP payload")
    pixels: list[tuple[int, int, int]] = []
    for y in range(height):
        sy = (height - 1 - y) if bottom_up else y
        base = data_offset + sy * row_size
        row = data[base : base + width * 3]
        for x in range(width):
            b, g, r = row[x * 3 : x * 3 + 3]
            pixels.append((r, g, b))
    return {"width": width, "height": height, "pixels": pixels}


# ----------------------------------------------------------------------- PPM


def encode_ppm(width: int, height: int, pixel_fn) -> bytes:
    """Binary P6 PPM; ``pixel_fn(x, y) -> (r, g, b)``, (0,0) top-left."""
    body = bytearray()
    for y in range(height):
        for x in range(width):
            r, g, b = pixel_fn(x, y)
            body += bytes((r & 0xFF, g & 0xFF, b & 0xFF))
    return f"P6\n{width} {height}\n255\n".encode() + bytes(body)


def decode_ppm(data: bytes) -> dict:
    """Parse binary P6 PPM → ``{width, height, pixels}`` (row-major RGB).

    Handles the full comment/whitespace grammar of the header."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise UnsupportedMediaError("16-bit PPM")
    need = width * height * 3
    body = data[pos : pos + need]
    if len(body) < need:
        raise ValueError("truncated PPM payload")
    pixels = [tuple(body[i : i + 3]) for i in range(0, need, 3)]
    return {"width": width, "height": height, "pixels": pixels}


# ----------------------------------------------------------------------- WAV


def encode_wav(
    n_frames: int, sample_rate: int, frame_fn, n_channels: int = 1
) -> bytes:
    """PCM-16 WAV; ``frame_fn(i) -> int`` sample in [-32768, 32767]
    (same value across channels). Deterministic fixture encoder."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        frames = bytearray()
        for i in range(n_frames):
            s = struct.pack("<h", max(-32768, min(32767, frame_fn(i))))
            frames += s * n_channels
        w.writeframes(bytes(frames))
    return buf.getvalue()


def decode_wav(data: bytes) -> dict:
    """Parse a PCM WAV → header params + RMS amplitude of the samples.

    ``{n_channels, sample_rate, sample_width, n_frames, duration_s, rms}``
    — RMS over all channels, computed from the raw frames with
    ``struct`` (audioop-free, so it survives Python ≥ 3.13 too)."""
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            n_channels = w.getnchannels()
            rate = w.getframerate()
            width = w.getsampwidth()
            n_frames = w.getnframes()
            raw = w.readframes(n_frames)
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a PCM WAV payload: {e}") from e
    if width == 2:
        samples = struct.unpack(f"<{len(raw) // 2}h", raw)
    elif width == 1:
        samples = tuple(b - 128 for b in raw)  # 8-bit WAV is unsigned
    else:
        raise UnsupportedMediaError(f"WAV sample width {width}")
    rms = (sum(s * s for s in samples) / len(samples)) ** 0.5 if samples else 0.0
    return {
        "n_channels": n_channels,
        "sample_rate": rate,
        "sample_width": width,
        "n_frames": n_frames,
        "duration_s": n_frames / rate if rate else 0.0,
        "rms": rms,
    }


# ------------------------------------------------------------------ dispatch


def decode_image(data: bytes) -> dict:
    """Sniff + decode an image payload (BMP/PPM) → ``{width, height,
    pixels}``; anything else raises ``UnsupportedMediaError``."""
    if data is None:
        raise ValueError("no payload")
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    raise UnsupportedMediaError("image format requires an external codec")


def average_hash(width: int, height: int, pixels) -> str:
    """64-bit average-hash fingerprint of a decoded raster, hex-encoded.

    Classic pHash-family construction: grayscale → 8×8 box-downsample →
    threshold at the mean → 64 bits (row-major, MSB first). Pure
    integer arithmetic, fully deterministic across platforms.
    """
    gs = [(30 * r + 59 * g + 11 * b) // 100 for (r, g, b) in pixels]
    cells = [[0, 0] for _ in range(64)]  # (sum, count) per 8×8 cell
    for y in range(height):
        cy = y * 8 // height
        base = y * width
        for x in range(width):
            c = cells[cy * 8 + (x * 8 // width)]
            c[0] += gs[base + x]
            c[1] += 1
        # degenerate rasters (<8px a side) leave some cells empty; they
        # threshold as 0 below, which is still deterministic
    means = [s / n if n else 0.0 for s, n in cells]
    overall = sum(means) / 64
    bits = 0
    for m in means:
        bits = (bits << 1) | (1 if m > overall else 0)
    return f"{bits:016x}"
