"""Pure-stdlib media codecs for the multimodal pipeline seam.

The container ships no image/audio libraries, but four formats are
fully decodable (and encodable) with ``struct`` / ``zlib`` / ``wave``
alone:

- BMP (Windows bitmap, uncompressed 24-bit, BITMAPINFOHEADER)
- PPM (binary P6)
- PNG (non-interlaced, 8-bit depth; gray / truecolor / palette /
  gray+alpha / RGBA color types, all five scanline filters — the
  format is just chunk framing + zlib + per-row delta filters, spec'd
  in RFC 2083, so ``struct`` + ``zlib`` cover it completely)
- WAV (RIFF PCM, via the stdlib ``wave`` module)

These make the decode seam in :mod:`graph_loom_spark.ops.multimodal`
*real*: headers are parsed from actual bytes, pixels are decoded, and a
64-bit average-hash perceptual fingerprint is computed from the decoded
raster. Formats that genuinely need external codecs (JPEG/MP4) still
raise ``UnsupportedMediaError`` — the documented seam where a
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
import zlib


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


# ----------------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(width: int, height: int, pixel_fn, filter_type: int = 0) -> bytes:
    """Minimal truecolor 8-bit PNG; ``pixel_fn(x, y) -> (r, g, b)`` with
    (0, 0) top-left. ``filter_type`` applies that scanline filter
    (0=None, 1=Sub, 2=Up, 3=Average, 4=Paeth) to every row — used by
    tests to exercise each unfilter path.

    The IDAT stream uses zlib level 0 (stored deflate blocks), so the
    total byte size is closed-form in (width, height):
    ``68 + (3·width + 1)·height`` while one stored block suffices
    (raw ≤ 65535 bytes) — which is what lets a SQL oracle predict
    ``n_bytes`` for fixture payloads exactly.
    """
    if filter_type not in (0, 1, 2, 3, 4):
        raise ValueError(f"PNG filter type {filter_type}")
    stride = width * 3
    prev = bytes(stride)
    raw = bytearray()
    for y in range(height):
        line = bytearray()
        for x in range(width):
            r, g, b = pixel_fn(x, y)
            line += bytes((r & 0xFF, g & 0xFF, b & 0xFF))
        raw.append(filter_type)
        if filter_type == 0:
            raw += line
        else:
            for i in range(stride):
                a = line[i - 3] if i >= 3 else 0
                up = prev[i]
                c = prev[i - 3] if i >= 3 else 0
                pred = {1: a, 2: up, 3: (a + up) >> 1, 4: _paeth(a, up, c)}[filter_type]
                raw.append((line[i] - pred) & 0xFF)
        prev = bytes(line)
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 0))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> dict:
    """Parse a non-interlaced 8-bit-depth PNG → ``{width, height,
    pixels}`` (row-major RGB, (0,0) top-left; alpha dropped, gray and
    palette expanded). Handles color types 0/2/3/4/6 and all five
    scanline filters; 16-bit depth and Adam7 interlace raise
    ``UnsupportedMediaError``."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(data):
        ln, typ = struct.unpack_from(">I4s", data, pos)
        payload = data[pos + 8 : pos + 8 + ln]
        if len(payload) < ln:
            raise ValueError("truncated PNG chunk")
        pos += 12 + ln
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif typ == b"PLTE":
            plte = payload
        elif typ == b"IDAT":
            idat += payload
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, ctype, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError(f"PNG compression={comp} filter-method={filt}")
    if interlace != 0:
        raise UnsupportedMediaError("Adam7-interlaced PNG")
    if depth != 8:
        raise UnsupportedMediaError(f"PNG bit depth {depth}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise UnsupportedMediaError(f"PNG color type {ctype}")
    if ctype == 3 and plte is None:
        raise ValueError("paletted PNG missing PLTE")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"bad PNG zlib stream: {e}") from e
    stride = width * channels
    if len(raw) < (stride + 1) * height:
        raise ValueError("truncated PNG pixel data")
    bpp = channels  # bytes per pixel at depth 8
    prev = bytearray(stride)
    rows: list[bytearray] = []
    rp = 0
    for _y in range(height):
        ftype = raw[rp]
        line = bytearray(raw[rp + 1 : rp + 1 + stride])
        rp += 1 + stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG scanline filter {ftype}")
        rows.append(line)
        prev = line
    pixels: list[tuple[int, int, int]] = []
    for line in rows:
        if ctype == 2:
            pixels.extend(tuple(line[i : i + 3]) for i in range(0, stride, 3))
        elif ctype == 6:
            pixels.extend(tuple(line[i : i + 3]) for i in range(0, stride, 4))
        elif ctype == 0:
            pixels.extend((v, v, v) for v in line)
        elif ctype == 4:
            pixels.extend((line[i], line[i], line[i]) for i in range(0, stride, 2))
        else:  # ctype == 3: palette lookup
            pixels.extend(tuple(plte[3 * v : 3 * v + 3]) for v in line)
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


def decode_wav(data: bytes, return_samples: bool = False) -> dict:
    """Parse a PCM WAV → header params + RMS amplitude of the samples.

    ``{n_channels, sample_rate, sample_width, n_frames, duration_s, rms}``
    — RMS over all channels, computed from the raw frames with
    ``struct`` (audioop-free, so it survives Python ≥ 3.13 too).
    ``return_samples=True`` adds the decoded ``samples`` tuple (for
    fingerprinting — off by default so feature extraction doesn't haul
    sample arrays around)."""
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
    out = {
        "n_channels": n_channels,
        "sample_rate": rate,
        "sample_width": width,
        "n_frames": n_frames,
        "duration_s": n_frames / rate if rate else 0.0,
        "rms": rms,
    }
    if return_samples:
        out["samples"] = samples
    return out


# --------------------------------------------------------------------- video

_Y4M_MAGIC = b"YUV4MPEG2"


def encode_y4m(width: int, height: int, n_frames: int, pixel_fn) -> bytes:
    """YUV4MPEG2 container, C420 chroma; ``pixel_fn(f, x, y) -> (r, g,
    b)`` per frame ``f``. Even dimensions required (4:2:0 subsampling).
    BT.601 full-range integer RGB→YUV; chroma = 2×2 box average.
    Deterministic fixture encoder: the total size is closed-form —
    ``len(header) + n_frames·(6 + w·h·3/2)``."""
    if width % 2 or height % 2:
        raise ValueError("y4m 4:2:0 needs even dimensions")
    out = bytearray(f"YUV4MPEG2 W{width} H{height} F25:1 Ip A1:1 C420jpeg\n".encode())
    half_w, half_h = width // 2, height // 2
    for f in range(n_frames):
        out += b"FRAME\n"
        ys = bytearray(width * height)
        us = bytearray(half_w * half_h)
        vs = bytearray(half_w * half_h)
        for y in range(height):
            for x in range(width):
                r, g, b = pixel_fn(f, x, y)
                ys[y * width + x] = (77 * r + 150 * g + 29 * b) >> 8
        for cy in range(half_h):
            for cx in range(half_w):
                su = sv = 0
                for dy in (0, 1):
                    for dx in (0, 1):
                        r, g, b = pixel_fn(f, 2 * cx + dx, 2 * cy + dy)
                        su += 128 + ((-43 * r - 85 * g + 128 * b) >> 8)
                        sv += 128 + ((128 * r - 107 * g - 21 * b) >> 8)
                us[cy * half_w + cx] = min(255, max(0, su // 4))
                vs[cy * half_w + cx] = min(255, max(0, sv // 4))
        out += ys + us + vs
    return bytes(out)


def encode_mjpeg(frame_bodies: list[bytes]) -> bytes:
    """Concatenated-JPEG stream from opaque frame bodies (bodies must not
    contain the 0xFFD9 EOI marker). Each frame is wrapped SOI…EOI — the
    real MJPEG stream shape; only the inner JPEG entropy data is fake."""
    out = bytearray()
    for body in frame_bodies:
        if b"\xff\xd9" in body:
            raise ValueError("frame body contains EOI marker")
        out += b"\xff\xd8" + body + b"\xff\xd9"
    return bytes(out)


def demux_y4m(data: bytes) -> dict:
    """Demux a YUV4MPEG2 stream → ``{width, height, frames}`` with each
    frame the raw C420 planes (``w·h`` Y then ``w/2·h/2`` U and V).
    Non-4:2:0 chroma raises ``UnsupportedMediaError``."""
    if not data.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 payload")
    nl = data.index(b"\n")
    width = height = None
    for tok in data[:nl].decode("ascii", "replace").split()[1:]:
        if tok.startswith("W"):
            width = int(tok[1:])
        elif tok.startswith("H"):
            height = int(tok[1:])
        elif tok.startswith("C") and not tok[1:].startswith("420"):
            raise UnsupportedMediaError(f"y4m chroma mode {tok}")
    if not width or not height:
        raise ValueError("y4m header missing W/H")
    fsize = width * height + 2 * ((width // 2) * (height // 2))
    frames: list[bytes] = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.index(b"\n", pos)
        if not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError("bad y4m FRAME marker")
        frame = data[fnl + 1 : fnl + 1 + fsize]
        if len(frame) < fsize:
            raise ValueError("truncated y4m frame")
        frames.append(bytes(frame))
        pos = fnl + 1 + fsize
    return {"width": width, "height": height, "frames": frames}


def demux_mjpeg(data: bytes) -> dict:
    """Split a concatenated-JPEG (MJPEG) stream on SOI/EOI markers →
    ``{frames}``. Real demux logic; per-frame DECODE still needs an
    external JPEG codec (the documented seam)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not an MJPEG payload")
    frames: list[bytes] = []
    pos = 0
    while pos < len(data):
        if data[pos : pos + 2] != b"\xff\xd8":
            raise ValueError("garbage between MJPEG frames")
        end = data.find(b"\xff\xd9", pos + 2)
        if end < 0:
            raise ValueError("truncated MJPEG frame (no EOI)")
        frames.append(bytes(data[pos : end + 2]))
        pos = end + 2
    return {"frames": frames}


def demux_video(data: bytes) -> dict:
    """Sniff + demux a video payload (Y4M/MJPEG) → ``{frames, ...}``;
    container formats that need external demuxers (MP4/MKV…) raise
    ``UnsupportedMediaError``."""
    if data is None:
        raise ValueError("no payload")
    if data.startswith(_Y4M_MAGIC):
        return demux_y4m(data)
    if data[:2] == b"\xff\xd8":
        return demux_mjpeg(data)
    raise UnsupportedMediaError("video container requires an external demuxer")


def yuv420_frame_to_rgb(frame: bytes, width: int, height: int) -> list:
    """One C420 frame (as produced by :func:`demux_y4m`) → row-major
    RGB tuples; BT.601 full-range integer inverse, clamped."""
    half_w = width // 2
    ylen = width * height
    clen = half_w * (height // 2)
    if len(frame) < ylen + 2 * clen:
        raise ValueError("short YUV frame")
    ys = frame[:ylen]
    us = frame[ylen : ylen + clen]
    vs = frame[ylen + clen : ylen + 2 * clen]
    out = []
    for y in range(height):
        crow = (y // 2) * half_w
        base = y * width
        for x in range(width):
            yy = ys[base + x]
            u = us[crow + x // 2] - 128
            v = vs[crow + x // 2] - 128
            r = yy + ((359 * v) >> 8)
            g = yy - ((88 * u + 183 * v) >> 8)
            b = yy + ((454 * u) >> 8)
            out.append(
                (min(255, max(0, r)), min(255, max(0, g)), min(255, max(0, b)))
            )
    return out


# ------------------------------------------------------------------ dispatch


def decode_image(data: bytes) -> dict:
    """Sniff + decode an image payload (BMP/PPM/PNG) → ``{width, height,
    pixels}``; anything else (JPEG, …) raises ``UnsupportedMediaError``."""
    if data is None:
        raise ValueError("no payload")
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:2] == b"P6":
        return decode_ppm(data)
    if data[:8] == _PNG_SIG:
        return decode_png(data)
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


def energy_fingerprint(samples) -> str:
    """64-bit energy-signature of a PCM sample stream, hex-encoded —
    the acoustic analogue of :func:`average_hash`: split the stream
    into 64 contiguous windows (``i·64 // n``); bit j = 1 iff window
    j's MEAN energy exceeds the overall mean. The compare is the
    cross-multiplied integer form ``E_j·n > ΣE·n_j`` — no division
    anywhere, so the fingerprint is bit-reproducible in any engine
    (ties → 0). Robust to windowing drift the raw sample hash is not."""
    n = len(samples)
    if n == 0:
        return f"{0:016x}"
    E = [0] * 64
    C = [0] * 64
    tot = 0
    for i, s in enumerate(samples):
        e = int(s) * int(s)
        j = i * 64 // n
        E[j] += e
        C[j] += 1
        tot += e
    bits = 0
    for j in range(64):
        bits = (bits << 1) | (1 if E[j] * n > tot * C[j] else 0)
    return f"{bits:016x}"
