"""Real media decoders for the multimodal column — pure stdlib + numpy.

The container has no PIL/ffmpeg, but uncompressed container formats
don't need them: WAV/PCM (stdlib ``wave``), 24-bpp BMP and binary PPM
(``struct`` + numpy) decode exactly. The mapInPandas kernel in
``multimodal.py`` dispatches on magic bytes — these formats take the
real path; codec formats (JPEG/MP3/H.264) fall back to the
deterministic byte-feature stub until a codec library is present.

Each decoder returns a plain dict of features; raising ValueError
routes the payload to the stub path (never fails the batch).
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np

_WAV_DTYPES = {1: np.int8, 2: np.int16, 4: np.int32}


def sniff(b: bytes) -> str | None:
    """Magic-byte format detection for the dispatch in the kernel."""
    if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    if len(b) >= 2 and b[:2] == b"BM":
        return "bmp"
    if len(b) >= 2 and b[:2] == b"P6":
        return "ppm"
    return None


def _read_wav(b: bytes) -> tuple[int, int, int, int, bytes]:
    """(n_ch, width, rate, n_frames, frames) from a PCM WAV buffer.
    wave raises its own Error class (not ValueError) on a RIFF/WAVE
    container missing fmt/data chunks, and EOFError on some
    truncations — normalize to the ValueError contract every kernel's
    malformed-media guard catches (round-7 fuzz find: a truncated WAV
    crashed the executor instead of taking the stub path)."""
    try:
        with wave.open(io.BytesIO(b)) as w:
            return (
                w.getnchannels(),
                w.getsampwidth(),
                w.getframerate(),
                w.getnframes(),
                w.readframes(w.getnframes()),
            )
    except (wave.Error, EOFError, struct.error) as e:
        raise ValueError(f"malformed WAV: {e}") from e


def decode_wav(b: bytes) -> dict:
    """PCM WAV -> rate/channels/length + signal stats (RMS, peak)."""
    n_ch, width, rate, n_frames, frames = _read_wav(b)
    if width not in _WAV_DTYPES:
        raise ValueError(f"unsupported sample width {width}")
    arr = np.frombuffer(frames, dtype=_WAV_DTYPES[width]).astype(np.float64)
    rms = float(np.sqrt(np.mean(arr**2))) if arr.size else 0.0
    peak = float(np.max(np.abs(arr))) if arr.size else 0.0
    return {
        "decoder": "wav",
        "sample_rate": rate,
        "n_channels": n_ch,
        "n_samples": n_frames,
        "mean_val": round(rms, 6),
        "peak_val": round(peak, 6),
    }


def decode_bmp(b: bytes) -> dict:
    """Uncompressed 24-bpp BMP -> dimensions + channel means."""
    if len(b) < 54:
        raise ValueError("truncated BMP header")
    pixel_offset = struct.unpack_from("<I", b, 10)[0]
    width, height = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if compression != 0 or bpp != 24:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    rows = abs(height)
    if width <= 0 or rows == 0:
        # round-7 fuzz find: a 0x0 (or negative-width) header decodes
        # to an empty pixel array whose mean is NaN — poisoning the
        # feature columns — and downstream index math crashes.
        raise ValueError(f"degenerate BMP dimensions {width}x{height}")
    row_bytes = ((bpp * width + 31) // 32) * 4
    if pixel_offset + row_bytes * rows > len(b):
        raise ValueError("truncated BMP pixel data")
    px = np.frombuffer(b, dtype=np.uint8, count=row_bytes * rows, offset=pixel_offset)
    px = px.reshape(rows, row_bytes)[:, : width * 3].reshape(rows, width, 3)
    bgr = px.reshape(-1, 3).mean(axis=0)  # BMP stores BGR
    gray = float(bgr.mean())
    return {
        "decoder": "bmp",
        "width": width,
        "height": rows,
        "mean_val": round(gray, 6),
        "mean_rgb": [round(float(bgr[2]), 6), round(float(bgr[1]), 6), round(float(bgr[0]), 6)],
    }


def decode_ppm(b: bytes) -> dict:
    """Binary PPM (P6) -> dimensions + channel means."""
    fields: list[bytes] = []
    pos = 2  # past "P6"
    while len(fields) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if pos < len(b) and b[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(b[start:pos])
    pos += 1  # single whitespace after maxval
    width, height, maxval = (int(f) for f in fields)
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    if width <= 0 or height <= 0:
        # round-7 fuzz find: zero dims -> NaN channel means; NEGATIVE
        # dims are worse — `need` goes negative, the truncation check
        # passes vacuously, and np.frombuffer(count<0) silently reads
        # the whole buffer.
        raise ValueError(f"degenerate PPM dimensions {width}x{height}")
    need = width * height * 3
    if pos + need > len(b):
        raise ValueError("truncated PPM pixel data")
    px = np.frombuffer(b, dtype=np.uint8, count=need, offset=pos).reshape(-1, 3)
    rgb = px.mean(axis=0)
    return {
        "decoder": "ppm",
        "width": width,
        "height": height,
        "mean_val": round(float(rgb.mean()), 6),
        "mean_rgb": [round(float(v), 6) for v in rgb],
    }


DECODERS = {"wav": decode_wav, "bmp": decode_bmp, "ppm": decode_ppm}


# --- real resize / resample ----------------------------------------------


def _rgb_pixels(b: bytes) -> np.ndarray:
    """(H, W, 3) uint8 RGB array from a BMP or PPM payload. BMP rows
    are bottom-up when the header height is positive, and channels are
    BGR — both normalized here so resize output is orientation-true."""
    kind = sniff(b)
    if kind == "ppm":
        d = decode_ppm(b)  # validates; reparse pixels with its offsets
        # find pixel offset again (decode_ppm validated the header)
        fields, pos = [], 2
        while len(fields) < 3:
            while b[pos : pos + 1].isspace():
                pos += 1
            if b[pos : pos + 1] == b"#":
                while b[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while not b[pos : pos + 1].isspace():
                pos += 1
            fields.append(b[start:pos])
        pos += 1
        w, h = d["width"], d["height"]
        return np.frombuffer(b, np.uint8, count=w * h * 3, offset=pos).reshape(h, w, 3)
    if kind == "bmp":
        # validate FIRST (header length / bpp / compression / dims /
        # truncation) — unpacking before the length check let
        # struct.error escape the ValueError contract on a <54-byte
        # buffer (round-7 fuzz find)
        decode_bmp(b)
        pixel_offset = struct.unpack_from("<I", b, 10)[0]
        width, height = struct.unpack_from("<ii", b, 18)
        rows = abs(height)
        row_bytes = ((24 * width + 31) // 32) * 4
        px = np.frombuffer(b, np.uint8, count=row_bytes * rows, offset=pixel_offset)
        px = px.reshape(rows, row_bytes)[:, : width * 3].reshape(rows, width, 3)
        if height > 0:
            px = px[::-1]  # bottom-up storage -> top-down array
        return px[:, :, ::-1]  # BGR -> RGB
    raise ValueError("not a decodable image")


def encode_ppm(px: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> canonical binary PPM (P6) bytes."""
    h, w = px.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def resize_image(b: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of a BMP/PPM payload, re-encoded as
    canonical P6 PPM (the deterministic interchange container). Index
    map is the standard floor(i * src / dst) — pure integer arithmetic,
    bit-identical everywhere."""
    px = _rgb_pixels(b)
    h, w = px.shape[:2]
    ri = (np.arange(out_h) * h) // out_h
    ci = (np.arange(out_w) * w) // out_w
    return encode_ppm(px[ri][:, ci])


def resample_wav(b: bytes, out_rate: int) -> bytes:
    """Nearest-neighbor PCM resample to ``out_rate``, re-encoded as
    WAV with the source's channel count and sample width."""
    n_ch, width, rate, n_frames, frames = _read_wav(b)
    if width not in _WAV_DTYPES:
        raise ValueError(f"unsupported sample width {width}")
    arr = np.frombuffer(frames, dtype=_WAV_DTYPES[width]).reshape(n_frames, n_ch)
    out_n = max(1, (n_frames * out_rate) // rate) if n_frames else 0
    idx = (np.arange(out_n) * n_frames) // max(out_n, 1)
    out = arr[idx] if n_frames else arr
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wo:
        wo.setnchannels(n_ch)
        wo.setsampwidth(width)
        wo.setframerate(out_rate)
        wo.writeframes(out.tobytes())
    return buf.getvalue()


def decode_media(b: bytes) -> dict | None:
    """Dispatch on magic bytes; None -> caller's stub path."""
    kind = sniff(b)
    if kind is None:
        return None
    try:
        return DECODERS[kind](b)
    except ValueError:
        return None


def dhash64(b: bytes) -> int:
    """64-bit difference hash (dHash) of a BMP/PPM payload — the
    perceptual near-dup key for image dedup: decode -> integer-mean
    grayscale -> nearest-neighbor 9x8 downsample -> 64 horizontal
    gradient sign bits. Robust to resizing and small pixel noise
    (hamming distance ~ perceptual distance); bit-identical across
    platforms because every step is integer arithmetic on uint8
    (grayscale = (r + g + b) // 3, the floor(i*src/dst) index map from
    resize_image)."""
    px = _rgb_pixels(b).astype(np.uint16)
    gray = (px[:, :, 0] + px[:, :, 1] + px[:, :, 2]) // 3
    h, w = gray.shape
    ri = (np.arange(8) * h) // 8
    ci = (np.arange(9) * w) // 9
    g = gray[ri][:, ci]
    bits = (g[:, 1:] > g[:, :-1]).flatten()
    out = 0
    for bit in bits:
        out = (out << 1) | int(bit)
    return out


def ahash64(b: bytes) -> int:
    """64-bit audio fingerprint of a PCM WAV payload — the audio twin
    of dhash64: downmix to mono, split into 17 equal time frames,
    4 spectral-band energies per frame (rfft magnitude, linear quarter
    bands), bit = band energy RISES from frame f to f+1 (16 deltas x 4
    bands = 64 bits). Energy-delta signs are invariant under uniform
    amplitude scaling and robust to small noise; unrelated audio gives
    ~32-bit hamming distance (random signs)."""
    n_ch, width, _rate, n_frames, frames = _read_wav(b)
    if width not in _WAV_DTYPES:
        raise ValueError(f"unsupported sample width {width}")
    arr = np.frombuffer(frames, dtype=_WAV_DTYPES[width]).astype(np.float64)
    mono = arr.reshape(-1, n_ch).mean(axis=1) if n_ch > 1 else arr
    if mono.size < 34:  # need >= 2 samples per time frame
        mono = np.pad(mono, (0, 34 - mono.size))
    energies = np.empty((17, 4))
    for f, chunk in enumerate(np.array_split(mono, 17)):
        spec = np.abs(np.fft.rfft(chunk)) ** 2
        spec = spec[1:] if spec.size > 1 else spec  # drop DC
        for q, band in enumerate(np.array_split(spec, 4)):
            energies[f, q] = band.sum()
    bits = (energies[1:] > energies[:-1]).flatten()
    out = 0
    for bit in bits:
        out = (out << 1) | int(bit)
    return out
