"""The multimodal decode kernel is a stub, but a deterministic one —
pin its byte-derived outputs so swapping in a real decoder is a
conscious contract change."""

import pandas as pd

from rolaguard_data_collectors_spark.llm.multimodal import fake_decode_features


def test_fake_decode_deterministic():
    pdf = pd.DataFrame({"doc_id": [1, 2], "payload": [b"abcd", b""]})
    out = pd.concat(list(fake_decode_features(iter([pdf]))))
    assert list(out.doc_id) == [1, 2]
    # "abcd" = bytes 97..100 -> mean 98.5, max 100, all in quarter 1
    assert out.mean_byte.tolist() == [98.5, 0.0]
    assert out.max_byte.tolist() == [100, 0]
    assert out.byte_hist.tolist()[0] == [0.0, 1.0, 0.0, 0.0]
    assert out.byte_hist.tolist()[1] == [0.0, 0.0, 0.0, 0.0]


def test_fake_decode_batch_shape():
    # multiple Arrow batches in, one frame per batch out
    b1 = pd.DataFrame({"doc_id": [1], "payload": [b"\x00\x7f\xff"]})
    b2 = pd.DataFrame({"doc_id": [2], "payload": [b"zz"]})
    outs = list(fake_decode_features(iter([b1, b2])))
    assert len(outs) == 2
    assert outs[0].max_byte.tolist() == [255]


# --- real decoders (llm/codecs.py): WAV / BMP / PPM ----------------------

import io
import struct
import wave as wave_mod

import numpy as np

from rolaguard_data_collectors_spark.llm import codecs
from rolaguard_data_collectors_spark.llm.multimodal import (
    DECODE_FEATURES_SCHEMA,
    decode_features,
)


def _wav_bytes(samples, rate=8000, width=2, channels=1):
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype=np.int16).tobytes())
    return buf.getvalue()


def _bmp_bytes(pixels_bgr):
    """Minimal uncompressed 24bpp BMP from an HxWx3 BGR array."""
    px = np.asarray(pixels_bgr, dtype=np.uint8)
    h, w, _ = px.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = b"".join(px[r].tobytes() + b"\x00" * pad for r in range(h))
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return header + info + body


def test_decode_wav_exact():
    # constant amplitude 1000 -> rms == peak == 1000
    feat = codecs.decode_wav(_wav_bytes([1000] * 16))
    assert feat["decoder"] == "wav"
    assert feat["sample_rate"] == 8000
    assert feat["n_channels"] == 1
    assert feat["n_samples"] == 16
    assert feat["mean_val"] == 1000.0
    assert feat["peak_val"] == 1000.0


def test_decode_bmp_exact():
    # 2x2: pure red, pure blue, black, white (BGR order in file)
    img = [[[0, 0, 255], [255, 0, 0]], [[0, 0, 0], [255, 255, 255]]]
    feat = codecs.decode_bmp(_bmp_bytes(img))
    assert feat["decoder"] == "bmp"
    assert (feat["width"], feat["height"]) == (2, 2)
    assert feat["mean_rgb"] == [127.5, 63.75, 127.5]


def test_decode_ppm_exact():
    body = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255])
    feat = codecs.decode_ppm(b"P6\n# comment\n2 2\n255\n" + body)
    assert feat["decoder"] == "ppm"
    assert (feat["width"], feat["height"]) == (2, 2)
    assert feat["mean_rgb"] == [127.5, 127.5, 127.5]


def test_sniff_and_fallbacks():
    assert codecs.sniff(_wav_bytes([0])) == "wav"
    assert codecs.sniff(b"BM????") == "bmp"
    assert codecs.sniff(b"P6 1 1 255 abc") == "ppm"
    assert codecs.sniff(b"\xff\xd8\xff jpeg") is None  # JPEG -> stub path
    assert codecs.decode_media(b"BM" + b"\x00" * 10) is None  # truncated -> stub
    assert codecs.decode_media(b"plain text") is None


def test_dispatching_kernel_mixed_batch(spark):
    """The unified kernel through REAL Spark mapInPandas: one batch
    mixing wav, bmp, and raw bytes routes each row to its decoder."""
    rows = [
        (1, bytearray(_wav_bytes([1000] * 16))),
        (2, bytearray(_bmp_bytes([[[0, 0, 0], [255, 255, 255]]]))),
        (3, bytearray(b"abcd")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {
        r.doc_id: r
        for r in df.mapInPandas(decode_features, DECODE_FEATURES_SCHEMA).collect()
    }
    assert out[1].decoder == "wav" and out[1].n_samples == 16
    assert out[1].mean_val == 1000.0
    assert out[2].decoder == "bmp" and (out[2].width, out[2].height) == (2, 1)
    assert out[3].decoder == "raw" and out[3].mean_val == 98.5
    assert out[3].byte_hist == [0.0, 1.0, 0.0, 0.0]
