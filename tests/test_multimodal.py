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
