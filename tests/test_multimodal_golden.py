"""Byte-exact golden tests for the multimodal stub codecs
(llm/multimodal.py). The codec bodies are documented stubs (no image/audio
libraries in this container), so these goldens pin the PLUMBING CONTRACT —
payload bytes in, exact feature rows out — that a real PIL/pyav swap-in must
preserve for schema, batching, and determinism (VERDICT r01 item 9)."""

from __future__ import annotations

import pandas as pd

from iceberg_insert_spark.llm.multimodal import (
    FRAME_BYTES,
    FRAME_STRIDE,
    _fake_decode,
    _fake_frame_sample,
)

# Known payloads with hand-computed features.
_ABC = b"abc"  # sum = 97+98+99 = 294
_LONG = bytes(range(200))  # sum(b[:64]) = sum(0..63) = 2016


def test_fake_decode_golden():
    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "payload": [_ABC, _LONG, b""]})
    (out,) = list(_fake_decode(iter([pdf])))
    got = out.set_index("doc_id").to_dict("index")
    assert got[1] == {
        "byte_len": 3,
        "fake_width": 294 % 640 + 1,  # 295
        "fake_height": 3 % 480 + 1,  # 4
        "checksum_mod": 294 % 997,  # 294
    }
    assert got[2] == {
        "byte_len": 200,
        "fake_width": 2016 % 640 + 1,  # 97
        "fake_height": 200 % 480 + 1,  # 201
        "checksum_mod": 2016 % 997,  # 22
    }
    # empty payload must not crash and must checksum to 0
    assert got[3] == {
        "byte_len": 0,
        "fake_width": 1,
        "fake_height": 1,
        "checksum_mod": 0,
    }


def test_fake_frame_sample_golden():
    # 100 bytes -> frames of 32: [0:32], [32:64], [64:96], [96:100];
    # stride 4 keeps frame_no 0 only.
    payload = bytes(range(100))
    pdf = pd.DataFrame({"doc_id": [7], "payload": [payload]})
    (out,) = list(_fake_frame_sample(iter([pdf])))
    rows = list(out.itertuples(index=False))
    assert [(r.doc_id, r.frame_no, r.frame_len) for r in rows] == [(7, 0, 32)]
    assert rows[0].frame_checksum == sum(range(32)) % 997  # 496

    # 5 frames (130 bytes) -> keeps frame 0 and frame 4 (the 2-byte tail)
    payload2 = bytes([1] * 130)
    pdf2 = pd.DataFrame({"doc_id": [8], "payload": [payload2]})
    (out2,) = list(_fake_frame_sample(iter([pdf2])))
    rows2 = [(r.frame_no, r.frame_len, r.frame_checksum)
             for r in out2.itertuples(index=False)]
    assert rows2 == [(0, FRAME_BYTES, FRAME_BYTES % 997), (4, 2, 2)]
    assert FRAME_STRIDE == 4  # golden rows above assume the stride constant
