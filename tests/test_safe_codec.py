"""Safe codec round-trip + adversarial input tests.

The persistence payload must survive encode/decode exactly, and malformed
or hostile bytes must raise CodecError rather than construct arbitrary
objects (the pickle vulnerability this codec replaces)."""

import numpy as np
import pytest

from infidex_tpu.utils.safe_codec import CodecError, decode, encode


def test_roundtrip_primitives():
    values = [
        None, True, False, 0, -1, 2**62, -(2**62), 2**80, -(2**80),
        3.5, float("inf"), "", "héllo", "￿￾ pad chars",
        b"", b"\x00\xff", [], [1, "a", None], (1, 2), {},
        {"k": [1, 2], 3: "v", (1, "t"): True},
    ]
    for v in values:
        assert decode(encode(v)) == v, v


def test_roundtrip_nested_payload_shape():
    payload = {
        "version": 3,
        "documents": [(1, 0, "text", None, False, [{"name": "t", "value": "x"}], "id")],
        "terms": [("abc", 4), ("§ab", 1)],
        "term_offsets": np.array([0, 3, 7], dtype=np.int64),
        "postings_docs": np.arange(7, dtype=np.int32),
        "postings_weights": np.full(7, 255, dtype=np.uint8),
    }
    out = decode(encode(payload))
    assert out["terms"] == payload["terms"]
    assert out["documents"][0][2] == "text"
    np.testing.assert_array_equal(out["term_offsets"], payload["term_offsets"])
    assert out["postings_docs"].dtype == np.int32
    assert out["postings_weights"].dtype == np.uint8


def test_roundtrip_ndarray_2d_and_bool():
    arr = np.arange(12, dtype=np.float32).reshape(3, 4)
    out = decode(encode({"a": arr, "m": np.array([True, False])}))
    np.testing.assert_array_equal(out["a"], arr)
    assert out["a"].shape == (3, 4)
    assert out["m"].dtype == np.bool_


def test_surrogate_strings_roundtrip():
    s = "a\ud800b"  # lone surrogate, as the tokenizer pads can produce
    assert decode(encode(s)) == s


@pytest.mark.parametrize("blob", [
    b"",                        # empty
    b"\xfe",                    # unknown tag
    b"\x03\x01",                # truncated int64
    b"\x06\x05ab",              # str length overruns buffer
    b"\x08\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01",  # absurd list count
    encode(42) + b"x",          # trailing bytes
])
def test_malformed_inputs_raise(blob):
    with pytest.raises(CodecError):
        decode(blob)


def test_object_dtype_rejected_on_encode():
    with pytest.raises(CodecError):
        encode(np.array([object()], dtype=object))


def test_disallowed_dtype_rejected_on_decode():
    # hand-craft an ndarray record claiming dtype 'O8'
    blob = bytes([0x0B, 2]) + b"O8" + bytes([1, 1, 8]) + b"\x00" * 8
    with pytest.raises(CodecError):
        decode(blob)


def test_unencodable_type_rejected():
    with pytest.raises(CodecError):
        encode(object())


def test_load_rejects_tampered_payload(tmp_path):
    """End-to-end: flipping payload bytes must raise IndexFormatError."""
    import struct
    import zlib

    from infidex_tpu.core.documents import Document
    from infidex_tpu.engine import SearchEngine
    from infidex_tpu.index.persistence import IndexFormatError, load_engine, save_engine

    eng = SearchEngine.create_default()
    eng.index_documents(
        [Document(i, t) for i, t in enumerate(["alpha", "beta", "gamma"])])
    path = tmp_path / "idx.bin"
    save_engine(eng, str(path))

    raw = bytearray(path.read_bytes())
    # Corrupt one payload byte and re-stamp the CRC so the checksum passes:
    # the codec itself must reject structurally-invalid bytes.
    header = len(b"IFDXTPU2") + 8 + 8
    raw[header] ^= 0xFF
    blob = bytes(raw[header:])
    crc = zlib.crc32(blob) & 0xFFFFFFFF
    raw[len(b"IFDXTPU2") + 4 : len(b"IFDXTPU8") + 8] = struct.pack("<I", crc)
    path.write_bytes(bytes(raw))
    with pytest.raises((IndexFormatError, KeyError, AssertionError)):
        load_engine(str(path))


def test_string_list_fast_path_roundtrip():
    """_T_STRLIST engages for homogeneous str lists >= 8 items; mixed or
    short lists take the generic path. Both must round-trip exactly."""
    from infidex_tpu.utils.safe_codec import decode, encode

    cases = [
        [],                                   # empty
        ["a"],                                # below threshold
        ["x"] * 7,                            # just below threshold
        ["x"] * 8,                            # exactly at threshold
        ["", "", "mixed-empty", ""] * 3,      # empties inside
        ["é", "Zelená škola", "\U0001F600" * 3, "\ud800plain"] * 4,  # unicode + surrogate
        ["word"] * 1000,                      # large
        ["a", 1, "b"] * 4,                    # heterogeneous -> generic
    ]
    for case in cases:
        assert decode(encode(case)) == case, case


def test_string_list_tamper_detection():
    from infidex_tpu.utils.safe_codec import CodecError, decode, encode

    import pytest

    blob = bytearray(encode(["hello"] * 16))
    # corrupt a length byte inside the lengths table
    blob[3] ^= 0xFF
    with pytest.raises(CodecError):
        decode(bytes(blob))
