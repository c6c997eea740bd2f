"""Tests for the native C++ TFRecord reader (ctypes)."""
import numpy as np
import pytest

from hypervla_tpu.data.tfrecord import encode_example, parse_example, write_tfrecord
from hypervla_tpu.data.tfrecord_native import (
    native_available,
    read_tfrecord_native,
)


def test_native_reader_roundtrip(tmp_path):
    examples = [
        encode_example(
            {
                "steps/action": np.arange(4, dtype=np.float32) * i,
                "meta": [f"record {i}".encode()],
            }
        )
        for i in range(5)
    ]
    path = str(tmp_path / "native.tfrecord")
    write_tfrecord(path, examples)

    records = list(read_tfrecord_native(path, validate_crc=True))
    assert len(records) == 5
    parsed = parse_example(records[3])
    np.testing.assert_allclose(
        parsed["steps/action"], np.arange(4, dtype=np.float32) * 3
    )
    assert parsed["meta"][0] == b"record 3"


def test_native_compiles_here():
    """On this image (g++ baked in) the native path must actually be used."""
    assert native_available()


def test_native_crc_matches_python(tmp_path):
    import ctypes

    from hypervla_tpu.data.tfrecord import _crc32c
    from hypervla_tpu.data.tfrecord_native import _load_library

    lib = _load_library()
    if lib is None:
        pytest.skip("no native lib")
    data = b"hello tfrecord world"
    assert lib.hv_crc32c(data, len(data)) == _crc32c(data)


def test_native_detects_corruption(tmp_path):
    examples = [encode_example({"x": np.ones(2, np.float32)})]
    path = str(tmp_path / "bad.tfrecord")
    write_tfrecord(path, examples)
    # corrupt one payload byte
    with open(path, "r+b") as f:
        f.seek(14)
        byte = f.read(1)
        f.seek(14)
        f.write(bytes([byte[0] ^ 0xFF]))
    if not native_available():
        pytest.skip("no native lib")
    with pytest.raises(IOError):
        list(read_tfrecord_native(path, validate_crc=True))
