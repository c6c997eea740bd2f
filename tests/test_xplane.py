"""xplane trace reader test: encode a synthetic XSpace with the raw protobuf
wire format and check the aggregation."""
import struct

import pytest

from hypervla_tpu.utils.xplane import module_time_ms, summarize


def _varint(v):
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(fno, wt, payload):
    key = _varint((fno << 3) | wt)
    if wt == 0:
        return key + _varint(payload)
    return key + _varint(len(payload)) + payload


def _event(metadata_id, duration_ps):
    return _field(1, 0, metadata_id) + _field(3, 0, duration_ps)


def _line(name, events):
    msg = _field(2, 2, name.encode())
    for e in events:
        msg += _field(4, 2, e)
    return msg


def _metadata_entry(mid, name):
    meta = _field(1, 0, mid) + _field(2, 2, name.encode())
    return _field(1, 0, mid) + _field(2, 2, meta)


def _plane(name, lines, metadata):
    msg = _field(2, 2, name.encode())
    for mid, mname in metadata.items():
        msg += _field(4, 2, _metadata_entry(mid, mname))
    for ln in lines:
        msg += _field(3, 2, ln)
    return msg


def test_summarize_synthetic_trace(tmp_path):
    ops_line = _line(
        "XLA Ops",
        [
            _event(1, 2_000_000),  # 0.002 ms
            _event(1, 3_000_000),
            _event(2, 10_000_000),  # 0.01 ms
        ],
    )
    mod_line = _line("XLA Modules", [_event(3, 500_000_000)])  # 0.5 ms
    plane = _plane(
        "/device:TPU:0",
        [ops_line, mod_line],
        {1: "%fusion.1 = add", 2: "%dot.5 = dot", 3: "jit_step(123)"},
    )
    host_plane = _plane("/host:CPU", [_line("host", [_event(9, 1)])], {9: "x"})
    space = _field(1, 2, plane) + _field(1, 2, host_plane)
    path = tmp_path / "t.xplane.pb"
    path.write_bytes(space)

    out = summarize(str(path))
    assert list(out.keys()) == ["/device:TPU:0"]
    ops = dict((n, (ms, c)) for n, ms, c in out["/device:TPU:0"]["XLA Ops"])
    assert ops["%dot.5 = dot"] == (0.01, 1)
    assert ops["%fusion.1 = add"] == (pytest.approx(0.005), 2)
    # sorted by total time descending
    assert out["/device:TPU:0"]["XLA Ops"][0][0] == "%dot.5 = dot"

    mods = module_time_ms(str(path))
    assert mods["jit_step"] == (pytest.approx(0.5), 1)
