"""TensorBoard-free XPlane trace reader.

`jax.profiler.start_trace` writes an XSpace protobuf
(`plugins/profile/<run>/*.xplane.pb`); the usual reader is the TensorBoard
profile plugin, which needs TensorFlow. This module parses the raw protobuf
wire format directly — no TF, no tensorboard — and aggregates per-op device
times, which is all the optimization loop needs on a TPU host.

Wire schema actually observed from jax/tsl (field numbers differ from some
published .protos — verified against captured traces):

    XSpace:  planes = 1 (repeated XPlane)
    XPlane:  id=1, name=2, lines=3 (repeated XLine),
             event_metadata=4 (map<int64, XEventMetadata>),
             stat_metadata=5
    XLine:   id=1, name/display_id=2, events=4 (repeated XEvent)
    XEvent:  metadata_id=1, offset_ps=2, duration_ps=3, stats=4
    XEventMetadata (map value, field 2): id=1, name=2

Use `summarize(path)` for a {plane: {line: [(op, total_ms, count), ...]}}
dict, or run `python -m hypervla_tpu.utils.xplane <trace.xplane.pb>`.
"""
from collections import defaultdict
from typing import Dict, List, Tuple


def _read_varint(buf: bytes, i: int):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        val |= (b & 0x7F) << shift
        i += 1
        if not b & 0x80:
            return val, i
        shift += 7


def _fields(buf: bytes):
    """Yields (field_no, wire_type, value) over one message's wire bytes."""
    i, n = 0, len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
            yield fno, wt, v
        elif wt == 1:
            yield fno, wt, buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            yield fno, wt, buf[i:i + ln]
            i += ln
        elif wt == 5:
            yield fno, wt, buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt} at offset {i}")


def _parse_event(buf: bytes):
    metadata_id, duration_ps = None, 0
    for fno, wt, v in _fields(buf):
        if fno == 1 and wt == 0:
            metadata_id = v
        elif fno == 3 and wt == 0:
            duration_ps = v
    return metadata_id, duration_ps


def _parse_line(buf: bytes):
    name = ""
    events = []
    for fno, wt, v in _fields(buf):
        if fno == 2 and wt == 2:
            try:
                name = v.decode()
            except UnicodeDecodeError:
                pass
        elif fno == 4 and wt == 2:
            events.append(_parse_event(v))
    return name, events


def _parse_plane(buf: bytes):
    name = ""
    lines = []
    metadata = {}
    for fno, wt, v in _fields(buf):
        if fno == 2 and wt == 2:
            name = v.decode()
        elif fno == 3 and wt == 2:
            lines.append(_parse_line(v))
        elif fno == 4 and wt == 2:
            key, meta = None, None
            for f2, w2, v2 in _fields(v):
                if f2 == 1 and w2 == 0:
                    key = v2
                elif f2 == 2 and w2 == 2:
                    meta = v2
            if meta is not None:
                mid, mname = key, ""
                for f3, w3, v3 in _fields(meta):
                    if f3 == 1 and w3 == 0:
                        mid = v3
                    elif f3 == 2 and w3 == 2:
                        try:
                            mname = v3.decode()
                        except UnicodeDecodeError:
                            mname = repr(v3)
                metadata[mid] = mname
    return name, lines, metadata


def summarize(
    path: str, device_only: bool = True
) -> Dict[str, Dict[str, List[Tuple[str, float, int]]]]:
    """Aggregates an .xplane.pb into per-plane, per-line op timings.

    Returns {plane_name: {line_name: [(op_name, total_ms, count), ...]}},
    ops sorted by descending total time. duration_ps -> ms.
    """
    buf = open(path, "rb").read()
    out = {}
    for fno, wt, v in _fields(buf):
        if fno != 1 or wt != 2:
            continue
        pname, lines, metadata = _parse_plane(v)
        if device_only and "/device:" not in pname:
            continue
        plane_out = {}
        for lname, events in lines:
            if not events:
                continue
            agg = defaultdict(lambda: [0, 0])
            for mid, dur in events:
                name = metadata.get(mid, f"<{mid}>")
                agg[name][0] += dur
                agg[name][1] += 1
            plane_out[lname] = sorted(
                ((n, d / 1e9, c) for n, (d, c) in agg.items()),
                key=lambda t: -t[1],
            )
        if plane_out:
            out[pname] = plane_out
    return out


def module_time_ms(path: str) -> Dict[str, Tuple[float, int]]:
    """Total device time and execution count per XLA module (jit function)."""
    out = {}
    for plane in summarize(path).values():
        for op, ms, count in plane.get("XLA Modules", []):
            name = op.split("(")[0]
            prev = out.get(name, (0.0, 0))
            out[name] = (prev[0] + ms, prev[1] + count)
    return out


def main():
    import argparse
    import glob
    import os

    parser = argparse.ArgumentParser(
        description="Summarize a jax.profiler xplane trace (no TensorFlow)"
    )
    parser.add_argument("path", help=".xplane.pb file or trace directory")
    parser.add_argument("--top", type=int, default=25)
    args = parser.parse_args()
    path = args.path
    if os.path.isdir(path):
        candidates = sorted(
            glob.glob(os.path.join(path, "**", "*.xplane.pb"), recursive=True)
        )
        if not candidates:
            raise SystemExit(f"no .xplane.pb under {path}")
        path = candidates[-1]
        print(f"reading {path}")
    for pname, lines in summarize(path).items():
        print(f"=== {pname} ===")
        for lname, ops in lines.items():
            total = sum(ms for _, ms, _ in ops)
            print(f"--- {lname}: {total:.3f} ms total ---")
            for name, ms, count in ops[: args.top]:
                print(f"  {ms:9.3f} ms  x{count:5d}  {name[:100]}")


if __name__ == "__main__":
    main()
