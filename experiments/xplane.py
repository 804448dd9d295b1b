"""Minimal XPlane (jax.profiler) parser — per-kernel device timings.

The tunneled runtime records a real ``/device:TPU:0`` plane in
``*.xplane.pb``; tensorboard/tensorflow aren't installed here, so this
hand-rolls the protobuf wire format for the XSpace schema (field numbers
from tensorflow/core/profiler/protobuf/xplane.proto) and aggregates
event durations by name per line.

Usage:
    from experiments.xplane import latest_trace, device_summary
    with jax.profiler.trace("/tmp/trace"): step(); float(sync)
    for name, ms, n in device_summary(latest_trace("/tmp/trace")):
        print(f"{ms:9.3f} ms {n:4d}x  {name}")
"""

from __future__ import annotations

import glob
import os
from collections import defaultdict


def _varint(buf, i):
    x = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def _fields(buf):
    """Yield (field_number, wire_type, value) over one message."""
    i, n = 0, len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fn, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v, i = buf[i : i + 8], i + 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v, i = buf[i : i + ln], i + ln
        elif wt == 5:
            v, i = buf[i : i + 4], i + 4
        else:  # pragma: no cover - groups unused in xplane
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def _parse_event(buf):
    md, dur = 0, 0
    for fn, wt, v in _fields(buf):
        if fn == 1:
            md = v
        elif fn == 3 and wt == 0:
            dur = v
    return md, dur


def _parse_line(buf):
    name, events = "", []
    for fn, wt, v in _fields(buf):
        if fn == 2:
            name = v.decode("utf-8", "replace")
        elif fn == 11 and v:
            name = v.decode("utf-8", "replace")
        elif fn == 4:
            events.append(_parse_event(v))
    return name, events


def _parse_event_metadata(buf):
    eid, name = 0, ""
    for fn, wt, v in _fields(buf):
        if fn == 1:
            eid = v
        elif fn == 2:
            name = v.decode("utf-8", "replace")
    return eid, name


def _parse_plane(buf):
    name, lines, emeta = "", [], {}
    for fn, wt, v in _fields(buf):
        if fn == 2:
            name = v.decode("utf-8", "replace")
        elif fn == 3:
            lines.append(_parse_line(v))
        elif fn == 4:
            # map<int64, XEventMetadata>: entry {1: key, 2: value}
            k, md = 0, b""
            for f2, w2, v2 in _fields(v):
                if f2 == 1:
                    k = v2
                elif f2 == 2:
                    md = v2
            eid, ename = _parse_event_metadata(md)
            emeta[k or eid] = ename
    return name, lines, emeta


def parse_xspace(path):
    """-> list of (plane_name, [(line_name, [(md_id, dur_ps)])], {id: name})"""
    buf = open(path, "rb").read()
    return [_parse_plane(v) for fn, wt, v in _fields(buf) if fn == 1]


def latest_trace(logdir):
    paths = glob.glob(os.path.join(logdir, "plugins/profile/*/*.xplane.pb"))
    return max(paths, key=os.path.getmtime)


def device_summary(path, plane_substr="TPU", line_substr="XLA Ops"):
    """Aggregate device-plane event durations by kernel name.

    Returns [(name, total_ms, count)] sorted by total. Only lines whose
    name contains `line_substr` count — the serial 'XLA Ops' timeline by
    default ('Async XLA Ops' spans overlap each other and the compute,
    so summing them wildly overstates; pass line_substr='Async' to see
    them).
    """
    for name, lines, emeta in parse_xspace(path):
        if plane_substr not in name:
            continue
        agg = defaultdict(lambda: [0, 0])
        for lname, events in lines:
            # exact match first ('XLA Ops' is a substring of 'Async XLA
            # Ops'); substring only when nothing matches exactly
            if lname != line_substr and not (
                line_substr not in [l for l, _ in lines] and
                line_substr in lname
            ):
                continue
            for md, dur in events:
                a = agg[emeta.get(md, f"#{md}")]
                a[0] += dur
                a[1] += 1
        return sorted(
            ((k, v[0] / 1e9, v[1]) for k, v in agg.items()),
            key=lambda t: -t[1],
        )
    raise ValueError(f"no plane matching {plane_substr!r} in {path}")


def print_summary(path, plane_substr="TPU", top=40, line_substr="XLA Ops"):
    rows = device_summary(path, plane_substr, line_substr)
    total = sum(ms for _, ms, _ in rows)
    print(f"device total {total:9.3f} ms   ({path})")
    for name, ms, n in rows[:top]:
        print(f"{ms:9.3f} ms {n:5d}x  {name[:110]}")


if __name__ == "__main__":
    import sys

    arg = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace"
    path = arg if arg.endswith(".pb") else latest_trace(arg)
    print_summary(path)
