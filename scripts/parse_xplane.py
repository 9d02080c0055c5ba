#!/usr/bin/env python
"""Aggregate op self-times from a JAX profiler xplane.pb (no TF deps).

The image's tensorboard_plugin_profile is incompatible with its TF build, so
this parses the XSpace protobuf wire format directly (field numbers from the
public tsl/profiler xplane.proto) and prints the top-K ops by total duration
per device plane.

Usage: python scripts/parse_xplane.py <trace_dir_or_xplane.pb> [top_k]
"""

import glob
import os
import sys
from collections import defaultdict


def _varint(buf, i):
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def fields(buf):
    """Yield (field_number, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _varint(buf, i)
        fno, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _varint(buf, i)
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:
            ln, i = _varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield fno, wt, v


def parse_event(buf):
    md, dur = 0, 0
    for fno, wt, v in fields(buf):
        if fno == 1:
            md = v
        elif fno == 3 and wt == 0:
            dur = v
    return md, dur


def parse_line(buf):
    name = ""
    events = []
    for fno, wt, v in fields(buf):
        if fno == 2:
            name = v.decode(errors="replace")
        elif fno == 11:
            name = v.decode(errors="replace") or name
        elif fno == 4:
            events.append(parse_event(v))
    return name, events


def parse_metadata_entry(buf):
    key = 0
    name = ""
    for fno, wt, v in fields(buf):
        if fno == 1:
            key = v
        elif fno == 2:  # XEventMetadata
            for f2, w2, v2 in fields(v):
                if f2 == 2:
                    name = v2.decode(errors="replace")
                elif f2 == 4 and not name:
                    name = v2.decode(errors="replace")
    return key, name


def parse_plane(buf):
    name = ""
    lines = []
    meta = {}
    for fno, wt, v in fields(buf):
        if fno == 2:
            name = v.decode(errors="replace")
        elif fno == 3:
            lines.append(parse_line(v))
        elif fno == 4:
            k, nm = parse_metadata_entry(v)
            meta[k] = nm
    return name, lines, meta


def summarize(path, top_k=30):
    buf = open(path, "rb").read()
    for fno, wt, v in fields(buf):
        if fno != 1:
            continue
        pname, lines, meta = parse_plane(v)
        if "TPU" not in pname and "GPU" not in pname and "device" not in pname.lower():
            continue
        agg = defaultdict(lambda: [0, 0])  # name -> [total_ps, count]
        line_total = defaultdict(int)
        for lname, events in lines:
            for md, dur in events:
                nm = meta.get(md, f"id{md}")
                agg[(lname, nm)][0] += dur
                agg[(lname, nm)][1] += 1
                line_total[lname] += dur
        print(f"\n=== plane: {pname} ===")
        for lname, tot in sorted(line_total.items(), key=lambda x: -x[1]):
            print(f"  line '{lname}': {tot/1e9:.3f} ms total")
        top = sorted(agg.items(), key=lambda x: -x[1][0])[:top_k]
        print(f"  top {top_k} ops:")
        for (lname, nm), (tot, cnt) in top:
            print(f"    {tot/1e9:9.3f} ms  x{cnt:<6d} [{lname}] {nm[:110]}")


def main():
    target = sys.argv[1]
    top_k = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    if os.path.isdir(target):
        pbs = glob.glob(os.path.join(target, "**", "*.xplane.pb"), recursive=True)
        if not pbs:
            sys.exit(f"no xplane.pb under {target}")
        target = max(pbs, key=os.path.getmtime)
        print(f"# {target}")
    summarize(target, top_k)


if __name__ == "__main__":
    main()
