"""Minimal .xplane.pb reader: per-op device durations without tensorflow.

The jax.profiler trace works on this backend (round 4 used it to find the
scan-materialization bug) but the env has no tensorboard/tensorflow
profiler tooling, so round 4 fell back to counting op-name bytes — counts
without durations. This walks the protobuf wire format directly
(xplane.proto structure: XSpace.planes=1; XPlane id=1 name=2 lines=3
event_metadata=4; XLine events=7; XEvent metadata_id=1 offset=2
duration_ps=3; XEventMetadata id=1 name=2 display_name=3) and prints each
plane's top ops by total duration.

Usage: python tools/xplane_summary.py /tmp/specdec_trace_xx [top_n]
"""
import glob
import sys
from collections import defaultdict


def read_varint(buf, i):
    x = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << shift
        if not b & 0x80:
            return x, i
        shift += 7


def fields(buf):
    """Yield (field_no, wire_type, value) over one message's bytes."""
    i, n = 0, len(buf)
    while i < n:
        key, i = read_varint(buf, i)
        fno, wt = key >> 3, key & 7
        if wt == 0:
            v, i = read_varint(buf, i)
        elif wt == 1:
            v, i = buf[i:i + 8], i + 8
        elif wt == 2:
            ln, i = read_varint(buf, i)
            v, i = buf[i:i + ln], i + ln
        elif wt == 5:
            v, i = buf[i:i + 4], i + 4
        else:
            return  # group/unknown: bail on this message
        yield fno, wt, v


def parse_plane(pbuf):
    name = ""
    meta = {}           # metadata_id -> op name
    events = defaultdict(lambda: [0, 0])   # metadata_id -> [count, dur_ps]
    for fno, wt, v in fields(pbuf):
        if fno == 2 and wt == 2:
            try:
                name = v.decode("utf-8", "replace")
            except Exception:
                pass
        elif fno == 4 and wt == 2:
            # map entry { key=1: int64; value=2: XEventMetadata }
            mid, mname = None, None
            for f2, w2, v2 in fields(v):
                if f2 == 1 and w2 == 0:
                    mid = v2
                elif f2 == 2 and w2 == 2:
                    for f3, w3, v3 in fields(v2):
                        if f3 == 1 and w3 == 0 and mid is None:
                            mid = v3
                        elif f3 in (2, 3) and w3 == 2 and not mname:
                            mname = v3.decode("utf-8", "replace")
            if mid is not None and mname:
                meta[mid] = mname
        elif fno == 3 and wt == 2:                      # XLine
            # this backend's layout (probed): XLine{1:id, 2:name, 3:ts,
            # 4:repeated XEvent{1:metadata_id, 2:offset, 3:duration_ps,
            # 4:stats}}
            for f2, w2, v2 in fields(v):
                if f2 == 4 and w2 == 2:                 # XEvent
                    mid = dur = None
                    for f3, w3, v3 in fields(v2):
                        if f3 == 1 and w3 == 0:
                            mid = v3
                        elif f3 == 3 and w3 == 0:
                            dur = v3
                    if mid is not None and dur is not None:
                        e = events[mid]
                        e[0] += 1
                        e[1] += dur
    return name, meta, events


def summarize(path, top_n=30):
    pbs = sorted(glob.glob(f"{path}/**/*.xplane.pb", recursive=True))
    if not pbs:
        print(f"no .xplane.pb under {path}")
        return
    blob = open(pbs[-1], "rb").read()
    print(f"{pbs[-1]}: {len(blob)} bytes")
    for fno, wt, v in fields(blob):
        if fno != 1 or wt != 2:
            continue
        name, meta, events = parse_plane(v)
        if not events:
            continue
        total = sum(d for _, d in events.values())
        print(f"\n== plane {name!r}: {len(events)} op kinds, "
              f"total {total / 1e9:.3f} ms")
        rows = sorted(events.items(), key=lambda kv: -kv[1][1])[:top_n]
        for mid, (cnt, dur) in rows:
            nm = meta.get(mid, f"<meta {mid}>")
            print(f"  {dur / 1e9:9.3f} ms  x{cnt:<6d} {nm[:90]}")


if __name__ == "__main__":
    summarize(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
