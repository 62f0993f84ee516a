"""Minimal xplane.pb parser -> per-op time breakdown (no tensorboard).

The xprof trace captured by jax.profiler stores an XSpace protobuf; the
tensorboard_plugin_profile converters in this image are ABI-mismatched
with the installed TF, so this parses the wire format directly (the
XSpace/XPlane/XLine/XEvent field numbers are stable public schema:
tensorflow/core/profiler/protobuf/xplane.proto) and aggregates event
durations per HLO op name on the device planes.

Usage: python tools/xplane_summary.py bench_logs/xprof_train [--top 30]
"""

import argparse
import collections
import glob
import re
import sys


def _varint(buf, i):
    r = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        r |= (b & 0x7F) << s
        if not b & 0x80:
            return r, i
        s += 7


def _fields(buf):
    """Yield (field_number, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
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
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def parse_xspace(path):
    buf = open(path, "rb").read()
    planes = []
    for fn, wt, v in _fields(buf):
        if fn == 1 and wt == 2:
            planes.append(parse_plane(v))
    return planes


def parse_plane(buf):
    plane = {"name": "", "lines": [], "event_meta": {}, "stat_meta": {}}
    for fn, wt, v in _fields(buf):
        if fn == 2 and wt == 2:
            plane["name"] = v.decode(errors="replace")
        elif fn == 3 and wt == 2:
            plane["lines"].append(parse_line(v))
        elif fn == 4 and wt == 2:  # map<int64, XEventMetadata>
            k, meta = parse_meta_entry(v)
            plane["event_meta"][k] = meta
        elif fn == 5 and wt == 2:  # map<int64, XStatMetadata>
            k, name = parse_stat_meta_entry(v)
            plane["stat_meta"][k] = name
    return plane


def parse_stat_meta_entry(buf):
    key, name = 0, ""
    for fn, wt, v in _fields(buf):
        if fn == 1 and wt == 0:
            key = v
        elif fn == 2 and wt == 2:
            for f2, w2, v2 in _fields(v):
                if f2 == 2 and w2 == 2:
                    name = v2.decode(errors="replace")
    return key, name


def parse_meta_entry(buf):
    key, meta = 0, {"name": "", "display": "", "stats": []}
    for fn, wt, v in _fields(buf):
        if fn == 1 and wt == 0:
            key = v
        elif fn == 2 and wt == 2:
            for f2, w2, v2 in _fields(v):
                if f2 == 2 and w2 == 2:
                    meta["name"] = v2.decode(errors="replace")
                elif f2 == 4 and w2 == 2:
                    meta["display"] = v2.decode(errors="replace")
                elif f2 == 5 and w2 == 2:
                    meta["stats"].append(parse_stat(v2))
    return key, meta


def parse_line(buf):
    line = {"name": "", "events": []}
    for fn, wt, v in _fields(buf):
        if fn == 2 and wt == 2:
            line["name"] = v.decode(errors="replace")
        elif fn == 11 and wt == 2:
            line["display"] = v.decode(errors="replace")
        elif fn == 4 and wt == 2:
            line["events"].append(parse_event(v))
    return line


def parse_event(buf):
    ev = {"meta": 0, "dur_ps": 0, "n": 1, "stats": []}
    for fn, wt, v in _fields(buf):
        if fn == 1 and wt == 0:
            ev["meta"] = v
        elif fn == 3 and wt == 0:
            ev["dur_ps"] = v
        elif fn == 5 and wt == 0:
            ev["n"] = v
        elif fn == 4 and wt == 2:
            ev["stats"].append(parse_stat(v))
    return ev


def parse_stat(buf):
    st = {"meta": 0, "value": None}
    for fn, wt, v in _fields(buf):
        if fn == 1 and wt == 0:
            st["meta"] = v
        elif fn == 5 and wt == 2:  # str_value
            st["value"] = v.decode(errors="replace")
        elif fn in (3, 4, 7) and wt == 0:  # uint64/int64/ref
            st["value"] = v
        elif fn == 2 and wt == 1:  # double
            import struct

            st["value"] = struct.unpack("<d", v)[0]
    return st


WRAPPERS = re.compile(r"^(while|conditional|jit_|jit\(|call\.)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--line", default="XLA Ops",
                    help="xplane line holding leaf device ops")
    args = ap.parse_args()

    files = sorted(
        glob.glob(f"{args.logdir}/plugins/profile/*/*.xplane.pb")
        + glob.glob(f"{args.logdir}/*.xplane.pb")
    )
    if not files:
        print(f"no xplane.pb under {args.logdir}", file=sys.stderr)
        sys.exit(1)
    per_op = collections.Counter()
    per_op_n = collections.Counter()
    op_info: dict = {}
    wrappers_ps = 0
    for f in files:
        for plane in parse_xspace(f):
            if not plane["name"].startswith("/device:TPU"):
                continue
            sm = plane["stat_meta"]
            # resolve metadata stats into named fields per event metadata
            info = {}
            for k, m in plane["event_meta"].items():
                d = {"display": m["display"] or m["name"]}
                for st in m["stats"]:
                    nm = sm.get(st["meta"], "")
                    if nm in ("hlo_category", "flops", "bytes_accessed",
                              "source", "hlo_op"):
                        d[nm] = st["value"]
                info[k] = d
            for line in plane["lines"]:
                if line["name"] != args.line:
                    continue
                for ev in line["events"]:
                    d = info.get(ev["meta"], {})
                    name = d.get("display", str(ev["meta"]))
                    if WRAPPERS.match(name):
                        wrappers_ps += ev["dur_ps"]
                        continue  # children appear individually on the line
                    per_op[name] += ev["dur_ps"]
                    per_op_n[name] += max(ev["n"], 1)
                    op_info[name] = d
    if not per_op:
        print("no leaf ops found", file=sys.stderr)
        sys.exit(1)
    total = sum(per_op.values())
    print(f"leaf device op time: {total / 1e9:.2f} ms over the trace "
          f"(wrapper spans excluded)")

    def agg(keyfn):
        t = collections.Counter()
        fl = collections.Counter()
        by = collections.Counter()
        for name, ps in per_op.items():
            k = keyfn(op_info.get(name, {}))
            t[k] += ps
            fl[k] += op_info.get(name, {}).get("flops", 0) or 0
            by[k] += op_info.get(name, {}).get("bytes_accessed", 0) or 0
        return t, fl, by

    t, fl, by = agg(lambda d: d.get("hlo_category", "?"))
    print("\n-- by hlo_category (flops/bytes are per-call metadata) --")
    for cat, ps in t.most_common():
        sec = ps / 1e12
        print(f"  {str(cat):28s} {ps / 1e9:9.2f} ms  "
              f"{100 * ps / total:5.1f}%")
    t, _, _ = agg(
        lambda d: (str(d.get("source", "?")).split(";")[-1])[-48:]
    )
    print("\n-- by source line --")
    for src, ps in t.most_common(15):
        print(f"  {100 * ps / total:5.1f}%  {ps / 1e9:9.2f} ms  {src}")
    print(f"\n-- top {args.top} ops --")
    for name, ps in per_op.most_common(args.top):
        d = op_info.get(name, {})
        print(f"  {100 * ps / total:5.1f}%  {ps / 1e9:9.2f} ms  "
              f"x{per_op_n[name]:<5d} {name[:40]:40s} "
              f"[{str(d.get('hlo_category', ''))[:24]}] "
              f"{str(d.get('source', ''))[-40:]}")


if __name__ == "__main__":
    main()
