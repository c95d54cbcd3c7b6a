"""Minimal XPlane (JAX/TPU profiler trace) reader — no TF dependency.

Parses the protobuf wire format directly with the XSpace field numbers from
tensorflow/tsl's ``xplane.proto`` (stable for years).  Used by
``summarize_trace`` to print per-op time breakdowns from
``jax.profiler.start_trace`` captures — the framework's answer to "where did
the step time go" (SURVEY.md §5: the reference has no profiling story).
"""

from __future__ import annotations

import glob
import os
from collections import defaultdict
from typing import Dict, Iterator, List, Tuple

__all__ = ["parse_xspace", "summarize_trace"]


def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message buffer."""
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:
            v = buf[i:i + 4]
            i += 4
        elif wt == 1:
            v = buf[i:i + 8]
            i += 8
        else:
            raise ValueError(f"wire type {wt}")
        yield fn, wt, v


def parse_xspace(path: str) -> List[Dict]:
    """-> list of planes: {name, lines: [{name, events: [(metadata_id,
    duration_ps)]}], event_names: {id: name}}."""
    buf = open(path, "rb").read()
    planes = []
    for fn, wt, v in _fields(buf):
        if fn != 1 or wt != 2:
            continue
        plane = {"name": "", "lines": [], "event_names": {}}
        for pfn, pwt, pv in _fields(v):
            if pfn == 2 and pwt == 2:
                plane["name"] = pv.decode("utf-8", "replace")
            elif pfn == 3 and pwt == 2:  # XLine
                line = {"name": "", "events": []}
                for lfn, lwt, lv in _fields(pv):
                    if lfn == 2 and lwt == 2:
                        line["name"] = lv.decode("utf-8", "replace")
                    elif lfn == 4 and lwt == 2:  # XEvent
                        mid = dur = 0
                        for efn, ewt, ev in _fields(lv):
                            if efn == 1 and ewt == 0:
                                mid = ev
                            elif efn == 3 and ewt == 0:
                                dur = ev
                        line["events"].append((mid, dur))
                plane["lines"].append(line)
            elif pfn == 4 and pwt == 2:  # map<int64, XEventMetadata>
                key = None
                name = ""
                for mfn, mwt, mv in _fields(pv):
                    if mfn == 1 and mwt == 0:
                        key = mv
                    elif mfn == 2 and mwt == 2:  # XEventMetadata
                        for emfn, emwt, emv in _fields(mv):
                            if emfn == 1 and emwt == 0 and key is None:
                                key = emv
                            elif emfn == 2 and emwt == 2:
                                name = emv.decode("utf-8", "replace")
                if key is not None:
                    plane["event_names"][key] = name
        planes.append(plane)
    return planes


# Async-start/done ops report their full async window, which OVERLAPS the
# compute that hides them — summing them next to compute ops makes DMA look
# like 90% of the step.  Program/while wrapper events likewise contain all
# their children.  ``summarize_trace`` folds each class into one labeled row
# so the compute breakdown stays readable (pass collapse=False for raw rows).
_ASYNC_MARKERS = ("copy-start", "slice-start", "copy-done", "slice-done",
                  "all-gather-start", "all-reduce-start", "all-gather-done",
                  "all-reduce-done", "collective-permute-start",
                  "collective-permute-done", "async-star", "async-done",
                  "send-start", "recv-start", "send-done", "recv-done")


def _bucket(name: str) -> str | None:
    head = name.split(" = ", 1)[0]
    if name.startswith("jit_") or name.startswith("jit__"):
        return "[program wrapper (contains everything below)]"
    if head.startswith("%while") or head.startswith("while"):
        return "[while wrapper (contains its body ops)]"
    if any(m in head for m in _ASYNC_MARKERS):
        return "[async copies/collectives (overlapped with compute)]"
    return None


def summarize_trace(trace_dir: str, top: int = 25,
                    plane_filter: str = "TPU",
                    collapse: bool = True) -> List[Tuple[str, float]]:
    """Aggregate per-op-name time (ms) over the newest trace under
    ``trace_dir``; returns [(op_name, total_ms)] sorted desc.

    With ``collapse`` (default), async copy/collective windows and
    program/while wrapper events are folded into single labeled rows —
    their durations overlap (or contain) real compute, so mixing them
    into the per-op ranking misattributes the step time.
    """
    files = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb")))
    if not files:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    totals = defaultdict(float)
    for plane in parse_xspace(files[-1]):
        if plane_filter.lower() not in plane["name"].lower():
            continue
        names = plane["event_names"]
        for line in plane["lines"]:
            for mid, dur in line["events"]:
                name = names.get(mid, f"#{mid}")
                if collapse:
                    name = _bucket(name) or name
                totals[name] += dur / 1e9
    return sorted(totals.items(), key=lambda kv: -kv[1])[:top]


if __name__ == "__main__":
    import sys

    for name, ms in summarize_trace(sys.argv[1] if len(sys.argv) > 1
                                    else "/tmp/jaxtrace"):
        print(f"{ms:10.3f} ms  {name[:110]}")
