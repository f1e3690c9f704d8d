"""Kernel-truth timing of small jitted pieces via jax.profiler xplane traces.

Wall-clock through the axon tunnel is unreliable below a few ms (per-call
sync ~35 ms, async dispatch pipelining, possible relay memoization), so this
module traces a jitted callable and reads the *device* plane's event
durations out of the xplane proto — the same numbers the TensorBoard
profiler shows. Full train-step traces explode on this 1-core host; only
trace small pieces.

Library use:
    from tools.trace_piece import device_time_ms
    ms = device_time_ms(fn, feeds)           # median per-call device ms
"""
from __future__ import annotations

import glob
import gzip
import os
import tempfile
from collections import defaultdict

import jax


def _load_xplanes(trace_dir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    paths = glob.glob(os.path.join(
        trace_dir, 'plugins', 'profile', '*', '*.xplane.pb'))
    spaces = []
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, 'rb') as f:
            xs.ParseFromString(f.read())
        spaces.append(xs)
    return spaces


def device_events(trace_dir):
    """All events on device (TPU/accelerator) planes: list of
    (plane, line, name, start_ps, dur_ps)."""
    out = []
    for xs in _load_xplanes(trace_dir):
        for plane in xs.planes:
            pname = plane.name
            if 'TPU' not in pname and 'GPU' not in pname \
                    and 'device' not in pname.lower():
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                for ev in line.events:
                    out.append((pname, line.name,
                                ev_meta.get(ev.metadata_id, '?'),
                                ev.offset_ps, ev.duration_ps))
    return out


def device_busy_ms(trace_dir, merge_lines=True):
    """Total device-busy time in ms: union of event intervals per device
    plane (concurrent events on different lines are not double-counted),
    summed over planes."""
    by_plane = defaultdict(list)
    for pname, line, name, start, dur in device_events(trace_dir):
        if 'step' in line.lower():      # step-markers duplicate op lines
            continue
        by_plane[pname].append((start, start + dur))
    total_ps = 0
    for iv in by_plane.values():
        iv.sort()
        cur_s, cur_e = None, None
        for s, e in iv:
            if cur_e is None or s > cur_e:
                if cur_e is not None:
                    total_ps += cur_e - cur_s
                cur_s, cur_e = s, e
            else:
                cur_e = max(cur_e, e)
        if cur_e is not None:
            total_ps += cur_e - cur_s
    return total_ps / 1e9


def op_table_ms(trace_dir, top=30):
    """Aggregate device event durations by op name -> ms, descending."""
    agg = defaultdict(float)
    for pname, line, name, start, dur in device_events(trace_dir):
        if 'step' in line.lower():
            continue
        agg[name] += dur / 1e9
    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    return rows[:top]


def device_time_ms(fn, feeds, trace_dir=None):
    """Run fn(*feed) once per feed under a trace (after one warmup on the
    last feed) and return total device-busy ms / len(feeds)-1."""
    if trace_dir is None:
        trace_dir = tempfile.mkdtemp(prefix='kgdet_trace_')
    jax.block_until_ready(fn(*feeds[-1]))
    with jax.profiler.trace(trace_dir):
        outs = [fn(*f) for f in feeds[:-1]]
        jax.block_until_ready(outs)
    return device_busy_ms(trace_dir) / (len(feeds) - 1)
