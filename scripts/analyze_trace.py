#!/usr/bin/env python
"""Aggregate a jax.profiler trace into a per-fusion device-time table.

Companion to `scripts/profiler.py` (which captures the trace): parses the
Chrome-trace JSON the TPU profiler writes, keeps device-lane leaf ops
(dropping the `while.*` scan containers that double-count their children),
and prints per-op totals with share-of-device-time — the table that drove
the round-3 kernel work (docs/BENCHMARKS.md: level-1 attention at 14% of
MXU peak, FF proj_out at 19-27%).

The reference has no profiling story at all (SURVEY §5); this replaces
eyeballing TensorBoard with a reproducible text report:

  python scripts/profiler.py --mode vanilla --iters 2
  python scripts/analyze_trace.py                      # newest trace
  python scripts/analyze_trace.py --per-step 50 --batch 8
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def find_trace_files(trace_dir):
    pats = [
        os.path.join(trace_dir, "**", "*.trace.json.gz"),
        os.path.join(trace_dir, "**", "*.trace.json"),
    ]
    files = []
    for p in pats:
        files.extend(glob.glob(p, recursive=True))
    return sorted(files, key=os.path.getmtime)


def load_events(path):
    op = gzip.open if path.endswith(".gz") else open
    with op(path, "rt") as f:
        return json.load(f).get("traceEvents", [])


def device_leaf_durations(events):
    """Sum wall duration per op name on TPU device lanes.

    The profiler emits one complete-event ('ph' == 'X') per executed op.
    Container rows (the `while` scan body, `jit_run` spans) cover their
    children's time, so any event whose name starts a known container
    prefix is dropped rather than double-counted.
    """
    # map pid -> process name to keep only device lanes
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e.get("pid")] = e.get("args", {}).get("name", "")
    device_pids = {
        pid for pid, name in pid_name.items()
        if "TPU" in name or "/device:" in name or "XLA" in name.upper()
    }

    totals = collections.Counter()
    counts = collections.Counter()
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        name = e.get("name", "")
        if not name or name.startswith(("while", "jit_", "run ", "Steps")):
            continue
        dur = e.get("dur", 0)  # microseconds
        totals[name] += dur
        counts[name] += 1
    return totals, counts


def strip_suffix(name):
    """Aggregate numeric-suffix clones into one row — except anonymous
    `fusion.N` names, where N distinguishes UNRELATED computations (an
    attention epilogue and a conv bias-add both become "fusion"): those
    stay separate; use --hlo to attribute them to source ops."""
    stripped = re.sub(r"[.\d]+$", "", name)
    return name if stripped == "fusion" else stripped


def load_hlo_meta(path):
    """fusion/op name -> (result type, op_name metadata) from an
    optimized-HLO text dump (`jit(fn).lower(...).compile().as_text()` —
    XLA_FLAGS dump flags break the axon TPU plugin, so the compiled-text
    route is the only one that works over the tunnel)."""
    pat = re.compile(r"%(\S+) = (.+?) fusion\(.*?op_name=\"([^\"]*)\"")
    meta = {}
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                meta[m.group(1)] = (m.group(2).split("{")[0], m.group(3))
    return meta


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-dir", default="/tmp/dsta_trace")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--raw", action="store_true",
                    help="don't merge numeric-suffix clones")
    ap.add_argument("--per-step", type=int, default=0,
                    help="sampler steps represented in the trace; also "
                         "prints per-step ms (divide by iters*steps)")
    ap.add_argument("--iters", type=int, default=2,
                    help="traced iterations (for --per-step normalization)")
    ap.add_argument("--json", action="store_true", help="machine-readable")
    ap.add_argument("--hlo", default=None,
                    help="optimized-HLO text dump of the SAME program "
                         "(compiled.as_text()); joins each trace fusion "
                         "to its source op_name + result shape — the view "
                         "that identified the level-0 attention mega-fusion "
                         "and the FF proj_out rows (docs/BENCHMARKS.md)")
    args = ap.parse_args()

    files = find_trace_files(args.trace_dir)
    if not files:
        sys.exit(f"no trace files under {args.trace_dir} — run "
                 f"scripts/profiler.py first")
    events = load_events(files[-1])
    totals, counts = device_leaf_durations(events)
    if not totals:
        sys.exit("no device events found in the trace")

    if args.hlo:
        meta = load_hlo_meta(args.hlo)
        joined_t, joined_c = collections.Counter(), collections.Counter()
        for name, dur in totals.items():
            if name in meta:
                shape, opn = meta[name]
                opn = re.sub(r"^jit\([^)]*\)/", "", opn)
                key = f"{opn}  {shape}"
            else:
                key = name if args.raw else strip_suffix(name)
            joined_t[key] += dur
            joined_c[key] += counts[name]
        totals, counts = joined_t, joined_c
    elif not args.raw:
        merged_t, merged_c = collections.Counter(), collections.Counter()
        for name, dur in totals.items():
            merged_t[strip_suffix(name)] += dur
            merged_c[strip_suffix(name)] += counts[name]
        totals, counts = merged_t, merged_c

    grand = sum(totals.values())
    rows = totals.most_common(args.top)
    if args.json:
        print(json.dumps([
            {"op": n, "total_ms": t / 1e3, "count": counts[n],
             "share": t / grand} for n, t in rows]))
        return
    print(f"# trace: {files[-1]}")
    print(f"# total device time: {grand / 1e3:.1f} ms")
    w = 100 if args.hlo else 48
    hdr = f"{'op':<{w}} {'total ms':>9} {'count':>6} {'share':>6}"
    if args.per_step:
        hdr += f" {'ms/step':>8}"
    print(hdr)
    for name, dur in rows:
        line = (f"{name[:w]:<{w}} {dur / 1e3:>9.2f} {counts[name]:>6} "
                f"{100 * dur / grand:>5.1f}%")
        if args.per_step:
            line += f" {dur / 1e3 / (args.per_step * args.iters):>8.3f}"
        print(line)


if __name__ == "__main__":
    main()
