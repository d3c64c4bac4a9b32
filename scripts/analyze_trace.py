"""Summarize a jax.profiler trace into an op-level time breakdown.

VERDICT r2 weak item #8 deliverable: turn the sampler trace captured by
`scripts/tpu_sampler_sweep.py --trace` into a committed, human-readable
explanation of where the N=900 sampler's wall clock goes (MXU matmuls vs
HBM-bound elementwise/copy vs host gaps), so the measured MFU number has a
trace-backed breakdown next to it.

  python scripts/analyze_trace.py [--trace_dir runs/ab-trainstep/trace]
      [--out results/diagnostics/mfu_breakdown.md]

Parses the perfetto trace.json.gz the profiler writes (no tensorboard
dependency): aggregates complete events per track, keeps device (TPU/xla)
tracks, groups op durations by fusion-name family, and buckets them into
compute classes.
"""
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parent.parent))
import argparse
import collections
import glob
import gzip
import json
import os
import re


def load_trace_events(trace_dir: str):
    pats = [
        os.path.join(trace_dir, "**", "*.trace.json.gz"),
        os.path.join(trace_dir, "**", "*.trace.json"),
    ]
    files = sorted(f for p in pats for f in glob.glob(p, recursive=True))
    if not files:
        raise SystemExit(f"no trace.json[.gz] under {trace_dir}")
    f = files[-1]
    opener = gzip.open if f.endswith(".gz") else open
    with opener(f, "rt") as fh:
        data = json.load(fh)
    return f, data.get("traceEvents", data if isinstance(data, list) else [])


FAMILY = [
    # (bucket, regex on op/fusion name) — first match wins
    ("matmul/conv (MXU)", re.compile(r"dot|conv|einsum|gemm|matmul", re.I)),
    ("attention-custom", re.compile(r"pallas|flash|custom-call", re.I)),
    ("copy/layout", re.compile(r"copy|transpose|bitcast|reshape|concatenate|slice|pad|gather|scatter|dynamic-update", re.I)),
    ("reduce/softmax", re.compile(r"reduce|softmax|argm", re.I)),
    ("elementwise/fusion", re.compile(r"fusion|add|multiply|subtract|divide|exp|tanh|maximum|select|compare|convert|rsqrt", re.I)),
    ("infeed/outfeed", re.compile(r"infeed|outfeed|transfer|h2d|d2h", re.I)),
]


def bucket(name: str) -> str:
    for b, rx in FAMILY:
        if rx.search(name):
            return b
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace_dir", default="runs/ab-trainstep/trace")
    ap.add_argument("--out", default="results/diagnostics/mfu_breakdown.md")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    path, events = load_trace_events(args.trace_dir)
    # pid -> process name, to keep device-side tracks only
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e.get("args", {}).get("name", "")

    def is_device(pid):
        n = pnames.get(pid, "").lower()
        return ("tpu" in n or "xla" in n or "device" in n) and "python" not in n

    device_pids = {p for p in pnames if is_device(p)}

    per_op = collections.Counter()
    per_bucket = collections.Counter()
    t_lo, t_hi = None, None
    total_us = 0.0
    for e in events:
        # fall back to every complete event when no device track is labeled
        # (CPU-backend traces name tracks "/host:CPU")
        if e.get("ph") != "X" or (device_pids and e.get("pid") not in device_pids):
            continue
        dur = float(e.get("dur", 0.0))
        name = e.get("name", "?")
        per_op[name] += dur
        per_bucket[bucket(name)] += dur
        total_us += dur
        ts = float(e.get("ts", 0.0))
        t_lo = ts if t_lo is None else min(t_lo, ts)
        t_hi = ts + dur if t_hi is None else max(t_hi, ts + dur)

    span_us = (t_hi - t_lo) if t_lo is not None else 0.0
    lines = [
        "# N=900 sampler trace breakdown",
        "",
        f"Trace: `{path}`",
        f"Device-op busy time: {total_us/1e3:.2f} ms over a {span_us/1e3:.2f} ms span "
        f"(device busy fraction {total_us/span_us:.1%})" if span_us else "",
        "",
        "## Time by compute class",
        "",
        "| class | ms | % of busy |",
        "|---|---|---|",
    ]
    for b, us in per_bucket.most_common():
        lines.append(f"| {b} | {us/1e3:.2f} | {us/total_us:.1%} |")
    lines += ["", f"## Top {args.top} ops", "", "| op | ms | % |", "|---|---|---|"]
    for name, us in per_op.most_common(args.top):
        lines.append(f"| `{name[:80]}` | {us/1e3:.2f} | {us/total_us:.1%} |")
    out = "\n".join(lines) + "\n"
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(out)
    print(out)


if __name__ == "__main__":
    main()
