"""Summarize a training-record JSONL into the reference-log-style table.

The reference's only regression record is its committed training log,
whose value is the per-phase transition lines
(log_x3d_kinetics_multigrid.txt:15,82,158,234,742: LR / frames / batch /
crop / BN-splits at each long-cycle change) plus the loss trajectory.
This prints the same table from a `MetricLogger` JSONL (the `multigrid`
events) and a compact loss trajectory (mean loss per bucket segment), so
a reviewer can diff transitions against the reference's.

Usage: python tools/summarize_train_record.py runs/.../synthetic_log.jsonl
"""

import argparse
import json
import sys


def load_events(path):
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def summarize(events, out=sys.stdout):
    trans = [e for e in events if e.get("event") == "multigrid"]
    train = [e for e in events if e.get("event") == "train"]
    times = [e for e in events if e.get("event") == "bucket_times"]

    w = out.write
    w("| iter | long_ind | frames | crop | batch | bn_splits | LR |\n")
    w("|---|---|---|---|---|---|---|\n")
    for t in trans:
        # the first train event at/after this transition gives the iter
        it = next((e.get("iteration", e.get("step")) for e in train
                   if e.get("ts", 0) >= t.get("ts", 0)), "?")
        w(f"| {it} | {t['long_ind']} | {t['frames']} | {t['crop']} "
          f"| {t['batch']} | {t['bn_splits']} | {t['lr']:.4g} |\n")

    # loss trajectory: mean per contiguous same-bucket segment
    w("\n| steps | bucket | bn_splits | mean loss | last LR |\n")
    w("|---|---|---|---|---|\n")
    seg = []
    for e in train:
        if seg and e.get("bucket") != seg[-1].get("bucket"):
            _emit_segment(seg, w)
            seg = []
        seg.append(e)
    if seg:
        _emit_segment(seg, w)

    if times:
        t = {k: v for k, v in times[-1].items() if k not in ("event", "ts")}
        w("\n# mean s/step per bucket: "
          + json.dumps(t, sort_keys=True) + "\n")


def _emit_segment(seg, w):
    losses = [e["loss"] for e in seg if "loss" in e]
    first = seg[0].get("step", "?")
    last = seg[-1].get("step", "?")
    mean = sum(losses) / max(len(losses), 1)
    w(f"| {first}-{last} | {seg[0].get('bucket')} "
      f"| {seg[0].get('bn_splits', '?')} | {mean:.4f} "
      f"| {seg[-1].get('lr', float('nan')):.4g} |\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("jsonl")
    args = ap.parse_args()
    summarize(load_events(args.jsonl))


if __name__ == "__main__":
    main()
