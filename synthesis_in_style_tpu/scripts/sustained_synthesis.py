"""Sustained-scale labelled-synthesis endurance run (VERDICT r3 #2).

Runs `cli.create_dataset_for_segmentation` for N images as a subprocess
and samples throughput (PNG pairs written), host RSS, and open file
handles every `--interval` seconds into a JSONL time series — the
evidence microbenches can't give: jit-cache growth, file-handle leaks,
writer backpressure, steady-state vs warmed-burst rate.

    python -m synthesis_in_style_tpu.scripts.sustained_synthesis \
        <checkpoint> <creation_config.json> -n 50000 [--monitor-out m.jsonl]

Extra args after `--` pass through to the CLI.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path


def count_outputs(image_dir: Path) -> int:
    if not image_dir.exists():
        return 0
    n = 0
    for sub in image_dir.iterdir():
        if sub.is_dir():
            for sub2 in sub.iterdir():
                if sub2.is_dir():
                    n += sum(1 for f in sub2.iterdir() if f.suffix == ".png")
            n += sum(1 for f in sub.iterdir() if f.suffix == ".png")
    return n


def proc_stats(pid: int):
    try:
        with open(f"/proc/{pid}/status") as f:
            rss_kb = 0
            for line in f:
                if line.startswith("VmRSS"):
                    rss_kb = int(line.split()[1])
                    break
        n_fds = len(os.listdir(f"/proc/{pid}/fd"))
        return rss_kb / 1024.0, n_fds
    except OSError:
        return None, None


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("checkpoint")
    parser.add_argument("config")
    parser.add_argument("-n", "--num-images", type=int, default=50000)
    parser.add_argument("--interval", type=float, default=30.0)
    parser.add_argument("--monitor-out", default="sustained_monitor.jsonl")
    parser.add_argument("cli_args", nargs="*", default=[])
    args = parser.parse_args(argv)

    ckpt = Path(args.checkpoint)
    image_dir = ckpt.parent.parent / "generated_images"
    # PNGs from previous runs must not inflate pairs_written or the first
    # throughput window: count them up front and report deltas.
    baseline = count_outputs(image_dir)
    if baseline:
        print(
            f"warning: {image_dir} already holds {baseline} pairs from a "
            "previous run; reporting deltas against that baseline",
            flush=True,
        )
    cmd = [
        sys.executable, "-m",
        "synthesis_in_style_tpu.cli.create_dataset_for_segmentation",
        str(ckpt), args.config, "-n", str(args.num_images),
        *args.cli_args,
    ]
    print("launching:", " ".join(cmd), flush=True)
    proc = subprocess.Popen(cmd)
    t0 = time.time()
    last_n, last_t = 0, t0
    out = open(args.monitor_out, "a")
    try:
        while proc.poll() is None:
            time.sleep(args.interval)
            now = time.time()
            n = count_outputs(image_dir) - baseline
            rss_mb, n_fds = proc_stats(proc.pid)
            rate = (n - last_n) / max(1e-9, now - last_t)
            row = {
                "t": round(now - t0, 1),
                "pairs_written": n,
                "window_pairs_per_s": round(rate, 3),
                "rss_mb": rss_mb,
                "fds": n_fds,
            }
            out.write(json.dumps(row) + "\n")
            out.flush()
            print(row, flush=True)
            last_n, last_t = n, now
    finally:
        out.close()
    dt = time.time() - t0
    n = count_outputs(image_dir) - baseline
    print(
        f"CLI exit {proc.returncode}; {n} pairs in {dt:.1f}s "
        f"= {n / dt:.2f} pairs/s overall", flush=True,
    )
    return proc.returncode or 0


if __name__ == "__main__":
    raise SystemExit(main())
