#!/usr/bin/env python
"""Persist benchmark results as round-tagged artifacts under ``results/``.

VERDICT r2 item 8: benchmark numbers lived only in docs/PERFORMANCE.md
prose, so rounds could not be diffed mechanically.  This wrapper runs a
bench command, parses the LAST JSON line it prints, and writes
``results/<NAME>_r<ROUND>.json`` with the result plus provenance
(timestamp, argv, git head).  Re-running overwrites the same round's file;
history stays diffable across rounds via the filenames.

Usage:
  python scripts/record_bench.py --name RECON --round 3 -- \
      python scripts/bench_reconstruction.py --images 50
  some_bench | python scripts/record_bench.py --name BENCH_MATCH --round 3
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def last_json_line(text: str) -> dict:
    for line in reversed(text.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
    raise SystemExit("no JSON line found in bench output")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", required=True, help="artifact stem, e.g. RECON")
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--results-dir", type=Path, default=ROOT / "results")
    ap.add_argument("cmd", nargs="*", help="bench command (after --)")
    args = ap.parse_args()

    if args.cmd:
        proc = subprocess.run(
            args.cmd, capture_output=True, text=True, cwd=ROOT
        )
        sys.stderr.write(proc.stderr)
        sys.stdout.write(proc.stdout)
        if proc.returncode != 0:
            raise SystemExit(f"bench command failed ({proc.returncode})")
        result = last_json_line(proc.stdout)
        argv = args.cmd
    else:
        result = last_json_line(sys.stdin.read())
        argv = None

    try:
        head = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=ROOT,
        ).stdout.strip()
    except OSError:
        head = None

    entry = {
        "round": args.round,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "git_head": head,
        "argv": argv,
        "result": result,
    }
    args.results_dir.mkdir(parents=True, exist_ok=True)
    out = args.results_dir / f"{args.name}_r{args.round}.json"
    out.write_text(json.dumps(entry, indent=2) + "\n")
    print(f"recorded -> {out}")


if __name__ == "__main__":
    main()
