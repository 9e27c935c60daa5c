#!/usr/bin/env python
"""Plot training loss curves from scalars.jsonl (or legacy text logs).

Wraps ``TrainingLossPlotter`` (reference ``scripts/plot_training_losses.py``).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("source", type=Path,
                    help="scalars.jsonl, checkpoint dir, or text log")
    ap.add_argument("--output-dir", type=Path, default=None)
    args = ap.parse_args()

    from vit_colmap_tpu.utils.plot_training import TrainingLossPlotter

    out_dir = args.output_dir or (
        args.source if args.source.is_dir() else args.source.parent
    ) / "plots"
    plotter = TrainingLossPlotter(args.source)
    p1 = plotter.plot_total_loss(out_dir / "total_loss.png")
    p2 = plotter.plot_components(out_dir / "loss_components.png")
    for p in (p1, p2):
        if p:
            print(f"Wrote {p}")


if __name__ == "__main__":
    main()
