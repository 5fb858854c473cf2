#!/usr/bin/env python
"""Train the framework's models on synthetic data and save checkpoints.

Usage:
  python scripts/train_models.py rec   --steps 2000 --batch 64
  python scripts/train_models.py det   --steps 500  --batch 4
  python scripts/train_models.py all   [--quick]

Checkpoints land in checkpoints/{rec,det}_{charset} and are picked up by the
engine when Settings.{rec,det}_checkpoint points at them (core/checkpoint.py).
"""

from __future__ import annotations

import argparse
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

logging.basicConfig(level="INFO", format="%(asctime)s %(message)s")
logger = logging.getLogger("train")


def train_rec(args) -> None:
    import jax

    from ocr_system_tpu.core.checkpoint import save_checkpoint
    from ocr_system_tpu.training import train as T

    state, metrics = T.train_recognizer(
        steps=args.steps,
        batch_size=args.batch,
        width=args.rec_width,
        charset_name=args.charset,
        lr=args.lr,
        seed=args.seed,
    )
    logger.info("rec metrics: %s", metrics)
    out = Path(args.out or f"checkpoints/rec_{args.charset}")
    save_checkpoint(out, {"params": state.params, "batch_stats": state.batch_stats})
    logger.info("saved %s", out)


def train_det(args) -> None:
    from ocr_system_tpu.core.checkpoint import save_checkpoint
    from ocr_system_tpu.training import train as T

    state, metrics = T.train_detector(
        steps=args.steps,
        batch_size=args.batch,
        size=args.det_size,
        lr=args.lr,
        seed=args.seed,
    )
    logger.info("det metrics: %s", metrics)
    out = Path(args.out or "checkpoints/det")
    save_checkpoint(out, {"params": state.params, "batch_stats": state.batch_stats})
    logger.info("saved %s", out)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("target", choices=["rec", "det", "all"])
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--charset", default="latin")
    p.add_argument("--rec-width", type=int, default=320)
    p.add_argument("--det-size", type=int, default=640)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None)
    p.add_argument("--quick", action="store_true", help="tiny smoke run")
    args = p.parse_args()

    if args.target in ("rec", "all"):
        a = argparse.Namespace(**vars(args))
        a.steps = args.steps or (30 if args.quick else 2000)
        a.batch = args.batch or (8 if args.quick else 64)
        train_rec(a)
    if args.target in ("det", "all"):
        a = argparse.Namespace(**vars(args))
        a.steps = args.steps or (10 if args.quick else 600)
        a.batch = args.batch or (2 if args.quick else 8)
        a.out = None
        train_det(a)


if __name__ == "__main__":
    main()
