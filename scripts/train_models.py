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

from ocr_system_tpu.core.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def _resume_state(path: str, model, optimizer, example_init):
    """Load params/batch_stats from a checkpoint into a fresh TrainState."""
    from ocr_system_tpu.core.checkpoint import maybe_load
    from ocr_system_tpu.training.train import TrainState

    template = example_init()
    loaded = maybe_load(
        path, {"params": template.params, "batch_stats": template.batch_stats}
    )
    if loaded is None:
        return None
    return TrainState(
        params=loaded["params"],
        batch_stats=loaded["batch_stats"],
        opt_state=optimizer.init(loaded["params"]),
        step=0,
    )


def train_rec(args) -> None:
    import jax
    import jax.numpy as jnp

    from ocr_system_tpu.core.checkpoint import save_checkpoint
    from ocr_system_tpu.models.charsets import get_charset
    from ocr_system_tpu.models.recognizer import SVTRRecognizer
    from ocr_system_tpu.training import train as T

    state = None
    if args.resume:
        charset = get_charset(args.charset)
        model = SVTRRecognizer(vocab_size=charset.size)
        opt = T.make_optimizer(args.lr)
        state = _resume_state(
            args.resume, model, opt,
            lambda: T.init_state(
                model, opt, jax.random.PRNGKey(0),
                jnp.zeros((1, 48, args.rec_width, 3)),
                jnp.array([args.rec_width]), train=False,
            ),
        )
        if state is not None:
            logger.info("resumed from %s", args.resume)

    state, metrics = T.train_recognizer(
        steps=args.steps,
        batch_size=args.batch,
        width=args.rec_width,
        charset_name=args.charset,
        lr=args.lr,
        seed=args.seed,
        state=state,
        font_range=(args.font_min, args.font_max),
    )
    logger.info("rec metrics: %s", metrics)
    out = Path(args.out or f"checkpoints/rec_{args.charset}")
    save_checkpoint(out, {"params": state.params, "batch_stats": state.batch_stats})
    logger.info("saved %s", out)


def train_det(args) -> None:
    import jax
    import jax.numpy as jnp

    from ocr_system_tpu.core.checkpoint import save_checkpoint
    from ocr_system_tpu.models.dbnet import DBNet
    from ocr_system_tpu.training import train as T

    state = None
    if getattr(args, "resume", None):
        model = DBNet()
        opt = T.make_optimizer(args.lr)
        state = _resume_state(
            args.resume, model, opt,
            lambda: T.init_state(
                model, opt, jax.random.PRNGKey(0),
                jnp.zeros((1, args.det_size, args.det_size, 3)), train=True,
            ),
        )
        if state is not None:
            logger.info("resumed from %s", args.resume)

    state, metrics = T.train_detector(
        steps=args.steps,
        batch_size=args.batch,
        size=args.det_size,
        lr=args.lr,
        seed=args.seed,
        state=state,
        save_every=1000,  # crash-safe long runs over the tunnel
        save_path=str(Path(args.out or "checkpoints/det").absolute()),
        forms_fraction=args.forms_fraction,
        deva_fraction=getattr(args, "deva_fraction", 0.0),
    )
    logger.info("det metrics: %s", metrics)
    out = Path(args.out or "checkpoints/det")
    save_checkpoint(out, {"params": state.params, "batch_stats": state.batch_stats})
    logger.info("saved %s", out)


def train_layout(args) -> None:
    import jax
    import jax.numpy as jnp

    from ocr_system_tpu.core.checkpoint import maybe_load, save_checkpoint
    from ocr_system_tpu.models.charsets import get_charset
    from ocr_system_tpu.models.layout_extractor import LayoutExtractor
    from ocr_system_tpu.parallel.sharding import unbox
    from ocr_system_tpu.training import train as T

    state = None
    charset = get_charset(args.charset)
    if getattr(args, "resume", None):
        model = LayoutExtractor(vocab_size=charset.size)
        opt = T.make_optimizer(args.lr)
        example = (
            jnp.zeros((1, 16), jnp.int32),
            jnp.zeros((1, 16, 4), jnp.int32),
            jnp.ones((1, 16), jnp.int32),
        )
        abstract = unbox(
            jax.eval_shape(lambda r: model.init(r, *example, train=False),
                           jax.random.PRNGKey(0))
        )
        loaded = maybe_load(args.resume, abstract)
        if loaded is not None:
            state = T.TrainState(
                params=loaded["params"], batch_stats={},
                opt_state=opt.init(loaded["params"]), step=0,
            )
            logger.info("resumed from %s", args.resume)

    out = Path(args.out or "checkpoints/extract")
    if out.resolve() == Path("checkpoints/extract").resolve():
        from ocr_system_tpu.core.config import Settings

        s = Settings()
        if (args.dim, args.depth) != (s.extract_dim, s.extract_depth):
            raise SystemExit(
                f"refusing to overwrite {out} with a {args.dim}x{args.depth} "
                f"model: serving expects {s.extract_dim}x{s.extract_depth} "
                "(Settings.extract_dim/extract_depth). Pass --out to train "
                "an experimental architecture."
            )
    state, metrics = T.train_layout(
        steps=args.steps,
        batch_size=args.batch,
        charset_name=args.charset,
        noise_rate=args.noise,
        lr=args.lr,
        seed=args.seed,
        state=state,
        dim=getattr(args, "dim", 256),
        depth=getattr(args, "depth", 6),
        deva_fraction=getattr(args, "deva_fraction", None),
    )
    logger.info("layout metrics: %s", metrics)
    save_checkpoint(out, {"params": state.params})
    logger.info("saved %s", out)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("target", choices=["rec", "det", "layout", "all"])
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--noise", type=float, default=0.03,
                   help="mean OCR-noise rate for layout training")
    # default per target: rec/det -> latin, layout -> multilingual (must
    # match LayoutModelExtractor's serving charset or param shapes diverge)
    p.add_argument("--charset", default=None)
    p.add_argument("--rec-width", type=int, default=320)
    p.add_argument("--det-size", type=int, default=640)
    p.add_argument("--forms-fraction", type=float, default=0.5,
                   help="fraction of det training pages that are forms")
    # defaults track the SERVING architecture (Settings.extract_dim/depth)
    # so a default `train_models.py layout` run cannot clobber
    # checkpoints/extract with a shape serving can no longer load
    from ocr_system_tpu.core.config import Settings as _S

    _serving = _S()
    p.add_argument("--dim", type=int, default=_serving.extract_dim,
                   help="layout extractor width (serving default "
                        f"{_serving.extract_dim})")
    p.add_argument("--depth", type=int, default=_serving.extract_depth,
                   help="layout extractor depth (serving default "
                        f"{_serving.extract_depth})")
    p.add_argument("--deva-fraction", type=float, default=0.0,
                   help="fraction of det training pages in Devanagari "
                        "(pixel diversity: Latin-only det emits rotated "
                        "multi-row quads on sparse Hindi pages)")
    p.add_argument("--font-min", type=int, default=12,
                   help="rec training font-size range (px)")
    p.add_argument("--font-max", type=int, default=38)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None)
    p.add_argument("--resume", default=None, help="checkpoint to continue from")
    p.add_argument("--quick", action="store_true", help="tiny smoke run")
    args = p.parse_args()

    if args.target in ("rec", "all"):
        a = argparse.Namespace(**vars(args))
        a.steps = args.steps or (30 if args.quick else 2000)
        a.batch = args.batch or (8 if args.quick else 64)
        a.lr = args.lr or 1e-3
        a.charset = args.charset or "latin"
        train_rec(a)
    if args.target in ("det", "all"):
        a = argparse.Namespace(**vars(args))
        a.steps = args.steps or (10 if args.quick else 600)
        a.batch = args.batch or (2 if args.quick else 8)
        a.lr = args.lr or 1e-3
        a.charset = args.charset or "latin"
        if args.target == "all":
            a.out = None  # 'all' shares --out with rec; det gets default
        train_det(a)
    if args.target in ("layout", "all"):
        a = argparse.Namespace(**vars(args))
        a.steps = args.steps or (20 if args.quick else 4000)
        a.batch = args.batch or (4 if args.quick else 32)
        a.lr = args.lr or 3e-4
        a.charset = args.charset or "multilingual"
        a.out = args.out if args.target == "layout" else None
        train_layout(a)


if __name__ == "__main__":
    main()
