"""Model checkpoint save/load (orbax).

The reference's durable state is the Postgres row (SURVEY.md §5.4); the TPU
rebuild adds model-weight checkpoints: orbax PyTree checkpoints per model
name under Settings.checkpoint_dir. The engine classes (engine/detector.py,
engine/recognizer.py, extract/layout_model.py) load from
Settings.{det,rec,extract}_checkpoint when set.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any

logger = logging.getLogger(__name__)


def save_checkpoint(path: str | Path, tree: Any) -> Path:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str | Path, example_tree: Any | None = None) -> Any:
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    if example_tree is not None:
        import jax

        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), example_tree
        )
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)


def init_or_load(model, rng, ckpt_path: str, *args, **kwargs) -> Any:
    """Build model variables without paying eager per-op device dispatch.

    Eager flax `model.init` runs op-by-op; over the remote-TPU tunnel
    (~45 ms/dispatch) that cost the engine ~150 s at startup. Instead:
      1. the variable TEMPLATE comes from jax.eval_shape (zero device work),
      2. if a checkpoint exists, orbax restores into that abstract template,
      3. otherwise a single jit-compiled init runs (one dispatch, and the
         executable lands in the persistent compile cache).
    """
    import jax

    def do_init(r):
        return model.init(r, *args, **kwargs)

    abstract = jax.eval_shape(do_init, rng)
    loaded = maybe_load(ckpt_path, abstract)
    if loaded is not None:
        return loaded
    return jax.jit(do_init)(rng)


def maybe_load(path: str, example_tree: Any | None = None) -> Any | None:
    """Load if the path is set and exists; None otherwise (engines fall back
    to random init, which keeps the framework usable without weights).

    Falls back to a template-free restore when the stored tree is a superset
    of the inference tree (e.g. DBNet checkpoints carry the train-only
    thresh head); flax ignores extra parameters at apply time.
    """
    if not path:
        # loud on purpose: an EMPTY checkpoint path silently served
        # random weights in three different eval sweeps (det inside
        # hybrid, then the layout extractor) and produced garbage
        # numbers that looked like quality regressions
        logger.warning("no checkpoint path set; using RANDOM init")
        return None
    p = Path(path)
    if not p.exists():
        logger.warning("checkpoint %s not found; using random init", path)
        return None
    try:
        return load_checkpoint(p, example_tree)
    except ValueError as e:
        logger.info("template restore failed (%s); raw restore", str(e)[:120])
        return load_checkpoint(p, None)
