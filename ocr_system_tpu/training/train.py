"""Sharded training loops for the framework's three models.

The reference has no training loop at all (inference-only against hosted
models — SURVEY.md §5.4); the TPU rebuild owns its weights, so training is a
first-class subsystem:

  - recognizer (SVTR+CTC) on synthetic text lines      — dp-sharded
  - detector (DBNet) on synthetic pages                — dp-sharded
  - layout extractor (BIO tagging)                     — dp x tp sharded
    (params split over `tp` via the logical rules in parallel/sharding.py)

All steps are jit-compiled with explicit NamedShardings: the batch enters
sharded over `dp`, gradients all-reduce over `dp` automatically (XLA inserts
the psum from the sharding annotations), TP weights keep their axis sharding
through the optimizer update. One mesh serves single-chip (1x1) through pod
slices without code changes.
"""

from __future__ import annotations

import dataclasses
import logging
import time

from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ocr_system_tpu.core.dtypes import DTypePolicy, default_policy
from ocr_system_tpu.models.charsets import Charset, get_charset
from ocr_system_tpu.ops import ctc
from ocr_system_tpu.parallel import sharding as shd
from ocr_system_tpu.training import synth

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainState:
    """Minimal train state (params + batch_stats + opt_state + step)."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: int = 0

    def tree_flatten(self):  # pragma: no cover - pytree protocol
        return (self.params, self.batch_stats, self.opt_state, self.step), None


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.batch_stats, s.opt_state, s.step), None),
    lambda _, c: TrainState(*c),
)


def make_optimizer(lr: float = 1e-3, weight_decay: float = 1e-4):
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(lr, weight_decay=weight_decay),
    )


def init_state(model, optimizer, rng, *example_args, **kw) -> TrainState:
    variables = model.init(rng, *example_args, **kw)
    variables = shd.unbox(variables)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
        step=0,
    )


# ---------------- recognizer ----------------


def make_rec_train_step(model, optimizer, mesh: Mesh):
    """Returns jitted (state, batch) -> (state, metrics). batch: dict with
    images (B, H, W, 3), widths (B,), labels (B, L), label_lengths (B,)."""

    def loss_fn(params, batch_stats, batch):
        # batches travel host->device as GRAY uint8 (B, H, W) — renders are
        # monochrome; broadcast to the model's 3 channels in-graph
        images = batch["images"].astype(jnp.float32) / 255.0
        if images.ndim == 3:
            images = jnp.repeat(images[..., None], 3, axis=-1)
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images,
            batch["widths"],
            train=True,
            mutable=["batch_stats"],
        )
        logits, lengths = out
        loss = ctc.ctc_loss(
            logits, lengths, batch["labels"], batch["label_lengths"]
        )
        return loss, mutated["batch_stats"]

    def step(state: TrainState, batch):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_bs, new_opt, state.step + 1),
            {"loss": loss},
        )

    repl = NamedSharding(mesh, P())
    batch_shard = NamedSharding(mesh, P("dp"))
    return jax.jit(
        step,
        in_shardings=(repl, batch_shard),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def rec_batch_iterator(
    charset: Charset,
    batch_size: int,
    width: int = 320,
    max_label_len: int = 48,
    seed: int = 0,
    pool_size: int = 2048,
    refresh_per_step: int = 16,
    font_range: tuple[int, int] = (12, 38),
) -> Iterator[dict]:
    """Line-pool iterator (same rationale as det_batch_iterator: rendering
    competes with the device for wall-clock; a refreshing pool keeps the
    accelerator fed)."""
    renderer = synth.TextRenderer(charset, seed=seed)
    rng = np.random.default_rng(seed)

    def render_one():
        for _ in range(8):
            sample = renderer.render_line(
                max_width=width, font_range=font_range
            )
            enc = charset.encode(sample.text)[:max_label_len] or [1]
            # CTC feasibility: the alignment needs one frame per label plus
            # one blank between each repeated pair; an infeasible line
            # (long dot-leader squeezed + det-margin shrink) makes
            # optax.ctc_loss blow up to ~100 and injects gradient noise
            # (observed as intermittent 30-125 loss spikes) — resample
            repeats = sum(a == b for a, b in zip(enc, enc[1:]))
            if len(enc) + repeats <= sample.width // 4:
                break
        labels = np.zeros((max_label_len,), np.int32)
        labels[: len(enc)] = enc
        return (
            (sample.image[..., 0] * 255).astype(np.uint8),  # gray wire
            np.int32(sample.width),
            labels,
            np.int32(len(enc)),
        )

    pool = [render_one() for _ in range(min(pool_size, 4 * batch_size))]
    while True:
        idxs = rng.integers(0, len(pool), batch_size)
        batch = [pool[i] for i in idxs]
        yield {
            "images": np.stack([b[0] for b in batch]),
            "widths": np.array([b[1] for b in batch], np.int32),
            "labels": np.stack([b[2] for b in batch]),
            "label_lengths": np.array([b[3] for b in batch], np.int32),
        }
        for _ in range(refresh_per_step):
            if len(pool) < pool_size:
                pool.append(render_one())
            else:
                pool[rng.integers(0, len(pool))] = render_one()


# ---------------- detector ----------------


def _unpack_bits(packed: jnp.ndarray, width: int) -> jnp.ndarray:
    """(…, W/8) uint8 -> (…, W) float32 in {0,1} (np.packbits big-endian
    order). Binary DB targets travel bit-packed: the tunnel is the det
    training bottleneck and 3 of the 4 target maps are {0,1}-valued."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & 1
    return bits.reshape(*packed.shape[:-1], packed.shape[-1] * 8)[
        ..., :width
    ].astype(jnp.float32)


def make_det_train_step(model, optimizer, mesh: Mesh):
    from ocr_system_tpu.models.dbnet import db_loss
    from ocr_system_tpu.ops.image_ops import normalize_for_model

    def loss_fn(params, batch_stats, batch):
        # wire format (the tunnel moves ~5 MB/s; every byte counts):
        #   images      4-bit packed gray  (B, S, S/2)  — det is a high-
        #               contrast segmentation task, 16 gray levels suffice
        #   thresh_map  stride-2 uint8     (B, S/2, S/2) — smooth by
        #               construction, bilinear-upsampled here
        #   other maps  bit-packed {0,1}   (B, S, S/8)
        # augmentation noise is generated ON DEVICE (host noise would make
        # the images incompressible in transport)
        packed = batch["images"]
        b, s = packed.shape[0], packed.shape[1]
        hi = (packed >> 4).astype(jnp.float32)
        lo = (packed & 15).astype(jnp.float32)
        f = jnp.stack([hi, lo], axis=-1).reshape(b, s, s) / 15.0
        key = jax.random.PRNGKey(batch["noise_seed"][0])
        kn, ks, kp, kq = jax.random.split(key, 4)
        # wire-sim: half the samples quantize to 4 gray levels, matching
        # what det_wire_bits=2 serving delivers after in-graph unpack —
        # the model must hold quality on the quarter-byte wire
        apply_q = jax.random.uniform(kq, (b, 1, 1)) < 0.5
        f = jnp.where(apply_q, jnp.round(f * 3.0) / 3.0, f)
        std = jax.random.uniform(ks, (b, 1, 1), maxval=0.04)
        apply_noise = (
            jax.random.uniform(kp, (b, 1, 1)) < 0.5
        ).astype(jnp.float32)
        noise = jax.random.normal(kn, f.shape) * std * apply_noise
        f = jnp.clip(f + noise, 0.0, 1.0)
        imgs = jax.vmap(normalize_for_model)(f)
        out, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            imgs,
            train=True,
            mutable=["batch_stats"],
        )
        thresh = jax.image.resize(
            batch["thresh_map"].astype(jnp.float32) / 255.0,
            (b, s, s),
            method="bilinear",
        )
        loss = db_loss(
            out,
            _unpack_bits(batch["shrink_bits"], s),
            _unpack_bits(batch["smask_bits"], s),
            thresh,
            _unpack_bits(batch["tmask_bits"], s),
        )
        return loss, mutated["batch_stats"]

    def step(state: TrainState, batch):
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_bs, new_opt, state.step + 1),
            {"loss": loss},
        )

    repl = NamedSharding(mesh, P())
    batch_shard = NamedSharding(mesh, P("dp"))
    return jax.jit(
        step,
        in_shardings=(repl, batch_shard),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def det_batch_iterator(
    batch_size: int,
    size: int = 640,
    seed: int = 0,
    charset: Charset | None = None,
    pool_size: int = 256,
    refresh_every: int = 8,
    forms_fraction: float = 0.5,
    deva_fraction: float = 0.0,
) -> Iterator[dict]:
    """Page-pool iterator: page rendering (PIL + numpy DB targets) costs
    ~1 s/page — far slower than a train step — so a pool of pre-rendered
    pages is sampled per batch and a background worker re-renders fresh
    pages continuously, keeping the device fed while the pool turns over.

    Data mix (the round-1 det model's weakness was layout diversity, not
    steps): half plain text pages (synth.render_page), half structured FORM
    pages (synth_forms.render_spec — two-column layouts, separated key/value
    boxes, ruled tables, titles/footers, varied font sizes). Images travel
    as single-channel uint8 (the renders are grayscale; 3x less tunnel
    traffic — normalize_for_model broadcasts on device)."""
    from ocr_system_tpu.training import synth_forms as SF

    cs = charset or get_charset("latin")
    rng = np.random.default_rng(seed)

    def make_sources(s: int):
        deva = None
        if deva_fraction > 0:
            # Devanagari pixel diversity: DBNet trained on Latin-only pages
            # emits rotated multi-row quads and misses whole rows on sparse
            # small Hindi text (measured: a page at 0.89 CER from det
            # recall, not recognition)
            deva = synth.TextRenderer(get_charset("devanagari"), seed=s + 7)
        return (
            synth.TextRenderer(cs, seed=s),
            SF.FormGenerator(seed=s),
            np.random.default_rng(s),
            deva,
        )

    def render_one(sources):
        renderer, gen, r, deva = sources
        # augment=False: noise is added ON DEVICE (make_det_train_step) so
        # the page stays compressible on the wire
        roll = r.random()
        if deva is not None and roll >= 1.0 - deva_fraction:
            page = deva.render_page(size=size, augment=False)
        elif roll >= forms_fraction:
            page = renderer.render_page(size=size, augment=False)
        else:
            page = SF.render_spec(gen.generate(size), augment=False)
        to_u8 = lambda a: np.clip(a * 255.0, 0, 255).astype(np.uint8)
        to_bits = lambda a: np.packbits(a > 0.5, axis=-1)
        g4 = to_u8(page.image[..., 0]) >> 4  # 16 gray levels
        img_packed = (g4[:, 0::2] << 4 | g4[:, 1::2]).astype(np.uint8)
        return (
            img_packed,  # 4-bit gray on the wire (see make_det_train_step)
            to_bits(page.shrink_map), to_bits(page.shrink_mask),
            to_u8(page.thresh_map)[::2, ::2],  # stride-2; smooth target
            to_bits(page.thresh_mask),
        )

    import threading

    main_sources = make_sources(seed)
    pool = [render_one(main_sources) for _ in range(min(pool_size, 64))]
    lock = threading.Lock()
    stop = threading.Event()

    def worker(wid: int):
        # continuously renders fresh pages, decoupled from the train loop —
        # pool turnover is then bounded by host CPU, not by steps (a slow
        # per-step refresh let a 2k-step run overfit a 256-page pool)
        sources = make_sources(seed + 104729 * (wid + 1))
        wrng = sources[2]
        while not stop.is_set():
            item = render_one(sources)
            with lock:
                if len(pool) < pool_size:
                    pool.append(item)
                else:
                    pool[wrng.integers(0, len(pool))] = item

    threads = [
        threading.Thread(target=worker, args=(i,), daemon=True)
        for i in range(2)
    ]
    for t in threads:
        t.start()
    try:
        while True:
            with lock:
                idxs = rng.integers(0, len(pool), batch_size)
                batch = [pool[i] for i in idxs]
            yield {
                "images": np.stack([b[0] for b in batch]),
                "shrink_bits": np.stack([b[1] for b in batch]),
                "smask_bits": np.stack([b[2] for b in batch]),
                "thresh_map": np.stack([b[3] for b in batch]),
                "tmask_bits": np.stack([b[4] for b in batch]),
                # per-batch augmentation seed (device-side noise)
                "noise_seed": rng.integers(0, 1 << 31, batch_size).astype(
                    np.int32
                ),
            }  # all uint8 (see render_one)
    finally:
        stop.set()


# ---------------- layout extractor (dp x tp) ----------------


def make_layout_train_step(model, optimizer, mesh: Mesh):
    """TP-sharded step: param shardings derive from the model's logical axis
    annotations; batch shards over dp. XLA lowers the cross-tp matmul
    reductions and cross-dp grad psums onto ICI."""
    from ocr_system_tpu.models.layout_extractor import extraction_loss

    def loss_fn(params, batch):
        out = model.apply(
            {"params": params},
            batch["ids"],
            batch["boxes"],
            batch["mask"],
            train=True,
            pos_offset=batch.get("pos_offset"),
        )
        loss = extraction_loss(
            out, batch["tags"], batch["types"], batch["form"], batch["mask"]
        )
        m = batch["mask"].astype(jnp.float32)
        tag_acc = jnp.sum(
            (jnp.argmax(out["tag_logits"], -1) == batch["tags"]) * m
        ) / jnp.maximum(jnp.sum(m), 1.0)
        return loss, tag_acc

    def step(state: TrainState, batch):
        (loss, tag_acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, state.batch_stats, new_opt, state.step + 1),
            {"loss": loss, "tag_acc": tag_acc},
        )

    return jax.jit(step, donate_argnums=(0,))


def init_layout_state_sharded(
    model, optimizer, mesh: Mesh, example_args, seed: int = 0
) -> TrainState:
    """Init the layout extractor with TP-sharded params.

    Params are placed by their logical-axis shardings (mlp/heads split over
    `tp`); the optimizer is then initialized ON the sharded params so adamw
    moments inherit the same shardings — jit propagates placement from
    inputs, no per-step annotations needed.
    """
    variables = model.init(jax.random.PRNGKey(seed), *example_args, train=False)
    sharded = shd.shard_params(variables, mesh)
    params = sharded["params"]
    opt_state = jax.jit(optimizer.init)(params)
    return TrainState(params=params, batch_stats={}, opt_state=opt_state, step=0)


def layout_batch_iterator(
    charset: Charset, batch_size: int, max_len: int = 512,
    page_size: int = 960, seed: int = 0, noise_rate: float = 0.03,
    pos_span: int = 2048, deva_fraction: float | None = None,
) -> Iterator[dict]:
    """Form-spec batches for the layout extractor: structured synthetic
    forms (training/synth_forms.py) tokenized directly — no pixel rendering,
    so fresh pages stream at ~200/s on the 1-core host and the model never
    sees the same form twice. OCR noise is injected tag-aligned; pos_offset
    slides each sample's position window so all pos_span serving positions
    train (see LayoutExtractor.__call__)."""
    import random as _random

    from ocr_system_tpu.training import synth_forms as SF

    gen = (
        SF.FormGenerator(seed=seed) if deva_fraction is None
        else SF.FormGenerator(seed=seed, deva_fraction=deva_fraction)
    )
    rng = _random.Random(seed + 1)
    max_off = max(pos_span - max_len, 0)
    while True:
        ids = np.zeros((batch_size, max_len), np.int32)
        boxes = np.zeros((batch_size, max_len, 4), np.int32)
        mask = np.zeros((batch_size, max_len), np.int32)
        tags = np.zeros((batch_size, max_len), np.int32)
        types = np.zeros((batch_size, max_len), np.int32)
        form = np.zeros((batch_size,), np.int32)
        pos_offset = np.zeros((batch_size,), np.int32)
        for i in range(batch_size):
            spec = gen.generate(page_size)
            noise = rng.uniform(0, noise_rate * 2)  # clean..2x mean
            (
                ids[i], boxes[i], mask[i], tags[i], types[i], form[i],
            ) = SF.spec_to_tokens(
                spec, charset, max_len, noise, rng, coord_jitter=True
            )
            pos_offset[i] = rng.randrange(max_off + 1)
        yield {
            "ids": ids, "boxes": boxes, "mask": mask,
            "tags": tags, "types": types, "form": form,
            "pos_offset": pos_offset,
        }


# ---------------- driver ----------------


def train_recognizer(
    steps: int = 200,
    batch_size: int = 64,
    width: int = 320,
    charset_name: str = "latin",
    lr: float = 1e-3,
    mesh: Mesh | None = None,
    policy: DTypePolicy | None = None,
    log_every: int = 50,
    seed: int = 0,
    state: TrainState | None = None,
    font_range: tuple[int, int] = (12, 38),
) -> tuple[TrainState, dict]:
    """Train the SVTR recognizer on synthetic lines. Returns (state, metrics)."""
    from ocr_system_tpu.models.recognizer import SVTRRecognizer

    charset = get_charset(charset_name)
    model = SVTRRecognizer(
        vocab_size=charset.size, policy=policy or default_policy()
    )
    mesh = mesh or shd_default_mesh()
    optimizer = make_optimizer(lr)
    if state is None:
        rng = jax.random.PRNGKey(seed)
        state = init_state(
            model, optimizer, rng,
            jnp.zeros((1, 48, width, 3)), jnp.array([width]), train=False,
        )
    step_fn = make_rec_train_step(model, optimizer, mesh)
    it = rec_batch_iterator(charset, batch_size, width=width, seed=seed,
                            font_range=font_range)
    losses = []  # device scalars (see train_detector note)
    t0 = time.time()
    for i in range(steps):
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        state, metrics = step_fn(state, batch)
        losses.append(metrics["loss"])
        if log_every and (i + 1) % log_every == 0:
            logger.info(
                "rec step %d loss %.4f (%.2f steps/s)",
                i + 1,
                float(np.mean([float(l) for l in losses[-log_every:]])),
                (i + 1) / (time.time() - t0),
            )
    return state, {
        "loss_first": float(losses[0]),
        "loss_last": float(np.mean([float(l) for l in losses[-10:]])),
    }


def train_detector(
    steps: int = 100,
    batch_size: int = 4,
    size: int = 640,
    lr: float = 1e-3,
    mesh: Mesh | None = None,
    policy: DTypePolicy | None = None,
    log_every: int = 20,
    seed: int = 0,
    state: TrainState | None = None,
    pool_size: int = 1024,
    save_every: int = 0,
    save_path: str | None = None,
    forms_fraction: float = 0.5,
    deva_fraction: float = 0.0,
) -> tuple[TrainState, dict]:
    from ocr_system_tpu.models.dbnet import DBNet

    model = DBNet(policy=policy or default_policy())
    mesh = mesh or shd_default_mesh()
    optimizer = make_optimizer(lr)
    if state is None:
        state = init_state(
            model, optimizer, jax.random.PRNGKey(seed),
            jnp.zeros((1, size, size, 3)), train=True,
        )
    step_fn = make_det_train_step(model, optimizer, mesh)
    it = det_batch_iterator(batch_size, size=size, seed=seed,
                            pool_size=pool_size,
                            forms_fraction=forms_fraction,
                            deva_fraction=deva_fraction)
    # losses stay DEVICE scalars between log points: a float() per step
    # would sync the host loop to the device queue, serializing batch upload
    # with step compute — over the tunnel that halves throughput
    losses: list = []
    t0 = time.time()
    for i in range(steps):
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        state, metrics = step_fn(state, batch)
        losses.append(metrics["loss"])
        if log_every and (i + 1) % log_every == 0:
            logger.info(
                "det step %d loss %.4f (%.2f steps/s)",
                i + 1,
                float(np.mean([float(l) for l in losses[-log_every:]])),
                (i + 1) / (time.time() - t0),
            )
        if save_every and save_path and (i + 1) % save_every == 0:
            from ocr_system_tpu.core.checkpoint import save_checkpoint

            save_checkpoint(
                save_path,
                {"params": state.params, "batch_stats": state.batch_stats},
            )
            logger.info("det checkpoint @ step %d -> %s", i + 1, save_path)
    return state, {
        "loss_first": float(losses[0]),
        "loss_last": float(np.mean([float(l) for l in losses[-5:]])),
    }


def train_layout(
    steps: int = 200,
    batch_size: int = 32,
    max_len: int = 768,
    page_size: int = 960,
    charset_name: str = "multilingual",
    noise_rate: float = 0.03,
    lr: float = 3e-4,
    mesh: Mesh | None = None,
    policy: DTypePolicy | None = None,
    log_every: int = 50,
    seed: int = 0,
    state: TrainState | None = None,
    dim: int = 256,
    depth: int = 6,
    deva_fraction: float | None = None,
) -> tuple[TrainState, dict]:
    """Train the layout extractor (the local Gemini replacement,
    gemini_service.py:235-364) on streamed synthetic form specs."""
    from ocr_system_tpu.models.layout_extractor import LayoutExtractor

    charset = get_charset(charset_name)
    model = LayoutExtractor(
        vocab_size=charset.size, dim=dim, depth=depth,
        policy=policy or default_policy(),
    )
    if mesh is None:
        from ocr_system_tpu.core.mesh import build_mesh

        mesh = build_mesh("dp=-1,tp=1")
    optimizer = make_optimizer(lr)
    if state is None:
        example_args = (
            jnp.zeros((1, 16), jnp.int32),
            jnp.zeros((1, 16, 4), jnp.int32),
            jnp.ones((1, 16), jnp.int32),
        )
        state = init_layout_state_sharded(
            model, optimizer, mesh, example_args, seed=seed
        )
    step_fn = make_layout_train_step(model, optimizer, mesh)
    it = layout_batch_iterator(
        charset, batch_size, max_len=max_len, page_size=page_size,
        seed=seed, noise_rate=noise_rate, pos_span=model.max_len,
        deva_fraction=deva_fraction,
    )
    losses, accs = [], []  # device scalars (see train_detector note)
    t0 = time.time()
    for i in range(steps):
        batch = {k: jnp.asarray(v) for k, v in next(it).items()}
        state, metrics = step_fn(state, batch)
        losses.append(metrics["loss"])
        accs.append(metrics["tag_acc"])
        if log_every and (i + 1) % log_every == 0:
            logger.info(
                "layout step %d loss %.4f tag_acc %.4f (%.2f steps/s)",
                i + 1,
                float(np.mean([float(v) for v in losses[-log_every:]])),
                float(np.mean([float(v) for v in accs[-log_every:]])),
                (i + 1) / (time.time() - t0),
            )
    return state, {
        "loss_first": float(losses[0]),
        "loss_last": float(np.mean([float(v) for v in losses[-10:]])),
        "tag_acc_last": float(np.mean([float(v) for v in accs[-10:]])),
    }


def shd_default_mesh() -> Mesh:
    from ocr_system_tpu.core.mesh import build_mesh

    return build_mesh("dp=-1")
