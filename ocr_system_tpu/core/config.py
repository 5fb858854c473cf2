"""Environment-driven configuration.

Covers the reference settings surface (reference: backend/config.py:22-195 —
~35 flags for server, DB, storage, OCR engine, preprocessing toggles,
confidence thresholds, export) and adds the TPU-native knobs (mesh shape,
dtype policy, shape buckets, batch sizes) that replace the reference's cloud
credentials (Azure/Gemini keys are gone — all compute is local).

Implemented on plain pydantic (pydantic-settings is not vendored): values are
read from the process environment and an optional ``.env`` file at the repo
root, case-insensitively, with unknown keys ignored — the same contract as the
reference's ``SettingsConfigDict(env_file=".env", case_sensitive=False,
extra="ignore")``.
"""

from __future__ import annotations

import functools
import os
from pathlib import Path
from typing import Any

from pydantic import BaseModel


def _parse_env_file(path: Path) -> dict[str, str]:
    """Parse a minimal KEY=VALUE .env file (comments + blank lines ignored)."""
    out: dict[str, str] = {}
    if not path.is_file():
        return out
    for line in path.read_text().splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        key, _, val = line.partition("=")
        val = val.strip().strip("'\"")
        out[key.strip().upper()] = val
    return out


class Settings(BaseModel):
    """All framework settings. Every field can be set via environment variable
    of the same (upper-cased) name."""

    # --- server (reference: backend/config.py:36-45) ---
    app_name: str = "OCR System TPU"
    app_version: str = "0.1.0"
    debug: bool = False
    host: str = "0.0.0.0"
    port: int = 8000
    log_level: str = "INFO"

    # --- database (reference uses Postgres; we default to sqlite) ---
    database_path: str = "storage/ocr_system.db"

    # --- storage (reference: backend/config.py:126-148) ---
    storage_root: str = "storage"
    upload_dir: str = "uploads"
    export_dir: str = "exports"
    processed_dir: str = "processed"
    max_upload_size_mb: int = 20
    allowed_extensions: tuple[str, ...] = ("png", "jpg", "jpeg", "pdf", "tiff", "tif")

    # --- OCR engine selection (reference: config.py:70 OCR_INFERENCE_METHOD) ---
    # "hybrid" = neural DBNet ∪ classical CV detection + neural recognition —
    # the measured-best default (round-3 matrix: forms CER 0.202/recall 0.810
    # vs jax 0.214/0.795, plain identical); "jax" = pure neural det+rec;
    # "classical" = no-weights CV det; "fake" = deterministic test engine
    # (the seam the reference demonstrates with 3 engine files).
    ocr_engine: str = "hybrid"
    fake_ocr_text: str = "Name: John Smith"  # what the fake engine "reads"

    # --- preprocessing toggles (reference: config.py:84-87, 69) ---
    enable_deskew: bool = True
    enable_contrast_enhancement: bool = True
    enable_adaptive_binarization: bool = False
    # geometric checkbox detection -> selection_mark layout boxes (Azure
    # parity: ocr_service.py:314-321)
    enable_selection_marks: bool = True
    # pixel-driven signature/handwriting region detection -> handwriting
    # layout boxes + signature fields (BASELINE config 4)
    enable_handwriting_detection: bool = True
    max_image_dimension: int = 2000
    pdf_raster_dpi: int = 300
    jpeg_quality: int = 92

    # --- confidence thresholds (reference: config.py:90-91) ---
    confidence_threshold_high: float = 0.85
    confidence_threshold_medium: float = 0.60

    # --- extraction (replaces Gemini config, reference: config.py:52-62) ---
    # "auto": layout_model when checkpoints/extract exists, else rules
    extraction_method: str = "auto"  # "auto" | "rules" | "layout_model"
    extraction_max_retries: int = 3
    extraction_timeout_s: float = 600.0  # whole-document budget
    # (reference: 120 s/image, 600 s/PDF timeouts, ocr_service.py:670,684)
    extraction_temperature: float = 0.1

    # --- rate limits (reference: main.py:174-179, rate_limit.py:244-253) ---
    # comma-separated peer IPs whose X-Forwarded-For header is trusted
    # (empty: rate limits key on the socket peer — the server binds 0.0.0.0
    # directly, so the header is client-controlled by default)
    trusted_proxies: str = ""
    rate_limit_per_minute: int = 60
    rate_limit_per_hour: int = 1000
    ocr_rate_limit_per_minute: int = 20
    llm_rate_limit_per_minute: int = 30

    # --- TPU-native knobs (no reference analog; see SURVEY.md §2.4) ---
    mesh_shape: str = "dp=-1"  # e.g. "dp=4,tp=2"; -1 = fill remaining devices
    use_pallas_kernels: bool = True  # planar fused preprocessing on TPU
    # page wire format for detection upload: 8 = gray uint8, 4 = two
    # 16-level pixels per byte (half the upload bytes), 2 = four 4-level
    # pixels per byte (quarter; costs a few forms-CER points). 4 is the
    # default: measured quality-equivalent (Latin forms 0.134 vs 0.141,
    # Hindi 5.1% vs 7.4% — the wire-sim-trained models prefer it) and the
    # page upload is the serving throughput ceiling on remote links.
    det_wire_bits: int = 4
    # prob-map DOWNLOAD format: 8 = stride-2 uint8, 4 = two 16-level pixels
    # per byte (halves the per-wave fetch, the largest remaining det wire
    # cost after the 4-bit upload). Box scores quantize to 1/16 — measured
    # e2e-equivalent (gate: e2e sweep row unchanged). 1 = bitpacked
    # device-binarized mask (geometry at FULL map fidelity — the bin
    # threshold is static config) + stride-4 4-bit pooled score map for the
    # component score gate: 3.2x fewer fetch bytes than 4-bit.
    # 0 = ON-DEVICE box statistics (ops/device_boxes): connected components
    # + per-component stats (incl. principal-axis oriented extents for
    # rotated text) computed in the det forward; only a (K, 13) stats
    # tensor (~17 KB/page) is fetched and the map stays device-resident
    # for the component-overflow fallback. Thinnest wire, full-precision
    # scores, and det_wall immune to tunnel-weather map-fetch spikes.
    # DEFAULT since round 5: quality-gated at parity on the canonical
    # 3x50 sweep (forms_e2e exact mean 0.800 == committed; e2e forms CER
    # 0.0593 vs 0.0584; hindi 0.0753/0.9381 vs 0.0762/0.9373) with
    # det_wall 0.43 -> 0.36 s/wave healthy and no 400 ms fetch spikes on
    # degraded links.
    det_prob_wire_bits: int = 0
    # stats rows per page in det_prob_wire_bits=0 mode. Real pages carry
    # <300 components (bench glyph pages measured 234 incl. speckle);
    # overflow falls back to the exact host path over that page's map.
    # 320 rows = 17 KB/page on the wire.
    det_stats_k: int = 320
    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    det_image_buckets: tuple[int, ...] = (640, 960, 1280)
    det_bin_thresh: float = 0.3  # DB binarization threshold
    det_box_thresh: float = 0.5  # min mean prob to keep a box
    det_unclip_ratio: float = 2.6  # thin text lines need >paper's 1.5-2.0
    # box margin after DB unclip, as a fraction of box height. The stride-2
    # prob map quantizes 1-2 px per edge off small-text boxes (clipping
    # first/last glyphs + descenders); 0.65 measured best on the form/plain
    # e2e grid (forms CER 0.28 -> 0.13 vs 0.2): generous margins cost the
    # recognizer nothing (padding is masked) while clipped glyphs are
    # unrecoverable.
    det_box_pad_ratio: float = 0.65  # horizontal margin
    det_box_pad_ratio_y: float | None = None  # vertical margin (None: same)
    # snap DB box extents to the page's ink before padding — measured WORSE
    # than generous blind padding (walks into neighbors at small gaps);
    # kept as an option for sparse-layout documents
    det_ink_snap: bool = False
    # EXPAND-ONLY ink walk (union of DB box and the contiguous ink band it
    # overlaps): fixes the under-sized DB response on large bold titles
    # without the tightening hazard above
    det_ink_expand: bool = True
    # split det boxes that merged ACROSS form columns at interior empty
    # runs >= 1.4x ink height (engine/script.py split_column_merged) — a
    # bridged two-column row squeezes two fields into one crop and the
    # extractor mis-pairs everything downstream. Dot-leader rows never
    # split (the dots keep columns occupied). OFF by default until the
    # e2e sweep proves it (round-3: measure before shipping box-geometry
    # changes — the h//3 blanket pad regressed).
    det_split_column_gaps: bool = False
    # lexicon-guided re-segmentation of column-merged det boxes
    # (engine/glue_split.py): when a decoded box reads as
    # '<value><known form label>:', split it at the ink gap where the
    # label starts and re-recognize both halves. Text-anchored (unlike
    # det_split_column_gaps' pixel-gap rule, which never fired on real
    # det output) — the round-4 forms_e2e loss family it targets is det
    # row-merges gluing a value to the NEXT column's label.
    det_glue_split: bool = True
    # scheduler det worker threads (engine/scheduler.py pipelining).
    # A/B-measured round 5 (6 interleaved 32-page runs each): workers=1
    # 11.81 p/s vs workers=2 11.87 — statistically identical on the 1-core
    # host (PREFETCH=2 already pipelines wave N+1's det through a single
    # worker while rec runs wave N). Default 1: same throughput, no
    # cross-thread det contention. Raise on multi-core hosts.
    det_workers: int = 1
    # shrink each axis-aligned rec quad's y-extent to its dominant ink
    # row band (+0.15x band height margin) before cropping (engine/
    # script.py tighten_y; ink-derived, tighten-only, guarded against
    # two-row boxes). Motivated by rec-only leader CER 0.95% tight vs
    # 33% at det-pad geometry — but MEASURED WORSE end-to-end (CPU
    # sweep: forms 8.4->13.9, plain 7.3->12.0): the serving recognizer
    # is de-facto calibrated to det-padded crops. Keep OFF; revisit
    # only after a rec training cycle at tight serving geometry.
    rec_tighten_y: bool = False
    # margin for Devanagari re-segmented boxes (engine/script.py). These
    # boxes are INK-TIGHT (unlike DB's stride-2-quantized boxes, which
    # need det_box_pad_ratio=0.65 to recover clipped glyphs), so a small
    # safety margin renders glyphs at full crop height: measured CER 0.050
    # at 0.12 vs 0.163 at 0.65 on synthetic Hindi pages.
    deva_reseg_pad_ratio: float = 0.12
    rec_image_height: int = 48
    # "auto": detect each page's script (shirorekha heuristic, engine/
    # script.py) and route to the matching recognizer checkpoint — one
    # server serves Latin AND Hindi pages on the same endpoint (Azure
    # parity: ocr_service.py:213-246). Falls back to latin when no
    # devanagari checkpoint is configured.
    rec_charset: str = "auto"  # auto | latin | devanagari | multilingual
    # Hindi forms are script-mixed at the BOX level (Devanagari keys,
    # ASCII values: amounts, dates, phones, emails, 'signed'); the
    # devanagari charset cannot represent ASCII letters, so under
    # rec_charset=auto each crop on a Devanagari page routes individually
    # (shirorekha test, engine/script.py crop_script): headline -> deva
    # recognizer, else -> Latin recognizer.
    deva_percrop_routing: bool = True
    # on script-MIXED pages, crops whose routed decode lands below this
    # confidence are re-decoded by the page's other recognizer and the
    # higher-confidence read wins (engine/pipeline._confidence_rescue).
    # The headline router sees geometry, not glyphs: digits-only rows on
    # Hindi pages are drawn in the Devanagari font face the Latin model
    # never trained on. 0 disables. Calibration (CPU, deva eval pages):
    # native-font reads land at conf ~1.00, cross-font misreads at
    # 0.87-0.91 — 0.95 separates them cleanly.
    script_rescue_conf: float = 0.95
    # 1280 exists for over-wide form rows (dotted leaders squeeze 3.5x into
    # 640; CTC at stride 4 runs out of frames for 80-dot runs — the wide
    # bucket halves the squeeze and the w640 fine-tune covers the regime).
    # Few, coarse buckets on purpose: crops are device-resident (zero wire
    # cost — padding is masked HBM compute at ~nothing), while every extra
    # (bucket, count) pair is a separate executable that costs ~12 s to
    # ship to the remote TPU on first touch. 80/160 buckets measured
    # quality-neutral vs padding into 320 and cost two executables per
    # count bucket.
    rec_width_buckets: tuple[int, ...] = (320, 640, 1280)
    # minimum padded crops-per-page (same executable-count rationale):
    # counts pad to {floor, 2*floor, ...} instead of every power of two
    rec_pad_floor: int = 16
    # precompile serving shapes in a background thread at API startup
    # (first-touch remote compiles cost 30-60 s each over the TPU tunnel)
    warmup_on_start: bool = True
    rec_batch_size: int = 64
    det_batch_size: int = 8
    max_boxes_per_page: int = 1024
    max_text_len: int = 64

    # --- model checkpoints ---
    checkpoint_dir: str = "checkpoints"
    det_checkpoint: str = ""  # empty -> deterministic random init
    rec_checkpoint: str = ""
    # devanagari recognizer for rec_charset=auto script routing; empty ->
    # checkpoints/rec_devanagari when that directory exists
    rec_checkpoint_devanagari: str = ""
    extract_checkpoint: str = ""
    # layout-extractor architecture — MUST match the checkpoint being
    # loaded (orbax restore fails loudly on a shape mismatch, by design).
    # Defaults match the committed checkpoints/extract (the r4 2x model:
    # beats the 256x6 on every slice — held-out 0.8458->0.8832, deva
    # 0.757->0.830, forms_e2e exact 0.661->0.704 — resolving the r3
    # capacity ceiling that forced deva content out of training)
    extract_dim: int = 512
    extract_depth: int = 8

    # ---- computed path properties (reference: config.py:111-148 auto-create) ----
    @property
    def storage_path(self) -> Path:
        p = Path(self.storage_root)
        p.mkdir(parents=True, exist_ok=True)
        return p

    @property
    def upload_path(self) -> Path:
        p = self.storage_path / self.upload_dir
        p.mkdir(parents=True, exist_ok=True)
        return p

    @property
    def export_path(self) -> Path:
        p = self.storage_path / self.export_dir
        p.mkdir(parents=True, exist_ok=True)
        return p

    @property
    def processed_path(self) -> Path:
        p = self.storage_path / self.processed_dir
        p.mkdir(parents=True, exist_ok=True)
        return p

    @property
    def db_path(self) -> Path:
        p = Path(self.database_path)
        p.parent.mkdir(parents=True, exist_ok=True)
        return p

    @property
    def max_upload_size_bytes(self) -> int:
        return self.max_upload_size_mb * 1024 * 1024

    def parsed_mesh_shape(self) -> dict[str, int]:
        """Parse "dp=4,tp=2" into {"dp": 4, "tp": 2}. A single -1 axis is
        filled with the remaining device count at mesh build time."""
        out: dict[str, int] = {}
        for part in self.mesh_shape.split(","):
            part = part.strip()
            if not part:
                continue
            name, _, size = part.partition("=")
            out[name.strip()] = int(size)
        return out

    @classmethod
    def from_env(cls, env_file: str | os.PathLike[str] | None = ".env") -> "Settings":
        raw: dict[str, Any] = {}
        file_vals = _parse_env_file(Path(env_file)) if env_file else {}
        env_vals = {k.upper(): v for k, v in os.environ.items()}
        merged = {**file_vals, **env_vals}
        for name, field in cls.model_fields.items():
            key = name.upper()
            if key not in merged:
                continue
            sval = merged[key]
            ann = field.annotation
            if ann is bool:
                raw[name] = sval.strip().lower() in ("1", "true", "yes", "on")
            elif ann is not None and "tuple" in str(ann):
                items = [s.strip() for s in sval.split(",") if s.strip()]
                if items and items[0].isdigit():
                    raw[name] = tuple(int(s) for s in items)
                else:
                    raw[name] = tuple(items)
            else:
                raw[name] = sval
        return cls(**raw)


@functools.lru_cache(maxsize=1)
def get_settings() -> Settings:
    """Cached settings singleton (reference: config.py:181-195)."""
    return Settings.from_env()


def reset_settings_cache() -> None:
    """Test helper: clear the cached singleton so env changes take effect."""
    get_settings.cache_clear()
