"""ocr_system_tpu — a TPU-native document OCR & structured-extraction framework.

A ground-up rebuild of the capabilities of GothiProCoder/OCR-System ("Lumina
OCR"): instead of shipping page images to Azure Document Intelligence and
extraction prompts to Gemini, every stage — image preprocessing, text
detection (DBNet), recognition (SVTR/CTC), reading order, layout-aware field
extraction — runs locally on TPU via JAX/XLA/Pallas, sharded over a
`jax.sharding.Mesh`.

Package layout
--------------
core/      config, dtype policy, device mesh & topology
kernels/   Pallas TPU kernels (fused preprocessing, etc.)
ops/       jnp compute ops: image pipeline, CTC decode, geometry, sampling
native/    C++ host ops (connected components / polygon extraction)
models/    flax model definitions: DBNet det, SVTR rec, layout extractor
parallel/  sharding specs, page-parallel dispatch, TP partitioning
engine/    the OCR engine: raster -> preprocess -> det -> crop -> rec -> order
extract/   structured field extraction (rules/templates + layout model)
service/   orchestration workflow, validation, bbox matching, export, stats
db/        sqlite-backed persistence mirroring the reference Postgres schema
api/       stdlib-asyncio HTTP server + REST routes (reference-compatible)
training/  synthetic data generation + sharded training loops
utils/     file management, logging, profiling

Reference parity map lives in SURVEY.md; each module's docstring cites the
reference file(s) whose behavior it covers.
"""

from ocr_system_tpu.version import __version__

__all__ = ["__version__"]
