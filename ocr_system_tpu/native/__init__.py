"""Native host ops, built on demand with g++ and bound via ctypes.

The compute path is JAX/XLA on TPU; these ops cover the host-side runtime
pieces where XLA is the wrong tool (control-flow-heavy bitmap postprocess).
If the toolchain is unavailable the callers (ops/boxes.py) fall back to
scipy — the framework never hard-fails on a missing compiler.
"""

from ocr_system_tpu.native.build import build_library, library_path

__all__ = ["build_library", "library_path"]
