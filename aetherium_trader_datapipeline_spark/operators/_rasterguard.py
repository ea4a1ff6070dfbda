"""Decompression-bomb raster cap — dependency-free on purpose.

The JPEG codec modules (jpeg_arith / jpeg_lossless / jpeg_hier) are
stdlib-only at import time and lazy-import numpy/multimodal inside
functions; putting the cap here lets them (and multimodal) import it at
top level without dragging pandas/pyspark into their import graph or
risking a multimodal<->codec import cycle (r10 review).

The cap itself (PIL's idea, same default order of magnitude): a corrupt
or adversarial header can declare e.g. 65535x65535 from a 100-byte
blob, and the h*w allocation then lands BEFORE any entropy-decode error
can fire — a worker OOM that the try_decode wrappers cannot catch (the
kernel kills the process, Spark retries the task into the same bomb,
the job dies).  67M pixels = 256 MB RGB, far above any real corpus
thumbnail and far below worker RAM.
"""

from __future__ import annotations

MAX_DECODE_PIXELS = 1 << 26


def _check_raster(width: int, height: int, max_pixels: int | None) -> None:
    """Enforced at each decoder's OWN dimension parse (the r10 review
    showed a dispatch-level header pre-check is bypassable: GIF sizes by
    the image descriptor while the header parser reads the logical
    screen, and a JPEG can hide a huge second SOF behind a tiny first
    one — the check must see the dims the allocation will use)."""
    if max_pixels is not None and width * height > max_pixels:
        raise ValueError(
            f"declared raster {width}x{height} exceeds max_pixels="
            f"{max_pixels} (decompression-bomb guard)"
        )
