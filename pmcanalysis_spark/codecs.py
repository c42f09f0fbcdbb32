"""Pluggable media-codec hooks for ``extract_media_features(decoder=...)``.

PLANS.md "Media decode budget" quantifies why this exists: the pure-Python
JPEG tier decodes ~0.01 Mpx/s/core — fine as a correctness oracle, not
bulk-viable at 100 TB. The production answer is a real codec library
(libjpeg-turbo / PyAV / ffmpeg) routed through the ``decoder=`` hook, which
runs INSIDE the Arrow worker so the payload bytes never take an extra hop.
This module is the wiring: an import-string resolver for spark-submit jobs
(``run_pipeline.py --decoder pkg.mod:fn``) and two reference decoders — a
passthrough template and the deterministic fake-fast codec the pipeline
tests use in this codec-less sandbox.

Decoder contract (multimodal.extract_media_features): called as
``decoder(kind, payload, frame_every)`` with ``payload: bytes``; return a
list of ``(frame_idx, width, height, features)`` tuples to TAKE the row, or
``None`` to fall through to the built-in pure-Python tiers. The callable
must be importable by name on the executors (a module-level function
shipped via --py-files), not a lambda.
"""

from __future__ import annotations

import importlib
from typing import Callable, Optional


def resolve_decoder(spec: str) -> Callable:
    """Resolve ``"package.module:attr"`` (or ``"package.module.attr"``) to
    the decoder callable. Raises ImportError/AttributeError loudly — a job
    configured with a codec that isn't importable must not silently fall
    back to the 10^5-core-year pure-Python tier."""
    if ":" in spec:
        mod_name, attr = spec.split(":", 1)
    else:
        mod_name, _, attr = spec.rpartition(".")
        if not mod_name:
            raise ImportError(
                f"decoder spec {spec!r} must be 'module:callable' or 'module.callable'"
            )
    fn = getattr(importlib.import_module(mod_name), attr)
    if not callable(fn):
        raise TypeError(f"decoder {spec!r} resolved to non-callable {fn!r}")
    return fn


def passthrough_decoder(kind: str, payload: bytes, frame_every: int) -> Optional[list]:
    """Template decoder: takes nothing, every row falls through to the
    built-in tiers. Copy this signature when wrapping a real codec:

        import turbojpeg  # or av, cv2, ...
        _jpeg = turbojpeg.TurboJPEG()
        def jpeg_fast(kind, payload, frame_every):
            if kind == "image" and payload[:2] == b"\\xff\\xd8":
                arr = _jpeg.decode(payload)  # BGR ndarray
                h, w = arr.shape[:2]
                return [(0, w, h, _feature_vec(arr))]
            return None  # everything else: built-in tier
    """
    return None


# Header magic for the sandbox's fake-fast codec format (see below).
FAKE_MAGIC = b"FAKE"


def fake_fast_decoder(kind: str, payload: bytes, frame_every: int) -> Optional[list]:
    """Deterministic stand-in for a fast codec, used by the pipeline-level
    --decoder tests (this sandbox has no ffmpeg/libjpeg). Claims payloads
    with the ascii header ``FAKE <w> <h> <n_frames>`` and emits one row per
    ``frame_every``-th frame with features derived arithmetically from the
    header — so the test oracle can recompute the truth without decoding.
    All other payloads return None and take the built-in pure-Python tier,
    which is exactly the partial-routing contract a real deployment uses
    (JPEG via turbojpeg, everything else built-in)."""
    if not payload.startswith(FAKE_MAGIC + b" "):
        return None
    try:
        head = payload.split(b"\n", 1)[0].decode("ascii")
        _, w, h, n_frames = head.split(" ")
        w, h, n_frames = int(w), int(h), int(n_frames)
    except (ValueError, UnicodeDecodeError):
        return None
    step = max(frame_every, 1) if kind == "video" else max(n_frames, 1)
    return [
        (fi, w, h, [float(w * h), float(fi), float(len(payload))])
        for fi in range(0, max(n_frames, 1), step)
    ]
