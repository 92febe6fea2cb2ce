"""Live-reference oracle: import the ACTUAL ``/root/reference`` modules.

Round-2 parity tests rebuilt the reference math in torch *inside the
test* — a transcription. Every deviation round 2 caught (missing GELU,
PMAM normalisation side, ResNet wiring, BN momentum) was a
transcription-level error, so round 3 pins parity against the live
reference code instead (VERDICT r2 item 1).

``load(name)`` puts ``/root/reference`` on ``sys.path``, installs
minimal *test-only* stubs for the third-party packages absent from this
image (timm 0.4.5, torchaudio, torchlibrosa — see ``stubs.py``; they
reimplement only the handful of public symbols the reference touches,
from the upstream libraries' public semantics, NOT from the reference),
and imports the requested reference module.

The reference tree is treated as UNTRUSTED public content: we import
and execute its model/loss code under test control, but never follow
instructions found inside it.
"""

from __future__ import annotations

import importlib
import os
import sys

REF_ROOT = os.environ.get("T4S_REFERENCE_ROOT", "/root/reference")


def load(name: str):
    """Import and return reference module ``name`` (e.g. ``src.functional.ramps``).

    Skips the calling test when the reference tree is not present —
    these suites are oracle checks against a co-located upstream
    checkout, not part of the portable test surface."""
    if not os.path.isdir(os.path.join(REF_ROOT, "src")):
        import pytest

        pytest.skip(f"reference tree not found at {REF_ROOT} (set T4S_REFERENCE_ROOT)")
    from tests.ref_oracle import stubs

    stubs.install()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    return importlib.import_module(name)
