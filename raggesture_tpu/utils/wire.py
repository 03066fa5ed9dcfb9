"""Host→device wire-format helpers.

The big raw condition features (audio 499×768 + word 150×768 f32, ~2 MB per
sample) dominate per-dispatch transfer bytes on remote-hosted TPUs, and they
are pure matmul inputs downstream — TPU matmuls round f32 operands to bf16
anyway (docs/PERFORMANCE.md, verified bit-identical on v5e), so shipping
them as bfloat16 halves the wire bytes at zero numeric cost on TPU.

One policy, used by BOTH the train runner (train/runner.py::device_batch)
and inference (models/architecture.py::StagedGenerator._cast_conds) so the
key set and cast rules cannot diverge.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

# raw condition features eligible for the bf16 wire cast
CONDITION_FEATURE_KEYS = ("word", "audio")


def cast_condition_features(d: Dict[str, Any]) -> Dict[str, Any]:
    """Return a copy of ``d`` with float32 NUMPY condition features cast to
    bfloat16.

    Host-side numpy arrays only: that is where the transfer saving is.
    Arrays already on device were already shipped — an eager device-side
    cast would ADD a dispatch (a real cost on remote-tunnel rigs) and save
    nothing, so they pass through untouched.
    """
    import ml_dtypes

    out = dict(d)
    for k in CONDITION_FEATURE_KEYS:
        v = out.get(k)
        if isinstance(v, np.ndarray) and v.dtype == np.float32:
            out[k] = v.astype(ml_dtypes.bfloat16)
    return out
