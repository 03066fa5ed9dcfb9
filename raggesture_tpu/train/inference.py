"""Sharded inference helpers (capability match for mogen/apis/test.py:13-160).

The reference runs ``single_gpu_test`` / ``multi_gpu_test`` with NCCL
all_gather (or tmpdir files) to collect per-rank results.  TPU-native
version: each host iterates its sampler shard, runs the jitted generator,
and results are gathered with ``multihost_utils`` when running multi-host
(single-host: a plain list)."""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import numpy as np

from ..utils.logger import get_root_logger


def single_device_test(generate_fn: Callable[[Dict], Dict], data_loader,
                       max_batches: Optional[int] = None) -> List[Dict]:
    """Run ``generate_fn`` over the loader, host-fetching outputs
    (mogen/apis/test.py:13-45)."""
    logger = get_root_logger()
    results = []
    for bi, batch in enumerate(data_loader):
        if max_batches is not None and bi >= max_batches:
            break
        out = generate_fn(batch)
        out = jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "shape") else x, out)
        valid = np.asarray(batch.get(
            "valid_mask", np.ones(len(batch["sample_name"]), bool)))
        for j, name in enumerate(batch["sample_name"]):
            if not valid[j]:
                continue
            results.append({
                "sample_name": name,
                **{k: v[j] for k, v in out.items()
                   if hasattr(v, "shape") and v.shape[:1] == valid.shape},
            })
        logger.info("test batch %d: %d samples", bi, int(valid.sum()))
    return results


def multi_device_test(generate_fn: Callable[[Dict], Dict], data_loader,
                      max_batches: Optional[int] = None) -> List[Dict]:
    """Multi-host variant (mogen/apis/test.py:48-160): each process serves
    its sampler shard; per-host result lists are concatenated via a
    process-level allgather of host bytes."""
    local = single_device_test(generate_fn, data_loader, max_batches)
    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils
    import pickle

    blob = np.frombuffer(pickle.dumps(local), dtype=np.uint8)
    # pad to the max length across hosts (allgather needs equal shapes)
    n = np.asarray([blob.size], np.int32)
    sizes = multihost_utils.process_allgather(n).reshape(-1)
    mx = int(sizes.max())
    padded = np.zeros(mx, np.uint8)
    padded[: blob.size] = blob
    gathered = multihost_utils.process_allgather(padded)
    results: List[Dict] = []
    for rank in range(jax.process_count()):
        results.extend(pickle.loads(gathered[rank][: int(sizes[rank])]
                                    .tobytes()))
    return results
