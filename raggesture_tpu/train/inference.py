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


def encode_result_blob(results: List[Dict]) -> np.ndarray:
    """Per-host result list -> a uint8 byte blob for allgather."""
    import pickle

    return np.frombuffer(pickle.dumps(results), dtype=np.uint8)


def pad_result_blob(blob: np.ndarray, size: int) -> np.ndarray:
    """Zero-pad a blob to ``size`` (allgather needs equal shapes)."""
    padded = np.zeros(size, np.uint8)
    padded[: blob.size] = blob
    return padded


def merge_result_blobs(gathered: np.ndarray, sizes) -> List[Dict]:
    """(R, max_size) gathered blobs + true per-rank sizes -> the
    concatenated result list in rank order."""
    import pickle

    results: List[Dict] = []
    for rank in range(gathered.shape[0]):
        results.extend(
            pickle.loads(gathered[rank][: int(sizes[rank])].tobytes()))
    return results


def multi_device_test(generate_fn: Callable[[Dict], Dict], data_loader,
                      max_batches: Optional[int] = None) -> List[Dict]:
    """Multi-host variant (mogen/apis/test.py:48-160): each process serves
    its sampler shard; per-host result lists are concatenated via a
    process-level allgather of host bytes.

    Every host materializes all results in RAM (like the reference's
    all_gather path, test.py:118-160) — fine at gesture-clip scale; shard
    to disk before gathering if results ever outgrow host memory."""
    local = single_device_test(generate_fn, data_loader, max_batches)
    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils

    blob = encode_result_blob(local)
    sizes = multihost_utils.process_allgather(
        np.asarray([blob.size], np.int64)).reshape(-1)
    gathered = multihost_utils.process_allgather(
        pad_result_blob(blob, int(sizes.max())))
    return merge_result_blobs(np.asarray(gathered), sizes)
