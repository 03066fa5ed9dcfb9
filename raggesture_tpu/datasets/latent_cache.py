"""Frozen-codec latent cache: precomputed per-window (mu, logvar).

The 4 body-part VAEs are frozen for diffusion training (reference:
requires_grad=False + VAE_FreezeHook, /root/reference/mogen/core/
model_freeze_hooks.py:13-27), yet the reference re-encodes every batch
through them every step (diffusion_architecture.py:136-145) — ~25 GFLOP per
sample of training-constant compute.  Because the reference's encode
*rsamples* z from (mu, logvar) (gesture_vae.py:111-121), caching the
distribution parameters and re-drawing z inside the train step is
distributionally IDENTICAL to the live encode — not an approximation — and
removes the codec forward from the hot loop entirely (measured ~57 ms of a
~157 ms step at batch 128 on v5e, docs/PERFORMANCE.md).

Layout: shards of ``SHARD`` windows as ``latents_{s:05d}.npz`` with
``mu``/``logvar`` arrays of shape (n, 43, D), plus ``index.json`` holding
the window-name order and a codec-parameter fingerprint.  A cache built
with different codec weights hard-fails at load (same discipline as the
foot-contact check, datasets/beatx.py:404).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np


SHARD = 1024


def tree_fingerprint(tree) -> str:
    """Order-stable fingerprint of an arbitrary pytree of arrays (path +
    two reduction scalars per leaf, hashed)."""
    import jax

    leaves = jax.tree_util.tree_leaves_with_path(tree)
    acc = []
    for path, leaf in leaves:
        a = np.asarray(leaf, np.float64)
        acc.append((jax.tree_util.keystr(path), float(a.sum()),
                    float(np.abs(a).sum())))
    acc.sort()
    import hashlib

    return hashlib.sha1(json.dumps(acc).encode()).hexdigest()[:16]


def codec_fingerprint(params) -> str:
    """Order-stable fingerprint of the codec parameter subtree."""
    return tree_fingerprint(params["params"]["codec"])


def build_latent_cache(dataset, model, params, path: str,
                       batch_size: int = 64, logger=None,
                       overwrite: bool = False) -> str:
    """One codec-encode pass over ``dataset`` -> (mu, logvar) shards.

    Idempotent: an existing cache with a matching fingerprint and window
    count is kept; a fingerprint mismatch hard-fails unless ``overwrite``.
    """
    import jax

    from .beatx import collate

    os.makedirs(path, exist_ok=True)
    index_path = os.path.join(path, "index.json")
    fp = codec_fingerprint(params)
    if os.path.exists(index_path) and not overwrite:
        with open(index_path) as f:
            index = json.load(f)
        if index["fingerprint"] != fp:
            raise RuntimeError(
                f"latent cache at {path} was built with different codec "
                f"weights (cache {index['fingerprint']} != params {fp}); "
                "rebuild with overwrite=True")
        if len(index["names"]) == len(dataset):
            if logger:
                logger.info("using existing latent cache %s (%d windows)",
                            path, len(index["names"]))
            return path

    enc = jax.jit(lambda p, b: model.apply(
        p, b, method=model.encode_motion_dist))

    names: List[str] = []
    mu_buf: List[np.ndarray] = []
    lv_buf: List[np.ndarray] = []
    shard_id = 0

    def flush(final: bool = False):
        nonlocal shard_id, mu_buf, lv_buf
        while len(mu_buf) >= SHARD or (final and mu_buf):
            take_mu, mu_buf = mu_buf[:SHARD], mu_buf[SHARD:]
            take_lv, lv_buf = lv_buf[:SHARD], lv_buf[SHARD:]
            np.savez(os.path.join(path, f"latents_{shard_id:05d}.npz"),
                     mu=np.concatenate(take_mu),
                     logvar=np.concatenate(take_lv))
            shard_id += 1

    n = len(dataset)
    for start in range(0, n, batch_size):
        idx = list(range(start, min(start + batch_size, n)))
        recs = [dataset[i] for i in idx]
        # pad the tail by repeating the last record: shapes stay static so
        # the encode compiles once
        pad = batch_size - len(recs)
        batch = collate(recs + [recs[-1]] * pad)
        # only the motion fields the encode reads — collate also carries
        # non-array fields (sample_name etc.) that jit can't trace
        batch = {k: batch[k] for k in (
            "motion_upper", "motion_lower", "motion_face", "motion_hands",
            "trans", "facial", "contact", "motion_mask") if k in batch}
        mu, logvar = enc(params, batch)
        mu = np.asarray(mu)[: len(recs)]
        logvar = np.asarray(logvar)[: len(recs)]
        mu_buf.append(mu)
        lv_buf.append(logvar)
        names.extend(r["sample_name"] for r in recs)
        flush()
        if logger and (start // batch_size) % 20 == 0:
            logger.info("latent cache: %d/%d windows", len(names), n)
    flush(final=True)

    with open(index_path, "w") as f:
        json.dump({"names": names, "shard_size": SHARD,
                   "fingerprint": fp}, f)
    if logger:
        logger.info("built latent cache %s (%d windows, %d shards)",
                    path, len(names), shard_id)
    return path


class LatentCachedDataset:
    """Wraps a window dataset, attaching ``latent_mu``/``latent_logvar`` to
    every served record (keyed by ``sample_name``).  The training loss
    switches to the cached path when those fields are present
    (models/architecture.py::training_loss)."""

    def __init__(self, dataset, path: str, params=None):
        self.dataset = dataset
        self.path = path
        with open(os.path.join(path, "index.json")) as f:
            index = json.load(f)
        if params is not None:
            fp = codec_fingerprint(params)
            if index["fingerprint"] != fp:
                raise RuntimeError(
                    f"latent cache at {path} was built with different codec "
                    f"weights (cache {index['fingerprint']} != params {fp})")
        self.name_to_idx: Dict[str, int] = {
            n: i for i, n in enumerate(index["names"])}
        self.shard_size = int(index["shard_size"])
        self._shards: Dict[int, Dict[str, np.ndarray]] = {}

    def __len__(self):
        return len(self.dataset)

    def _shard(self, sid: int):
        hit = self._shards.get(sid)
        if hit is None:
            with np.load(os.path.join(self.path,
                                      f"latents_{sid:05d}.npz")) as z:
                hit = {"mu": z["mu"], "logvar": z["logvar"]}
            self._shards[sid] = hit
            while len(self._shards) > 8:  # ~8 x 1024 x 43 x D floats
                self._shards.pop(next(iter(self._shards)))
        return hit

    def __getitem__(self, i):
        rec = dict(self.dataset[i])
        j = self.name_to_idx[rec["sample_name"]]
        shard = self._shard(j // self.shard_size)
        k = j % self.shard_size
        rec["latent_mu"] = shard["mu"][k]
        rec["latent_logvar"] = shard["logvar"][k]
        return rec

    def __getattr__(self, name):
        # delegate dataset attributes (e.g. cfg, records) to the wrappee
        return getattr(self.dataset, name)
