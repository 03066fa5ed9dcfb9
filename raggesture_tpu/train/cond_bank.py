"""Device-resident per-sample feature bank for the training runner.

Every tensor the train step consumes is *training-constant per sample*:
condition features (word/audio) are precomputed wav2vec2/BERT activations,
the latent-cache (mu, logvar) comes from the frozen codec, and the cached
dataset serves fixed windows per ``sample_idx`` (datasets/beatx.py:674-688).
The reference's loader nevertheless re-ships all of it to the GPU every
step (/root/reference/mogen/apis/train.py:41-96 — a fresh ``.cuda()`` per
batch).  On hosts with slow host->device links (this rig's tunnel measures
~0.05 GB/s; a batch-64 k=8 dispatch ships ~0.5 GB) that transfer, not
compute, bounds the whole chain (docs/BENCH_FULL.json ``runner_note``).

This module keeps one HBM-resident row per sample (LRU-bounded) and makes
the steady-state step ship ONLY ``(k, B)`` int32 slot indices + rng: the
jitted step gathers its batch from the bank on device.  It is the
dataset-level mirror of the guided path's device payload bank
(retrieval/database.py::_payload_row).

Epoch 1 stages rows as misses stream in (same bytes as before, once);
epoch 2+ runs at the compute floor.  Numerics are bit-identical to the
unbanked path: the gathered rows are the same arrays the loader would have
shipped (bf16 wire-cast happens before staging, utils/wire.py).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import (
    replicated,
    spans_processes,
    stacked_batch_sharding,
)


class DeviceSampleBank:
    """HBM LRU of per-sample rows, keyed by the dataset ``sample_idx``.

    ``capacity`` bounds HBM use: rows = capacity * sum(field row bytes)
    (flagship latent-cache fields: word+audio bf16 + (mu, logvar) f32 +
    masks ~= 1.2 MB/sample -> capacity 512 ~= 0.6 GB).  Eviction is LRU
    over *staged batches*; rows referenced by the current batch are never
    evicted (a batch larger than capacity raises).

    Single-process only: with multi-host loaders each process sees only its
    shard of every batch, while the in-step gather needs a globally
    consistent (replicated) bank — callers must disable the bank when the
    mesh spans processes (train_model does).
    """

    def __init__(self, capacity: int, mesh=None):
        assert capacity > 0
        if mesh is not None and spans_processes(mesh):
            raise ValueError("DeviceSampleBank is single-process only")
        self.capacity = int(capacity)
        self.mesh = mesh
        self.banks: Optional[Dict[str, jax.Array]] = None
        self._slot_of: "OrderedDict[int, int]" = OrderedDict()  # id -> slot
        self._free = list(range(capacity - 1, -1, -1))
        self._scatter = None
        self._pad_B: Optional[int] = None
        self.misses = 0
        self.hits = 0

    # -- allocation ---------------------------------------------------------
    def _alloc(self, batch: Dict[str, np.ndarray]):
        rep = replicated(self.mesh) if self.mesh is not None else None

        def zeros(row):
            shape = (self.capacity,) + tuple(row.shape[1:])
            dt = jax.dtypes.canonicalize_dtype(row.dtype)  # x64 -> x32
            fn = jax.jit(lambda: jnp.zeros(shape, dt),
                         **({"out_shardings": rep} if rep else {}))
            return fn()

        self.banks = {k: zeros(v) for k, v in batch.items()}
        # one compiled scatter per field set: bank.at[slots].set(rows).
        # NOT donated: the prefetch worker stages batch j+1 (replacing
        # bank arrays) before the main thread dispatches batch j's banked
        # step, whose banks snapshot must stay alive — donation here
        # surfaced as "Array has been deleted" at dispatch.  The copy cost
        # is miss-only (steady state never scatters).
        self._scatter = jax.jit(
            lambda bank, slots, rows: bank.at[slots].set(rows))

    # -- staging ------------------------------------------------------------
    def stage(self, batch: Dict[str, np.ndarray],
              sample_idx: np.ndarray) -> np.ndarray:
        """Ensure every row of ``batch`` is bank-resident; ship only the
        missing rows; return the (B,) int32 slot vector for the gather."""
        ids = [int(i) for i in np.asarray(sample_idx).reshape(-1)]
        if len(set(ids)) > self.capacity:
            raise ValueError(
                f"batch has {len(set(ids))} unique samples > bank capacity "
                f"{self.capacity}")
        if self.banks is None:
            self._alloc(batch)
            self._pad_B = len(ids)
        elif len(ids) != self._pad_B:
            # ragged batch: the fixed-width scatter can't stage it — the
            # runner catches this and routes the batch through the plain
            # streaming path instead
            raise ValueError(
                f"ragged batch ({len(ids)} rows != staged width "
                f"{self._pad_B})")
        in_batch = set(ids)
        missing = [(pos, sid) for pos, sid in enumerate(ids)
                   if sid not in self._slot_of]
        # dedupe repeated ids within one batch (stage the row once)
        seen: set = set()
        missing = [(p, s) for p, s in missing
                   if not (s in seen or seen.add(s))]
        for _, sid in missing:
            if self._free:
                slot = self._free.pop()
            else:
                # evict the least-recently-used id not in this batch
                victim = next(k for k in self._slot_of if k not in in_batch)
                slot = self._slot_of.pop(victim)
            self._slot_of[sid] = slot
        if missing:
            self.misses += len(missing)
            m_slots = np.asarray([self._slot_of[s] for _, s in missing],
                                 np.int32)
            m_pos = [p for p, _ in missing]
            # pad to the fixed batch width so the scatter compiles once
            # (duplicate slots in .set() resolve to the same value)
            pad = self._pad_B - len(m_pos)
            if pad > 0:
                m_slots = np.concatenate(
                    [m_slots, np.full((pad,), m_slots[-1], np.int32)])
                m_pos = m_pos + [m_pos[-1]] * pad
            sl = jnp.asarray(m_slots)
            for name, bank in self.banks.items():
                rows = np.ascontiguousarray(
                    np.asarray(batch[name])[m_pos])
                self.banks[name] = self._scatter(bank, sl, rows)
        self.hits += len(ids) - len(missing)
        # refresh recency for the whole batch
        for sid in ids:
            self._slot_of.move_to_end(sid)
        return np.asarray([self._slot_of[s] for s in ids], np.int32)

    @property
    def fields(self) -> Tuple[str, ...]:
        return tuple(sorted(self.banks)) if self.banks else ()


def jit_banked_multi_step(multi_step, mesh):
    """Jit a ``make_multi_train_step`` program behind a bank gather.

    The returned fn takes ``(state, banks, idx, rng)`` where ``idx`` is the
    (k, B) int32 slot stack (sharded on the batch dim) and ``banks`` the
    bank dict (replicated, already device-resident — zero per-step
    marshaling).  The gather ``banks[f][idx]`` materializes the same
    (k, B, ...) stacked batch the unbanked path ships from the host, inside
    the jit, so losses/updates are bit-identical to
    ``jit_multi_train_step`` on the equivalent stack."""
    rep = replicated(mesh)
    idx_sh = stacked_batch_sharding(mesh)

    def banked(state, banks, idx, rng):
        batch = {name: bank[idx] for name, bank in banks.items()}
        return multi_step(state, batch, rng)

    return jax.jit(
        banked,
        in_shardings=(rep, rep, idx_sh, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
