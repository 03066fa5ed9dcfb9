"""Device mesh + sharding helpers.

The reference's ONLY parallelism is data parallelism (NCCL DDP /
MMDataParallel + DistributedSampler — /root/reference/mogen/apis/train.py:
84-92, mogen/datasets/samplers/distributed_sampler.py:5-42).  The TPU-native
equivalent: a 1-D ``jax.sharding.Mesh`` over all chips (ICI within a slice,
DCN across slices), batch sharded over the ``data`` axis, parameters
replicated.  Gradient all-reduce is inserted by XLA inside the jitted train
step — no manual bucketing/coalescing (mogen/utils/dist_utils.py:12-44
becomes obsolete).

The latent sequence is 43 tokens — there is nothing to gain from tensor/
sequence parallelism at this model size (see SURVEY.md §5), so the mesh is
deliberately 1-D; the helpers still accept arbitrary mesh shapes for
forward-compatibility.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Leading (batch) dim sharded over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def stacked_batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS
                           ) -> NamedSharding:
    """(k, batch, ...) stacks: scan axis replicated, batch dim sharded."""
    return NamedSharding(mesh, P(None, axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spans_processes(mesh: Mesh) -> bool:
    """True when the mesh holds devices of more than one process (multi-host
    DP: each process contributes its own batch shard)."""
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def _put_local(x, sh: NamedSharding, multiprocess: bool):
    """Place host data onto the mesh under ``sh``.

    Single-process: a plain device_put.  Multi-process: ``x`` is this
    process's shard of the global batch (the reference DistributedSampler
    contract — every host loads indices[shard::num_shards]), so the global
    array is assembled with make_array_from_process_local_data; a device_put
    would wrongly treat the local shard as the whole global value (and
    raises for shardings that span non-addressable devices)."""
    if multiprocess:
        return jax.make_array_from_process_local_data(sh, np.asarray(x))
    return jax.device_put(x, sh)


def shard_batch(batch, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a host batch (dict or array) onto the mesh, sharded along the
    batch dim; in multi-process runs each host contributes its loader shard."""
    sh = batch_sharding(mesh, axis_name)
    mp = spans_processes(mesh)
    return jax.tree_util.tree_map(lambda x: _put_local(x, sh, mp), batch)


def put_stacked_batch(stacked, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Place a (k, batch, ...) multi-step stack onto the mesh: scan axis
    replicated, batch dim sharded (multi-process aware like shard_batch)."""
    sh = stacked_batch_sharding(mesh, axis_name)
    mp = spans_processes(mesh)
    return jax.tree_util.tree_map(lambda x: _put_local(x, sh, mp), stacked)


def replicate_tree(tree, mesh: Mesh):
    """Replicate a host tree onto every device of the mesh.

    Multi-process: device_put cannot target non-addressable devices, so the
    global replicated array is assembled from each process's (identical)
    full copy via make_array_from_process_local_data — the hosts hold the
    same value (same seed / same checkpoint), matching the reference's DDP
    assumption of identical initial replicas."""
    rep = replicated(mesh)
    mp = spans_processes(mesh)
    if mp:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                rep, np.asarray(x)), tree)

    def put(x):
        # device_put may reuse a device-resident input buffer as the shard
        # on its current device (zero-copy).  The replicated result is
        # routinely donated (jit_train_step), and donating an aliased shard
        # would delete the CALLER's array too — so copy device inputs first;
        # the replicated tree must own every buffer it hands to donation.
        if isinstance(x, jax.Array):
            x = jnp.copy(x)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(put, tree)


def _shard_map(fn, mesh: Mesh, in_specs, out_specs):
    """shard_map across jax versions (import location + check flag rename)."""
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map
    import inspect

    flag = ("check_vma" if "check_vma" in
            inspect.signature(shard_map).parameters else "check_rep")
    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                     **{flag: False})


def sharded_sampler(gen, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Data-parallel sampling over the mesh (the serving-scale path).

    Wraps a StagedGenerator's plain-DDIM stage in shard_map: params /
    schedule tables replicated, batch-dim tensors sharded over the data
    axis.  Inference is embarrassingly data-parallel (zero collectives), so
    each device runs the full 50-step program on its batch shard and Pallas
    kernels see per-device shapes (no partitioning rules needed).

    Returns sample_fn(params, noise, rng, conds, token_mask, coef_table,
    js) -> latents, with noise/conds/token_mask sharded on dim 0.
    The rng is replicated; per-device noise divergence comes from the
    sharded start noise (and eta=0 DDIM consumes no in-loop randomness).
    """
    def fn(params, noise, rng, conds, token_mask, coef_table, js, pro):
        in_seq = jnp.zeros_like(noise)
        return gen._ddim_plain.__wrapped__(
            params, noise, rng, conds, token_mask, coef_table, js, in_seq,
            pro,
        )

    rep = P()
    bat = P(axis_name)
    sm = _shard_map(fn, mesh,
                    in_specs=(rep, bat, rep, bat, bat, rep, rep, rep),
                    out_specs=bat)
    jitted = jax.jit(sm)

    def sample_fn(params, noise, rng, conds, token_mask, coef_table, js):
        # gen._pro is passed per call (replicated), never closure-baked —
        # it tracks gen.params via the StagedGenerator.params setter
        return jitted(params, noise, rng, conds, token_mask, coef_table,
                      js, gen._pro)

    return sample_fn


def sharded_guided_sampler(gen, mesh: Mesh, axis_name: str = DATA_AXIS):
    """Data-parallel insertion-guided sampling over the mesh.

    Wraps a StagedGenerator's guided stage (inversion-spliced start noise +
    per-step guidance targets) in shard_map: like :func:`sharded_sampler`,
    every batch-dim tensor is sharded over the data axis and the loop runs
    collective-free per device.  ``inv_all`` carries the batch on axis 1
    ((num_timesteps, B, T, D) — see architecture._splice_apply), hence its
    P(None, data) spec; guidance_iters and the schedule tables replicate.

    Returns sample_fn(params, noise, rng, conds, token_mask, coef_table,
    js, inv_all, guidance_iters, guidance_lr, init_in_seq) -> latents.
    """
    rep = P()
    bat = P(axis_name)
    inv = P(None, axis_name)
    sm = _shard_map(
        gen._guided.__wrapped__, mesh,
        in_specs=(rep, bat, rep, bat, bat, rep, rep, inv, rep, rep, bat,
                  rep),
        out_specs=bat)
    jitted = jax.jit(sm)

    def sample_fn(params, noise, rng, conds, token_mask, coef_table, js,
                  inv_all, guidance_iters, guidance_lr, init_in_seq):
        return jitted(params, noise, rng, conds, token_mask, coef_table, js,
                      inv_all, guidance_iters, guidance_lr, init_in_seq,
                      gen._pro)

    return sample_fn
