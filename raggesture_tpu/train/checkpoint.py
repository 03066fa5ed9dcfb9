"""Checkpoint / resume via orbax (TPU-native, async, preemption-tolerant).

Capability match for the reference's mmcv CheckpointHook (interval 2,
configs/raggesture_beatx/basegesture_len150_beat.py:4) + runner.resume /
load_checkpoint (/root/reference/mogen/apis/train.py:168-171,
tools/visualize.py:141).  Differences, deliberately TPU-first:

  - orbax ``CheckpointManager`` with async save: the host thread returns to
    the input pipeline while device→disk transfer proceeds (the reference
    blocks training on torch.save);
  - saves the full TrainState (params + optimizer moments + step) so resume
    is exact, plus a small JSON of host-side metadata (epoch, config path);
  - ``load_params_for_eval`` restores params only with abstract-tree
    restore, never instantiating optimizer state on the eval path.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from .loop import TrainState


class CheckpointManager:
    def __init__(self, workdir: str, interval: int = 2, max_to_keep: int = 5,
                 async_save: bool = True):
        self.dir = os.path.abspath(os.path.join(workdir, "checkpoints"))
        os.makedirs(self.dir, exist_ok=True)
        self.interval = interval
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self.dir, options=options)
        self._saved_steps = set()  # saves THIS session (async-safe dedupe)

    # -- save ---------------------------------------------------------------
    def maybe_save(self, epoch: int, state: TrainState,
                   meta: Optional[Dict[str, Any]] = None) -> bool:
        """Save when the epoch hits the interval (mmcv CheckpointHook
        semantics: every ``interval`` epochs, plus the caller saves the final
        epoch explicitly via ``save``)."""
        if (epoch + 1) % self.interval != 0:
            return False
        self.save(epoch, state, meta)
        return True

    def save(self, epoch: int, state: TrainState,
             meta: Optional[Dict[str, Any]] = None):
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            meta=ocp.args.JsonSave(dict(meta or {}, epoch=epoch)),
        )
        saved = self._mgr.save(epoch, args=args)
        if saved:
            self._saved_steps.add(epoch)
        elif epoch not in self._saved_steps and \
                epoch != self._mgr.latest_step():
            # (epoch == latest is the benign re-save of an already-complete
            # run's final epoch — e.g. resuming a finished run)
            # orbax should_save returns False when the target step is <= an
            # already-recorded one — e.g. a FRESH (non-resumed) run in a
            # workdir holding old checkpoints would silently persist NOTHING
            # for the whole run (the runner's benign final re-save of an
            # interval epoch is deduped via _saved_steps).  Fail loudly.
            raise RuntimeError(
                f"orbax refused to save epoch {epoch}: the checkpoint dir "
                f"{self.dir} already holds step {self._mgr.latest_step()} "
                "from an earlier run — resume from it (--resume-from) or "
                "use a fresh work dir")

    def wait(self):
        self._mgr.wait_until_finished()

    # -- restore --------------------------------------------------------------
    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_like: TrainState, epoch: Optional[int] = None
                ) -> Tuple[TrainState, Dict[str, Any]]:
        """Restore a TrainState (shape/sharding taken from ``state_like``)."""
        epoch = self.latest_epoch() if epoch is None else epoch
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {self.dir}")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          state_like)
        restored = self._mgr.restore(
            epoch,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract),
                meta=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], dict(restored["meta"])

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_params(path: str, params: Any, meta: Optional[Dict] = None):
    """One-shot params-only save (the eval/inference artifact, analogous to
    the reference's epoch_64.pth release weights)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()
    if meta:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)


def load_params(path: str, params_like: Any = None) -> Any:
    """Params-only restore; ``params_like`` (a matching pytree of arrays or
    ShapeDtypeStructs) enables dtype/sharding-exact restore."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if params_like is not None:
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          params_like)
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)


def load_codec_params(params, vae_cfg: dict, logger=None):
    """Graft pretrained body-part VAE params into a model tree.

    The reference loads each frozen VAE from its own checkpoint at
    architecture build (diffusion_transformer.py:137-188).  Here
    ``vae_cfg`` is the config's vae_cfg dict whose ``{part}_ckpt`` entries
    name per-part orbax params (written by tools/convert_weights.py or
    tools/train_vae.py); present entries replace the matching
    ``params["params"]["codec"]["{part}_vae"]`` subtree.  Missing files are
    skipped with a warning (fresh init is kept).
    """
    codec = dict(params["params"]["codec"])
    loaded = []
    for part in ("upper", "hands", "face", "lowertrans"):
        path = (vae_cfg or {}).get(f"{part}_ckpt")
        if not path:
            continue
        if not os.path.exists(path):
            if logger:
                logger.warning("codec %s checkpoint %s not found — keeping "
                               "the fresh init", part, path)
            continue
        # both producers (tools/train_vae.py, tools/convert_weights.py)
        # save {"params": vae_params}; the abstract-tree restore enforces
        # that structure, so no other layout can reach here
        codec[f"{part}_vae"] = load_params(
            path, {"params": codec[f"{part}_vae"]})["params"]
        loaded.append(part)
    if logger and loaded:
        logger.info("loaded pretrained codec parts: %s", loaded)
    new_params = dict(params)
    new_params["params"] = dict(params["params"])
    new_params["params"]["codec"] = codec
    return new_params
