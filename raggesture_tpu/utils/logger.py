"""Logging + metric writers (capability match for mogen/utils/logger.py:6
and the mmcv TextLoggerHook / TensorboardLoggerHook pair registered at
/root/reference/configs/raggesture_beatx/basegesture_len150_beat.py:19-21).

``get_root_logger`` returns the process-wide "raggesture" logger (file +
stream handlers); ``MetricWriter`` fans scalars out to the text log, a
machine-readable JSONL file, and TensorBoard when available.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Dict, Optional

_LOGGER_NAME = "raggesture"
_initialized = False

_LOG_FORMAT = "%(asctime)s - %(name)s - %(levelname)s - %(message)s"


def get_root_logger(log_file: Optional[str] = None,
                    log_level: int = logging.INFO) -> logging.Logger:
    global _initialized
    logger = logging.getLogger(_LOGGER_NAME)
    if not _initialized:
        logger.setLevel(log_level)
        fmt = logging.Formatter(_LOG_FORMAT)
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        logger.propagate = False
        _initialized = True
    if log_file is not None and not any(
        isinstance(h, logging.FileHandler)
        and getattr(h, "baseFilename", None) == os.path.abspath(log_file)
        for h in logger.handlers
    ):
        os.makedirs(os.path.dirname(os.path.abspath(log_file)), exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(logging.Formatter(_LOG_FORMAT))
        logger.addHandler(fh)
    return logger


class NullWriter:
    """Drop-in MetricWriter that writes nothing — non-zero ranks in
    multi-process training (metrics are replicated; only rank 0 persists)."""

    def write(self, *args, **kwargs):
        pass

    def close(self):
        pass


class MetricWriter:
    """Scalar metrics → text log (every ``interval`` steps), metrics.jsonl,
    and TensorBoard (``<workdir>/tf_logs``) when the package is present."""

    def __init__(self, workdir: str, interval: int = 10,
                 tensorboard: bool = True):
        self.workdir = workdir
        self.interval = interval
        self.logger = get_root_logger()
        os.makedirs(workdir, exist_ok=True)
        self._jsonl = open(os.path.join(workdir, "metrics.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(workdir, "tf_logs"))
            except Exception as e:  # pragma: no cover - env dependent
                self.logger.warning("tensorboard unavailable: %s", e)

    def write(self, step: int, scalars: Dict[str, float],
              prefix: str = "train", epoch: Optional[int] = None,
              force: bool = False):
        # vector-valued entries (per-sample loss lists from the distributed
        # bitness proof) go to the JSONL record verbatim; TB and the text
        # line carry scalars only
        vectors = {k: list(map(float, v)) for k, v in scalars.items()
                   if isinstance(v, (list, tuple))}
        scalars = {k: float(v) for k, v in scalars.items()
                   if not isinstance(v, (list, tuple))}
        # record keys win over scalar names (a metric literally named
        # 'step'/'time'/'prefix'/'epoch' — e.g. mmcv's per-iter 'time' —
        # must not crash dict() or shadow the bookkeeping fields)
        rec = dict(scalars)
        rec.update(vectors)
        rec.update(step=step, time=time.time(), prefix=prefix)
        if epoch is not None:
            rec["epoch"] = epoch
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(f"{prefix}/{k}", v, step)
        if force or step % self.interval == 0:
            parts = ", ".join(f"{k}: {v:.4g}" for k, v in scalars.items())
            at = f"epoch {epoch}, " if epoch is not None else ""
            self.logger.info("[%s] %sstep %d: %s", prefix, at, step, parts)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def collect_env() -> Dict[str, str]:
    """Environment dump logged at startup (reference mogen/utils/
    collect_env.py, tools/train.py:117-121)."""
    import platform

    import jax

    info = {
        "python": platform.python_version(),
        "platform": platform.platform(),
        "jax": jax.__version__,
        "jax_backend": jax.default_backend(),
        "devices": ", ".join(str(d) for d in jax.devices()),
        "device_count": str(jax.device_count()),
        "process_index": str(jax.process_index()),
        "process_count": str(jax.process_count()),
    }
    try:
        import flax

        info["flax"] = flax.__version__
    except ImportError:
        pass
    try:
        import orbax.checkpoint as ocp

        info["orbax"] = getattr(ocp, "__version__", "?")
    except ImportError:
        pass
    return info
