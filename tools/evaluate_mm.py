#!/usr/bin/env python
"""Multimodality: mean pairwise distance over seeded repetitions.

Capability match for /root/reference/tools/evaluate_mm.py:87-160 — expects
result dirs ``<prefix>_rep0 .. <prefix>_rep{n-1}`` produced by running
tools/visualize.py with different ``--seed`` values.

Usage:
    python tools/evaluate_mm.py RESULTS_PREFIX [--reps 5] [--eval-n 300]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("prefix", help="results dir prefix (expects _rep0.._repN)")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--eval-n", type=int, default=300)
    p.add_argument("--smplx",
                   default="datasets/assets_deps/smplx_models/smplx/"
                           "SMPLX_NEUTRAL_2020.npz")
    args = p.parse_args()

    from raggesture_tpu.eval.evaluator import multimodality
    from raggesture_tpu.utils.env import setup_compilation_cache
    from raggesture_tpu.utils.logger import get_root_logger

    setup_compilation_cache()
    logger = get_root_logger()
    roots = [f"{args.prefix}_rep{i}" for i in range(args.reps)]
    missing = [r for r in roots if not os.path.isdir(r)]
    if missing:
        raise SystemExit(f"missing repetition dirs: {missing}")

    fk_fn = None
    if os.path.exists(args.smplx):
        from tools.evaluate import build_fk_fn

        fk_fn = build_fk_fn(args.smplx)
    else:
        logger.warning("SMPL-X missing — multimodality computed in pose space")

    mm = multimodality(roots, eval_n=args.eval_n, fk_fn=fk_fn)
    logger.info("multimodality: %.6f", mm)
    print(json.dumps({"multimodality": mm}))


if __name__ == "__main__":
    main()
