#!/usr/bin/env python
"""Diversity / L1div / alignment-only evaluation (no FGD model needed).

Capability match for /root/reference/tools/evaluate_divonly.py (same loader
as evaluate.py with FGD disabled).

Usage: python tools/evaluate_divonly.py RESULT_DIR [--eval-n 300] [--smplx P]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("result_dir")
    p.add_argument("--eval-n", type=int, default=300)
    p.add_argument("--smplx",
                   default="datasets/assets_deps/smplx_models/smplx/"
                           "SMPLX_NEUTRAL_2020.npz")
    p.add_argument("--out", default=None)
    p.add_argument("--avg-vel", default=None,
                   help="per-joint dataset mean-velocity .npy for beat-align "
                        "normalization (reference --avg_vel_path)")
    args = p.parse_args()

    from raggesture_tpu.eval.evaluator import EvalConfig, Evaluator
    from raggesture_tpu.utils.env import setup_compilation_cache
    from raggesture_tpu.utils.logger import get_root_logger

    setup_compilation_cache()
    logger = get_root_logger()
    fk_fn = None
    if os.path.exists(args.smplx):
        from tools.evaluate import build_fk_fn

        fk_fn = build_fk_fn(args.smplx)
    else:
        logger.warning("SMPL-X asset missing — joint-space metrics skipped")

    cfg = EvalConfig(eval_n=args.eval_n, compute_fgd=False,
                     avg_vel_path=args.avg_vel,
                     compute_mpjpe=False)
    ev = Evaluator(cfg, fgd_embed_fn=None, fk_fn=fk_fn)
    summary = ev.evaluate(args.result_dir)
    print(json.dumps(summary, indent=1))
    out = args.out or os.path.join(args.result_dir, "metrics_divonly.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
