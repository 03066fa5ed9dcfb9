#!/usr/bin/env python
"""Download released torch weights and convert them to JAX params.

Capability match for /root/reference/tools/download_weights.py:1-60 (HF
snapshot of ``m-hamza-mughal/rag-gesture-weights`` → experiments/vae,
experiments/diffusion, smplx models), plus the extra conversion step this
framework needs: ``tools/convert_weights.py`` turns each torch ``.pth`` /
``.bin`` into orbax params.  Requires network access for the download.
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--repo", default="m-hamza-mughal/rag-gesture-weights")
    p.add_argument("--out", default=".")
    p.add_argument("--convert", action="store_true",
                   help="run tools/convert_weights.py on the snapshot")
    args = p.parse_args()
    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        raise SystemExit("huggingface_hub not installed; download "
                         f"https://huggingface.co/{args.repo} manually, then "
                         "run tools/convert_weights.py")
    path = snapshot_download(repo_id=args.repo, local_dir=args.out)
    print(f"weights downloaded to {path}")
    if args.convert:
        subprocess.check_call([sys.executable,
                               os.path.join(os.path.dirname(__file__),
                                            "convert_weights.py"),
                               "--all", "--root", args.out])


if __name__ == "__main__":
    main()
