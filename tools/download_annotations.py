#!/usr/bin/env python
"""Download the BEAT2 additional annotations (discourse/sem/prom).

Capability match for /root/reference/tools/download_annotations.py:1-40:
HF snapshot of ``m-hamza-mughal/beat2-additional-annotations`` into
``datasets/beat_english_v2.0.0/``.  Requires network access.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--repo", default="m-hamza-mughal/beat2-additional-annotations")
    p.add_argument("--out", default="datasets/beat_english_v2.0.0/")
    args = p.parse_args()
    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        raise SystemExit("huggingface_hub not installed; download "
                         f"https://huggingface.co/datasets/{args.repo} "
                         f"manually into {args.out}")
    os.makedirs(args.out, exist_ok=True)
    path = snapshot_download(repo_id=args.repo, repo_type="dataset",
                             local_dir=args.out)
    print(f"annotations downloaded to {path}")


if __name__ == "__main__":
    main()
