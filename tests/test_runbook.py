"""The real-data runbook is executable documentation: its --dry-run must
pass (every CLI parses; the artifact manifest matches the live code), so
the egress-enabled pipeline (download -> convert -> cache -> visualize ->
evaluate) stays a copy-paste away.  Reference pipeline:
/root/reference/tools/download_weights.py:1-60, tools/evaluate.py:159-165."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.slow  # spawns one --help subprocess per tool


def test_runbook_dry_run():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "runbook.py"),
         "--dry-run"],
        capture_output=True, text=True, cwd=REPO, timeout=900,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert r.returncode == 0, f"dry-run failed:\n{r.stdout}\n{r.stderr}"
    assert "dry-run ok" in r.stdout


def test_runbook_prints_steps():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "runbook.py")],
        capture_output=True, text=True, cwd=REPO, timeout=300,
        env=dict(os.environ, JAX_PLATFORMS="cpu"))
    assert r.returncode == 0
    for step in ("download-annotations", "download-weights",
                 "cache-build+visualize", "evaluate", "longform"):
        assert step in r.stdout
    assert "pred_motion.npz" in r.stdout


def test_runbook_matches_docs():
    """Every command in docs/RUNBOOK.md exists as a tool; the doc can't
    reference a tool that was renamed away."""
    with open(os.path.join(REPO, "docs", "RUNBOOK.md")) as f:
        doc = f.read()
    import re

    for m in re.finditer(r"tools/(\w+)\.py", doc):
        assert os.path.exists(os.path.join(REPO, "tools",
                                           m.group(1) + ".py")), m.group(0)
