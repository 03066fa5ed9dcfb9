"""Training runtime: optimizer, train/val steps, runner, checkpoints."""
