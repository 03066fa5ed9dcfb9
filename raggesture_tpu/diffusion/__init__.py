"""Diffusion engine: schedules, Gaussian core, scan-based samplers, VLB."""
