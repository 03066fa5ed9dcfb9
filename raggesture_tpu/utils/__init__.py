"""Host utilities: config/logging/profiling/conversion/visualization."""
