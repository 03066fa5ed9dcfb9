"""Device mesh, shardings, and data-parallel wrappers."""
