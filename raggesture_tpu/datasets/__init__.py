"""BEAT2 data pipeline: featurization, window cache, loaders, samplers."""
