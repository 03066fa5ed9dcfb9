"""Retrieval subsystem: corpus caches, scorers, exemplar placement."""
