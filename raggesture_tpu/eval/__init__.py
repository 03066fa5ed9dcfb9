"""Evaluation: metric implementations and the result-directory evaluator."""
