"""CLI entry points (reference: scripts/).

Run as modules from the repo root, e.g.
``python -m scripts.compute_exemplars alexnet imagenet``.
"""
