"""Paper-reproduction experiments (reference: experiments/).

Run as modules from the repo root, e.g.
``python -m experiments.generalization --experiments within-network``.
"""
