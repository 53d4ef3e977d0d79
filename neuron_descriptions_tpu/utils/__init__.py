"""Utility layer (reference: src/utils/)."""
