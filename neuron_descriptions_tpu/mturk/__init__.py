"""MTurk annotation-collection tooling (reference: src/mturk/)."""
from neuron_descriptions_tpu.mturk import hits, qualification

__all__ = ["hits", "qualification"]
