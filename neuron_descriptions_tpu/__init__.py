"""neuron_descriptions_tpu — a TPU-native rebuild of MILAN.

This package re-implements the capabilities of evandez/neuron-descriptions
(MILAN, "Natural Language Descriptions of Deep Visual Features", ICLR 2022)
as a TPU-first JAX framework:

- ``exemplars``: NetDissect-style exemplar computation as jit-compiled,
  device-mesh-sharded scans (reference: ``src/exemplars/``).
- ``milannotations``: the top-images dataset layer sharing the reference's
  on-disk ``images.npy``/``masks.npy``/``annotations.csv`` contract
  (reference: ``src/milannotations/``).
- ``milan``: the captioner — masked pyramid feature encoder, attention-LSTM
  decoder with fixed-shape ``lax.scan`` beam search and PMI reranking,
  LSTM language model (reference: ``src/milan/``).
- ``ops``: the TPU stats/compute engine — streaming top-k, mergeable
  quantile sketches, mask-geometry kernels, beam search.
- ``parallel``: mesh/sharding helpers for scaling over ICI.
- ``utils``: env config, hubs, language tooling, serialization, metrics.
"""

__version__ = "0.2.0"
