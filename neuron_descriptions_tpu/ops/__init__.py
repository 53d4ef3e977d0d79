"""TPU-native compute engine: streaming statistics, mask geometry, beam search.

This package replaces the reference's vendored NetDissect compute engine
(reference: src/deps/netdissect/{runningstats,tally,upsample,imgviz}.py) with
pure, fixed-shape, jit-compilable JAX implementations designed for the MXU
and for mergeability across a device mesh:

- ``topk``: streaming per-unit top-k accumulator (vs RunningTopK's
  buffer/compress heuristic, reference: runningstats.py:31-151).
- ``quantile``: mergeable bottom-k tag reservoir quantile sketch (vs
  RunningQuantile's KLL sketch, reference: runningstats.py:274-628).
- ``masks``: receptive-field-centered bilinear upsampling + thresholding +
  image compositing (vs upsample.py/imgviz.py grid_sample machinery).
- ``lstm``: functional LSTM cells with torch gate ordering for weight parity.
- ``beam``: fixed-shape ``lax.scan`` beam search (vs AllenNLP BeamSearch).
"""
from neuron_descriptions_tpu.ops import beam, lstm, masks, quantile, topk

__all__ = ["beam", "lstm", "masks", "quantile", "topk"]
