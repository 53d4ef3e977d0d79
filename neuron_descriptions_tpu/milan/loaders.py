"""Pretrained MILAN model hub (reference: src/milan/loaders.py).

One config per MILANNOTATIONS training grouping (skipping the leave-one-out
``NOT_*`` splits), each with a ``+clip`` variant, pointing at the published
``milan-<key>.pth`` payload URLs. Payload files are the reference's
``{properties, children, state_dict}`` dictionaries; ``Decoder.load``
ingests them (torch zip → numpy via ``utils.serialize.load_payload``) and
rebuilds the decoder with bit-identical weights.
"""
from typing import Any

from neuron_descriptions_tpu.milan import decoders
from neuron_descriptions_tpu.milannotations import loaders as milannotations
from neuron_descriptions_tpu.utils import hubs

__all__ = ["hub", "pretrained"]


def hub() -> hubs.ModelHub:
    """Create the pretrained-MILAN model hub (reference: loaders.py:9-25)."""
    configs = {}
    for group in milannotations.DATASET_GROUPINGS:
        if group.startswith("NOT_"):
            continue
        for rerank_with_clip in (False, True):
            key = f"{group}+clip" if rerank_with_clip else group
            if rerank_with_clip:
                from neuron_descriptions_tpu.milan import rerankers
                factory = rerankers.DecoderWithCLIP.load
            else:
                factory = decoders.Decoder.load
            configs[key] = hubs.ModelConfig(
                factory,
                url=f'{hubs.HOST}/models/milan-{group.replace("/", "_")}.pth',
                requires_path=True,
                load_weights=False,
            )
    return hubs.ModelHub(**configs)


def pretrained(config: str = "base", **kwargs: Any) -> decoders.Decoder:
    """Return a pretrained MILAN model (reference: loaders.py:28-32)."""
    model = hub().load(config, **kwargs)
    assert isinstance(model, decoders.Decoder), model
    return model
