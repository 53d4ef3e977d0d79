"""Subject-model zoo: pure JAX functions over torch-keyed parameter dicts.

Every model is ``apply(params, images) -> (outputs, {layer: activations})``
— intermediates are returned, not hooked, which is the TPU-idiomatic
replacement for the reference's ``nethook.InstrumentedModel`` pattern
(reference: src/deps/netdissect/nethook.py:16-136; SURVEY.md §7).
"""
from neuron_descriptions_tpu.models import (alexnet, biggan, densenet,
                                            mobilenet, nn, resnet,
                                            shufflenet, squeezenet,
                                            torch_import, vgg, vit)

__all__ = ["alexnet", "biggan", "densenet", "mobilenet", "nn", "resnet",
           "shufflenet", "squeezenet", "torch_import", "vgg", "vit"]
