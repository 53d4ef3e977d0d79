"""MILAN model layer: encoders, decoder, language model, pretrained hub.

Mirrors the reference's public surface (reference: src/milan/__init__.py):
``Decoder``/``decoder``, ``Encoder``/``PyramidConvEncoder``/``encoder``,
``LanguageModel``/``lm``, and ``pretrained``.
"""
from neuron_descriptions_tpu.milan.decoders import (Decoder, DecoderOutput,
                                                    decoder)
from neuron_descriptions_tpu.milan.encoders import (Encoder,
                                                    PyramidConvEncoder,
                                                    SpatialConvEncoder,
                                                    encoder)
from neuron_descriptions_tpu.milan.lms import LanguageModel, lm
from neuron_descriptions_tpu.milan.loaders import pretrained

__all__ = [
    "Decoder",
    "DecoderOutput",
    "decoder",
    "Encoder",
    "PyramidConvEncoder",
    "SpatialConvEncoder",
    "encoder",
    "LanguageModel",
    "lm",
    "pretrained",
]
