"""Tests for payload serialization, incl. torch-zip + stubbed unpickling."""
import sys
import types

import numpy as np
import pytest

from neuron_descriptions_tpu.utils import serialize


class Child(serialize.Serializable):

    def __init__(self, value=1):
        self.value = value

    def properties(self):
        return {"value": self.value}


class Parent(serialize.SerializableParams):

    def __init__(self, child=None, name="p", state_dict=None):
        self.child = child
        self.name = name
        self.weight = np.zeros((2,))
        if state_dict is not None:
            self.weight = np.asarray(state_dict["weight"])

    def properties(self):
        return {"child": self.child, "name": self.name}

    def state_dict(self):
        return {"weight": self.weight}

    @classmethod
    def resolve(cls, children):
        return {"child": Child}


def test_nested_children_serialize_without_state_dicts():
    parent = Parent(child=Child(7))
    payload = parent.serialize()
    assert set(payload) == {"properties", "children", "state_dict"}
    assert "state_dict" not in payload["properties"]["child"]
    rebuilt = Parent.deserialize(payload)
    assert rebuilt.child.value == 7
    np.testing.assert_array_equal(rebuilt.weight, parent.weight)


def test_save_load_round_trip(tmp_path):
    parent = Parent(child=Child(3))
    parent.weight = np.asarray([1.0, 2.0])
    file = tmp_path / "parent.pth"
    parent.save(file)
    rebuilt = Parent.load(file)
    np.testing.assert_array_equal(rebuilt.weight, [1.0, 2.0])
    assert rebuilt.child.value == 3


def test_torch_zip_payload_ingestion(tmp_path):
    torch = pytest.importorskip("torch")
    file = tmp_path / "torch.pth"
    torch.save({"properties": {"name": "x"}, "children": {},
                "state_dict": {"weight": torch.ones(2)}}, file)
    payload = serialize.load_payload(file)
    np.testing.assert_array_equal(payload["state_dict"]["weight"], [1, 1])


def test_torch_payload_with_missing_package_classes(tmp_path):
    """Published milan payloads embed pickled spaCy objects; loading must
    stub classes from absent packages rather than crash
    (reference payload structure: src/utils/serialize.py:104-107)."""
    torch = pytest.importorskip("torch")

    # Fabricate a class from a fake package, pickle it, then delete the
    # package so unpickling cannot import it.
    fake = types.ModuleType("fakespacy")

    class Pipeline:
        def __init__(self):
            self.kind = "en"

    Pipeline.__module__ = "fakespacy"
    Pipeline.__qualname__ = "Pipeline"
    fake.Pipeline = Pipeline
    sys.modules["fakespacy"] = fake
    file = tmp_path / "payload.pth"
    torch.save({
        "properties": {
            "tokenize": {"properties": {"nlp": (Pipeline(), b"bytes"),
                                        "lemmatize": False},
                         "children": {}},
        },
        "children": {},
        "state_dict": {"weight": torch.zeros(1)},
    }, file)
    del sys.modules["fakespacy"]

    payload = serialize.load_payload(file)
    nlp_blob = payload["properties"]["tokenize"]["properties"]["nlp"]
    assert nlp_blob[1] == b"bytes"  # opaque object survived as a stub
    np.testing.assert_array_equal(payload["state_dict"]["weight"], [0.0])
