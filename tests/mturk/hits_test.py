"""Tests for mturk HIT generation and results stripping."""
import csv

import numpy as np
import pytest

from neuron_descriptions_tpu.mturk import hits, qualification


class FakeTopImagesDataset:

    class Sample:

        def __init__(self, layer, unit):
            self.layer = layer
            self.unit = unit

    def __init__(self):
        self.samples = [self.Sample("layer0", 0), self.Sample("layer0", 1),
                        self.Sample("layer1", 0)]
        self.k = 3


def test_generate_hits_csv(tmp_path):
    dataset = FakeTopImagesDataset()
    csv_file = tmp_path / "hits.csv"

    def generate_urls(layer, unit, k):
        return [f"https://x.test/{layer}/{unit}/{i}.png" for i in range(k)]

    hits.generate_hits_csv(dataset, csv_file, generate_urls,
                           validate_urls=False)
    with csv_file.open() as handle:
        rows = list(csv.reader(handle))
    assert rows[0] == ["layer", "unit", "image_url_1", "image_url_2",
                       "image_url_3"]
    assert len(rows) == 4
    assert rows[1][:2] == ["layer0", "0"]
    assert rows[1][2].endswith("/layer0/0/0.png")


def test_generate_hits_csv_too_many_urls(tmp_path):
    dataset = FakeTopImagesDataset()
    with pytest.raises(ValueError):
        hits.generate_hits_csv(
            dataset, tmp_path / "hits.csv",
            lambda layer, unit, k: ["u"] * (k + 1), validate_urls=False)


def _write_results(tmp_path, rows):
    path = tmp_path / "results.csv"
    header = ["Input.layer", "Input.unit", "Answer.summary",
              "RejectionTime", "WorkerId"]
    with path.open("w") as handle:
        writer = csv.writer(handle)
        writer.writerow(header)
        writer.writerows(rows)
    return path


def test_strip_results_csv(tmp_path):
    path = _write_results(tmp_path, [
        ["layer0", "0", "These are Dogs playing.", "", "w1"],
        ["layer0", "1", "rejected annotation", "2021-01-01", "w1"],
        ["layer1", "2", "blue skies", "", "w2"],
    ])
    out = tmp_path / "stripped.csv"
    hits.strip_results_csv(path, out_csv_file=out, spellcheck=False,
                           remove_prefixes=("these are ",),
                           remove_suffixes=(".",))
    with out.open() as handle:
        rows = list(csv.reader(handle))
    assert rows[0] == ["layer", "unit", "summary"]
    assert rows[1] == ["layer0", "0", "dogs playing"]
    # Rejected HIT dropped.
    assert len(rows) == 3
    assert rows[2] == ["layer1", "2", "blue skies"]


def test_strip_results_csv_transforms(tmp_path):
    path = _write_results(tmp_path, [
        ["layer0", "0", "a dog", "", "w1"],
        ["layer0", "1", "a dog", "", "w2"],
    ])
    out = tmp_path / "out.csv"
    hits.strip_results_csv(
        path, out_csv_file=out, spellcheck=False,
        transform_annotation=lambda anno, row:
        anno + "!" if row["WorkerId"] == "w2" else anno)
    with out.open() as handle:
        rows = list(csv.reader(handle))
    assert rows[1][2] == "a dog"
    assert rows[2][2] == "a dog!"


def test_strip_results_csv_missing_column(tmp_path):
    path = tmp_path / "bad.csv"
    with path.open("w") as handle:
        csv.writer(handle).writerows([["a", "b"], ["1", "2"]])
    with pytest.raises(KeyError):
        hits.strip_results_csv(path, spellcheck=False)


@pytest.fixture
def qualification_config(tmp_path):
    yaml_text = """
title: Test qualification
instructions: Answer the questions.
questions:
  - id: q1
    image_urls:
      - https://x.test/1.png
    options:
      - dogs
      - cats
    answer_index: 0
  - id: q2
    image_urls:
      - https://x.test/2.png
      - https://x.test/3.png
    options:
      - red thing
      - blue thing
    answer_index: 1
"""
    path = tmp_path / "config.yaml"
    path.write_text(yaml_text)
    return path


def test_parse_yaml_config(qualification_config):
    pytest.importorskip("yaml")
    config = qualification.parse_yaml_config(qualification_config,
                                             validate_urls=False)
    assert config.title == "Test qualification"
    assert len(config.questions) == 2
    assert config.questions[1].answer_index == 1


def test_qualification_xml(qualification_config):
    pytest.importorskip("yaml")
    config = qualification.parse_yaml_config(qualification_config,
                                             validate_urls=False)
    questions_xml = qualification.generate_questions_xml(config)
    assert "<QuestionForm" in questions_xml
    assert "q1" in questions_xml and "blue_thing" in questions_xml

    answers_xml = qualification.generate_answers_xml(config)
    assert "<AnswerKey" in answers_xml
    assert "<MaximumSummedScore>2</MaximumSummedScore>" in answers_xml
    assert "blue_thing" in answers_xml

    html = qualification.generate_mockup_html(config)
    assert "Test qualification" in html


def test_parse_yaml_config_validation(tmp_path):
    pytest.importorskip("yaml")
    path = tmp_path / "bad.yaml"
    path.write_text("title: x\ninstructions: y\nquestions: []\n")
    with pytest.raises(ValueError):
        qualification.parse_yaml_config(path, validate_urls=False)
