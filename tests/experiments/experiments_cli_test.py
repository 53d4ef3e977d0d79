"""Smoke tests for the experiments entry points (arg surface + helpers)."""
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[2]

EXPERIMENTS = ("generalization", "baselines", "analyze", "edit", "audit")


@pytest.mark.parametrize("experiment", EXPERIMENTS)
def test_experiment_help(experiment):
    import os
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-m", f"experiments.{experiment}", "--help"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "usage" in proc.stdout.lower()


def test_analyze_score_descriptions():
    from experiments.analyze import score_descriptions
    descriptions = ["a dog", "a very long description about water and sky"]
    lengths = score_descriptions("description-length", descriptions)
    assert lengths[1] > lengths[0]
    randoms = score_descriptions("random", descriptions, seed=1)
    assert len(randoms) == 2


def test_analyze_spacy_scorers_gated():
    from experiments.analyze import score_descriptions
    try:
        import spacy  # noqa: F401
        pytest.skip("spacy present; gating not exercised")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="spaCy"):
        score_descriptions("n-nouns", ["a dog"])


def test_generalization_experiment_table():
    from experiments.generalization import (EXPERIMENT_WITHIN_NETWORK,
                                            EXPERIMENTS)
    assert len(EXPERIMENTS) == 6
    assert len(EXPERIMENTS[EXPERIMENT_WITHIN_NETWORK]) == 6
    assert len(EXPERIMENTS["leave-one-out"]) == 6
