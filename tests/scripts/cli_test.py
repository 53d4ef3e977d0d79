"""CLI smoke tests: arg surface of every script + one end-to-end run.

Mirrors the reference's scripts/ surface (reference: scripts/, README
usage), which the reference itself leaves untested.
"""
import csv
import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[2]

SCRIPTS = (
    "compute_exemplars",
    "compute_milan_descriptions",
    "train_milan",
    "sweep_milan",
    "generate_biggan_zs",
    "export_biggan_zs",
    "export_milannotations",
    "generate_html",
    "export_to_neuron_catalog",
    "dl_blurred_ilsvrc_models",
    "mturk_generate_hits",
    "mturk_strip_results",
    "mturk_upload_qualification",
)


def _run(args, env_extra=None, timeout=420):
    import os
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["JAX_PLATFORMS"] = "cpu"
    env.update(env_extra or {})
    return subprocess.run([sys.executable, "-m", *args], cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


@pytest.mark.parametrize("script", SCRIPTS)
def test_script_help(script):
    proc = _run([f"scripts.{script}", "--help"], timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "usage" in proc.stdout.lower()


def test_generate_biggan_zs(tmp_path):
    proc = _run(["scripts.generate_biggan_zs", "places365",
                 str(tmp_path / "zs"), "-n", "16"], timeout=180)
    assert proc.returncode == 0, proc.stderr[-2000:]
    zs = np.load(tmp_path / "zs" / "zs.npy")
    ys = np.load(tmp_path / "zs" / "ys.npy")
    assert zs.shape == (16, 140)
    assert ys.shape == (16,) and ys.max() < 365


def test_compute_exemplars_end_to_end(tmp_path):
    """Full CLI run on a tiny ImageFolder, loading weights from the hub's
    default path (missing weight files fail loudly, so the test stages a
    checkpoint at <models_dir>/alexnet/imagenet-blurred.pth)."""
    import pickle

    import jax

    from PIL import Image
    from neuron_descriptions_tpu.models import alexnet

    rng = np.random.default_rng(0)
    for cls in ("a", "b"):
        d = tmp_path / "imagefolder" / cls
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray((rng.random((64, 64, 3)) * 255).astype(
                np.uint8)).save(d / f"{i}.jpg")

    weights_file = (tmp_path / "models" / "alexnet" /
                    "imagenet-blurred.pth")
    weights_file.parent.mkdir(parents=True)
    weights = {name: np.asarray(value) for name, value in
               alexnet.init(jax.random.PRNGKey(7)).items()}
    with weights_file.open("wb") as handle:
        pickle.dump(weights, handle)

    proc = _run(
        ["scripts.compute_exemplars", "alexnet", "imagenet-blurred",
         "--dataset-path", str(tmp_path / "imagefolder"),
         "--layer-names", "features.0", "--units", "2", "--no-viz",
         "--num-workers", "0"],
        env_extra={
            "MILAN_DATA_DIR": str(tmp_path / "data"),
            "MILAN_MODELS_DIR": str(tmp_path / "models"),
            "MILAN_RESULTS_DIR": str(tmp_path / "results"),
        })
    assert proc.returncode == 0, proc.stderr[-3000:]

    rdir = (tmp_path / "results" / "exemplars" / "alexnet" /
            "imagenet-blurred" / "features.0")
    images = np.load(rdir / "images.npy")
    assert images.shape[:2] == (2, 15)
    assert images.dtype == np.uint8
    with (rdir / "ids.csv").open() as handle:
        rows = list(csv.reader(handle))
    assert len(rows) == 2
    # Results linked into the data dir (reference:
    # scripts/compute_exemplars.py:124-125).
    assert (tmp_path / "data" / "alexnet" / "imagenet-blurred").is_symlink()
