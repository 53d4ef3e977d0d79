"""Download the blurred-ILSVRC model zoo from Google Drive
(reference: scripts/dl_blurred_ilsvrc_models.py).

Requires the optional ``gdown`` package for the Drive fetch; the
DataParallel ``module.``-prefix remap runs on plain pickles via the
serialization layer (no torch dependency for the rewrite itself).
"""
import argparse
import pathlib
import pickle
from typing import Dict

from neuron_descriptions_tpu import milannotations
from neuron_descriptions_tpu.utils import env

GDRIVE_BASE_URL = "https://drive.google.com/uc?id="
GDRIVE_IDS = {
    milannotations.KEYS.ALEXNET: "1BmgExiP10P5j0irBiCf2TVwFpNnXTVOv",
    milannotations.KEYS.DENSENET121: "1yeKuiREpdl9ltyVQEcfzgAcjkfK9Punj",
    milannotations.KEYS.DENSENET201: "1s3lGJ8Lq67LVgpa9nArUnt-Augfnd7mP",
    milannotations.KEYS.MOBILENET_V2: "1DJIgaQVsRroY1TInBzqenXwXTQR6X4hk",
    milannotations.KEYS.RESNET18: "1woDKMm90armYrOZ9lfXTg-MWhWNA0eDD",
    milannotations.KEYS.RESNET34: "10Kqkr3ULhzV_llN6lgBfZ4TOd6uz-iDW",
    milannotations.KEYS.RESNET50: "1dmT7HVyTp8OwFEbgIDN6P5RNuvsLpWEC",
    milannotations.KEYS.RESNET101: "1tnG1gKRL2VrXMS_zD09KERFt9nbzuXq_",
    milannotations.KEYS.RESNET152: "1LxrgwDKijRqBAxy9odPqKRELASBLFBOa",
    milannotations.KEYS.SHUFFLENET_V2_X1_0:
        "1ifWeFumTS9Kjbvq0hm1hpVrJaYgJFg5Y",
    milannotations.KEYS.SQUEEZENET1_0:
        "15Ro0jRzpk9-5q_U-rKZlMpe4jHLg_jXi",
    milannotations.KEYS.VGG11: "1AhzaMsxTpM08Q22sp94aF2U-Xerd4uE5",
    milannotations.KEYS.VGG13: "1fyNnwpath6_BcfgtqaZ1DRnyZr4QhKFe",
    milannotations.KEYS.VGG16: "18hyyLVplUZUi2u1_Y-MYsJ5JL3aG7n3H",
    milannotations.KEYS.VGG19: "1FhvooAy-ahtX_vyoxwlmOi8VJlj7JE-j",
}


def main() -> None:
    parser = argparse.ArgumentParser(
        description="download blurred ilsvrc models")
    parser.add_argument("--models-dir", type=pathlib.Path,
                        help="save converted models to this directory")
    parser.add_argument("--no-cache", action="store_true",
                        help="force redownload models even if cached")
    args = parser.parse_args()

    try:
        import gdown
    except ImportError as error:
        raise RuntimeError(
            "this script needs the optional gdown package to fetch from "
            "Google Drive") from error

    models_dir = args.models_dir or env.models_dir()
    models_dir.mkdir(exist_ok=True, parents=True)

    downloaded_files: Dict[str, str] = {}
    for name, gdrive_id in GDRIVE_IDS.items():
        gdrive_url = GDRIVE_BASE_URL + gdrive_id
        if args.no_cache:
            downloaded_files[name] = gdown.download(gdrive_url)
        else:
            downloaded_files[name] = gdown.cached_download(gdrive_url)

    from neuron_descriptions_tpu.models import torch_import
    for name, file in downloaded_files.items():
        # These checkpoints were saved under DataParallel; strip the
        # "module." prefix and store flat numpy state dicts.
        weights = torch_import.load_state_dict(
            file, transform=lambda payload: payload["state_dict"])
        remapped = {key.replace("module.", ""): value
                    for key, value in weights.items()}

        # Hub resolution expects <models_dir>/<arch>/imagenet-blurred.pth
        # (ModelHub.load path = models_dir / "<name>.pth" with name
        # "<arch>/imagenet-blurred").
        model_file = (models_dir / name /
                      f"{milannotations.KEYS.IMAGENET_BLURRED}.pth")
        model_file.parent.mkdir(exist_ok=True, parents=True)
        print(f"saving {name} blurred imagenet model to {model_file}")
        with model_file.open("wb") as handle:
            pickle.dump(remapped, handle)


if __name__ == "__main__":
    main()
