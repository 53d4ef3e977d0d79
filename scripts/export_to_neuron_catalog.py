"""Export top images and descriptions as a neuron-catalog JSON tree
(reference: scripts/export_to_neuron_catalog.py)."""
import argparse
import json
import pathlib
import shutil
from typing import Dict

from neuron_descriptions_tpu import milan, milannotations
from neuron_descriptions_tpu.milannotations import datasets
from neuron_descriptions_tpu.utils import env

SOURCES = tuple(
    f"{arch}/{dataset}"
    for arch in ("densenet121", "densenet201", "mobilenet_v2",
                 "shufflenet_v2_x1_0", "squeezenet1_0", "vgg11", "vgg13",
                 "vgg16", "vgg19")
    for dataset in ("imagenet", "imagenet-blurred"))


def main() -> None:
    parser = argparse.ArgumentParser(description="export descriptions")
    parser.add_argument("--data-dir", type=pathlib.Path,
                        help="root dir for datasets "
                        "(default: project data dir)")
    parser.add_argument("--results-dir", type=pathlib.Path,
                        help="root dir for intermediate and final results "
                        "(default: project results dir)")
    parser.add_argument("--clear-results-dir", action="store_true")
    parser.add_argument("--sources", nargs="+", default=SOURCES,
                        help="models to describe and export (default: all)")
    parser.add_argument("--milan", default=milannotations.KEYS.BASE,
                        help="milan model to use (default: base)")
    parser.add_argument("--base-url",
                        default="https://unitname.csail.mit.edu/catalog",
                        help="base url for images (default: csail url)")
    parser.add_argument("--no-save-images", action="store_true",
                        help="do not save top images")
    args = parser.parse_args()

    data_dir = args.data_dir or env.data_dir()
    results_dir = args.results_dir or (env.results_dir() / "export")
    if args.clear_results_dir and results_dir.exists():
        shutil.rmtree(results_dir)
    results_dir.mkdir(exist_ok=True, parents=True)

    decoder = milan.pretrained(args.milan)

    data: Dict[str, datasets.TopImagesDataset] = {}
    for key in args.sources:
        dataset = milannotations.load(key,
                                      factory=datasets.TopImagesDataset,
                                      path=data_dir / key)
        assert isinstance(dataset, datasets.TopImagesDataset)
        data[key] = dataset

    descriptions = {}
    for key in args.sources:
        descriptions_file = (
            results_dir / f'cache/{key.replace("/", "_")}_descriptions.csv')
        if descriptions_file.exists():
            print(f"reading {key} descriptions from {descriptions_file}")
            with descriptions_file.open("r") as handle:
                descriptions[key] = tuple(handle.read().split("\n"))
        else:
            predictions = decoder.predict(data[key], strategy="rerank",
                                          temperature=0.2, beam_size=50)
            print(f"writing {key} descriptions to {descriptions_file}")
            descriptions_file.parent.mkdir(exist_ok=True, parents=True)
            with descriptions_file.open("w") as handle:
                handle.write("\n".join(predictions))
            descriptions[key] = tuple(predictions)

    json_dir = results_dir / "json"
    images_dir = results_dir / "images"
    for key, dataset in data.items():
        name = key.replace("/", "_")
        arch = key.split("/")[0]
        exported = {
            "name": name,
            "architecture": arch,
            "dataset": key[len(arch) + 1:],
            "layers": dataset.layers,
            "units": [],
        }

        model_images_dir = images_dir / name
        if not args.no_save_images:
            model_images_dir.mkdir(exist_ok=True, parents=True)
        for index in range(len(dataset)):
            sample = dataset[index]
            layer, unit = sample.layer, sample.unit
            image_files = []
            for position, image in enumerate(sample.as_pil_images()):
                image_file = (model_images_dir /
                              f"{layer}_{unit}_{position}.png")
                if not args.no_save_images:
                    image.save(image_file)
                image_files.append(image_file)
            exported["units"].append({
                "layer": layer,
                "unit": unit,
                "images": [f"{args.base_url}/{name}/{f.name}"
                           for f in image_files],
                "description": descriptions[key][index],
            })

        model_json_file = json_dir / name / "data.json"
        model_json_file.parent.mkdir(exist_ok=True, parents=True)
        with model_json_file.open("w") as handle:
            json.dump(exported, handle)


if __name__ == "__main__":
    main()
