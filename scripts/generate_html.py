"""Generate an HTML summary of top images and descriptions
(reference: scripts/generate_html.py)."""
import argparse
import csv
import pathlib

from neuron_descriptions_tpu import milan, milannotations
from neuron_descriptions_tpu.milannotations import datasets
from neuron_descriptions_tpu.utils import env, viz


def main() -> None:
    parser = argparse.ArgumentParser(
        description="generate html page of descriptions")
    parser.add_argument("milan", help="pretrained MILAN config (e.g. base)")
    parser.add_argument(
        "target", help="target model to describe (e.g. dino_vits8/imagenet)")
    parser.add_argument(
        "--results-dir", type=pathlib.Path,
        help="where to write html (default: project results dir)")
    parser.add_argument(
        "--base-url",
        default="https://unitname.csail.mit.edu/generated-html",
        help="base url for images (default: csail url)")
    parser.add_argument("--grid-images", action="store_true",
                        help="save images as grids")
    args = parser.parse_args()

    base_url = args.base_url.rstrip("/")

    decoder = milan.pretrained(args.milan)
    assert isinstance(decoder, milan.Decoder)

    if args.target in milannotations.DATASET_GROUPINGS:
        loaded = {}
        for key in milannotations.DATASET_GROUPINGS[args.target]:
            loaded[key] = milannotations.load(key)
    else:
        loaded = {args.target: milannotations.load(args.target)}
    for dataset in loaded.values():
        assert isinstance(dataset, (datasets.TopImagesDataset,
                                    datasets.AnnotatedTopImagesDataset))

    results_dir = args.results_dir or (env.results_dir() / "generated-html")
    results_dir.mkdir(exist_ok=True, parents=True)

    # Save images once per dataset, under a shared dir keyed by dataset.
    for key, dataset in loaded.items():
        images_subdir = f'images/{key.replace("/", "-")}'
        images_dir = results_dir / images_subdir
        if not images_dir.exists():
            images_dir.mkdir(exist_ok=True, parents=True)
            viz.generate_html(
                dataset, images_dir,
                get_base_url=lambda *_, subdir=images_subdir:
                f"{base_url}/{subdir}",
                include_gt=True, save_images=True,
                grid_images=args.grid_images)

    html_subdir = f'milan-{args.milan}/{args.target.replace("/", "-")}'
    html_dir = results_dir / html_subdir
    html_dir.mkdir(exist_ok=True, parents=True)

    # Concatenate all datasets, remembering each sample's source and its
    # index there so URLs resolve to the shared image dirs.
    key, dataset = next(iter(loaded.items()))
    keys = [key] * len(dataset)
    ids = list(range(len(dataset)))
    for other in loaded.keys() - {key}:
        dataset += loaded[other]
        keys += [other] * len(loaded[other])
        ids += range(len(loaded[other]))

    descriptions_file = html_dir / "descriptions.csv"
    if descriptions_file.exists():
        print(f"loading descriptions from {descriptions_file}")
        with descriptions_file.open("r") as handle:
            rows = tuple(csv.DictReader(handle))
        predictions = [row["description"] for row in rows]
    else:
        predictions = decoder.predict(dataset, strategy="rerank",
                                      temperature=0.2, beam_size=50)
        outputs = [("layer", "unit", "description")]
        for index, description in enumerate(predictions):
            sample = dataset[index]
            outputs.append((sample.layer, str(sample.unit), description))
        print(f"saving descriptions to {descriptions_file}")
        with descriptions_file.open("w") as handle:
            csv.writer(handle).writerows(outputs)

    viz.generate_html(
        dataset, html_dir,
        predictions=predictions,
        get_base_url=lambda _, index:
        f'{base_url}/images/{keys[index].replace("/", "-")}',
        get_unit_id=lambda _, index: ids[index],
        include_gt=True, save_images=False, grid_images=args.grid_images)


if __name__ == "__main__":
    main()
