"""Caption every unit of a model/dataset pair with pretrained MILAN
(reference: scripts/compute_milan_descriptions.py).

Usage: ``python -m scripts.compute_milan_descriptions <model> <dataset>``.
"""
import argparse
import csv
import pathlib

from neuron_descriptions_tpu import milan, milannotations
from neuron_descriptions_tpu.utils import env


def main() -> None:
    parser = argparse.ArgumentParser(
        description="compute milan descriptions")
    parser.add_argument("model", help="model architecture (e.g. alexnet)")
    parser.add_argument("dataset",
                        help="dataset model trained on (e.g. imagenet)")
    parser.add_argument("--temperature", type=float, default=0.2,
                        help="pmi temperature (default: .2)")
    parser.add_argument("--beam-size", type=int, default=50,
                        help="beam size to rerank (default: 50)")
    parser.add_argument("--batch-size", type=int, default=16,
                        help="units to caption at once (default: 16)")
    parser.add_argument(
        "--data-dir", type=pathlib.Path,
        help="root dir for datasets (default: project data dir)")
    parser.add_argument(
        "--results-dir", type=pathlib.Path,
        help="root dir for final results (default: <project results dir> / "
        "descriptions / model_dataset.csv)")
    parser.add_argument("--milan", default=milannotations.KEYS.BASE,
                        help="milan model to use (default: base)")
    parser.add_argument("--devices", type=int,
                        help="shard captioning over this many devices "
                        "(default: single device)")
    args = parser.parse_args()

    key = f"{args.model}/{args.dataset}"
    data_dir = args.data_dir or env.data_dir()
    data_root = data_dir / key

    results_dir = args.results_dir
    if results_dir is None:
        results_dir = env.results_dir() / "descriptions"
    results_dir.mkdir(exist_ok=True, parents=True)

    decoder = milan.pretrained(args.milan)
    dataset = milannotations.load(key, path=data_root)

    mesh = None
    if args.devices:
        from neuron_descriptions_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.default_mesh(args.devices)

    predictions = decoder.predict(dataset,
                                  strategy="rerank",
                                  temperature=args.temperature,
                                  beam_size=args.beam_size,
                                  batch_size=args.batch_size,
                                  mesh=mesh)

    rows = [("layer", "unit", "description")]
    for index, description in enumerate(predictions):
        sample = dataset[index]
        rows.append((str(sample.layer), str(sample.unit), description))
    results_csv_file = results_dir / f'{key.replace("/", "_")}.csv'
    with results_csv_file.open("w") as handle:
        csv.writer(handle).writerows(rows)
    print(f"wrote {len(rows) - 1} descriptions to {results_csv_file}")


if __name__ == "__main__":
    main()
