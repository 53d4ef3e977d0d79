"""Caption the whole blurred-vs-normal model zoo
(reference: experiments/audit.py)."""
import argparse
import csv
import pathlib
import shutil

from neuron_descriptions_tpu import milan, milannotations
from neuron_descriptions_tpu.utils import env

KEYS = milannotations.KEYS
CNNS = tuple(
    f"{arch}/{dataset}"
    for arch in ("densenet121", "densenet201", "mobilenet_v2", "resnet18",
                 "resnet34", "resnet50", "squeezenet1_0",
                 "shufflenet_v2_x1_0", "vgg11", "vgg13", "vgg16", "vgg19")
    for dataset in ("imagenet", "imagenet-blurred"))


def main() -> None:
    parser = argparse.ArgumentParser(
        description="audit cnns by captioning all neurons")
    parser.add_argument("--milan", default="base",
                        help="milan config to use (default: base)")
    parser.add_argument("--cnns", nargs="+", choices=CNNS, default=CNNS,
                        help="models to audit (default: all)")
    parser.add_argument(
        "--data-dir", type=pathlib.Path,
        help="root dir containing models to audit "
        "(default: <project data dir> / <cnn key>)")
    parser.add_argument(
        "--results-dir", type=pathlib.Path,
        help="root dir for intermediate and final results "
        "(default: project results dir)")
    parser.add_argument("--clear-results-dir", action="store_true")
    args = parser.parse_args()

    decoder = milan.pretrained(args.milan)

    results_dir = args.results_dir or (env.results_dir() / "audit")
    if args.clear_results_dir and results_dir.exists():
        shutil.rmtree(results_dir)
    results_dir.mkdir(exist_ok=True, parents=True)

    for key in args.cnns:
        print(f"---- audit {key} ----")

        captions_file = results_dir / f'{key.replace("/", "-")}-captions.csv'
        if captions_file.exists():
            print(f"found captions file at {captions_file}; skipping")
            continue

        path = args.data_dir / key if args.data_dir is not None else None
        dataset = milannotations.load(key, path=path)

        predictions = decoder.predict(dataset, strategy="rerank",
                                      temperature=0.2, beam_size=50)

        rows = [("layer", "unit", "caption")]
        for index, caption in enumerate(predictions):
            sample = dataset[index]
            rows.append((sample.layer, str(sample.unit), caption))
        print(f"saving captions to {captions_file}")
        with captions_file.open("w") as handle:
            csv.writer(handle).writerows(rows)


if __name__ == "__main__":
    main()
