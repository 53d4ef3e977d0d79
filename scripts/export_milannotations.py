"""Package MILANNOTATIONS zips, dropping non-redistributable images
(reference: scripts/export_milannotations.py)."""
import argparse
import pathlib
import re
import shutil
import tempfile

from neuron_descriptions_tpu.utils import env


def main() -> None:
    parser = argparse.ArgumentParser(description="zip up milannotations")
    parser.add_argument("--data-dir", type=pathlib.Path,
                        help="data dir (default: project data dir)")
    parser.add_argument("--results-dir", type=pathlib.Path,
                        help="results dir (default: project results dir)")
    parser.add_argument(
        "--exclude-images", nargs="+",
        default=(".*(net|vgg|dino).*imagenet.*",),
        help="do not include source images when dataset matches regex")
    parser.add_argument(
        "--exclude-targets", nargs="+",
        default=(r"imagenet.*", r"places365.*"),
        help="do not package dirs matching this regex")
    parser.add_argument(
        "--targets", nargs="+",
        help="prespecified targets (default: read from data dir)")
    args = parser.parse_args()

    data_dir = args.data_dir or env.data_dir()
    results_dir = args.results_dir or (env.results_dir() /
                                       "export-milannotations")
    results_dir.mkdir(exist_ok=True, parents=True)

    if args.targets:
        targets = [data_dir / target for target in args.targets]
        for target in targets:
            if not target.is_dir():
                raise FileNotFoundError(f"target not found: {target}")
    else:
        tops = [t for t in data_dir.iterdir() if t.is_dir()]
        targets = [top / sub for top in tops for sub in top.iterdir()
                   if (top / sub).is_dir()]
        exclude_targets = [re.compile(exclude)
                           for exclude in args.exclude_targets]
        targets = [
            target for target in targets
            if not any(exclude.match(str(target.relative_to(data_dir)))
                       for exclude in exclude_targets)
        ]

    names = "\n\t".join(str(t.relative_to(data_dir)) for t in targets)
    print(f"found {len(targets)} export targets:\n\t{names}")

    exclude_images = [re.compile(exclude)
                      for exclude in args.exclude_images]

    for target in targets:
        arch, dataset = target.parent.name, target.name
        name = f"{arch}-{dataset}"
        print(f"exporting {name}")
        with tempfile.TemporaryDirectory(prefix=name) as tempdir:
            temp_out_dir = pathlib.Path(tempdir)

            src_annotations = target / "annotations.csv"
            if src_annotations.exists():
                shutil.copy(src_annotations,
                            temp_out_dir / src_annotations.name)

            for layer_dir in target.iterdir():
                if not layer_dir.is_dir():
                    continue
                for file_name in ("masks.npy", "ids.csv"):
                    src_file = layer_dir / file_name
                    if not src_file.exists():
                        raise FileNotFoundError(
                            f"missing required file: {src_file}")
                    dst_file = temp_out_dir / layer_dir.name / file_name
                    dst_file.parent.mkdir(exist_ok=True, parents=True)
                    shutil.copy(src_file, dst_file)

                # ImageNet source images cannot be redistributed; drop them
                # for matching datasets (the ids.csv remains for merging).
                if not any(ex.match(dataset) for ex in exclude_images):
                    src_file = layer_dir / "images.npy"
                    dst_file = temp_out_dir / layer_dir.name / "images.npy"
                    dst_file.parent.mkdir(exist_ok=True, parents=True)
                    shutil.copy(src_file, dst_file)

            shutil.make_archive(str(results_dir / name), "zip",
                                root_dir=temp_out_dir)


if __name__ == "__main__":
    main()
