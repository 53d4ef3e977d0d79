"""Spurious-feature editing experiment (reference: experiments/edit.py).

Trains a CNN on a dataset with a spurious watermark (class text or color in
the corner), dissects it, captions every unit with MILAN, flags units whose
descriptions mention the spurious concept, and deletes them — measuring
val/test accuracy as units are removed under three orderings
(sort-spurious, sort-all, random).
"""
import argparse
import copy
import json
import pathlib
import pickle
import random
import shutil

from neuron_descriptions_tpu import exemplars, milan, milannotations
from neuron_descriptions_tpu.data import renormalize
from neuron_descriptions_tpu.utils import ablations, env, training

EXPERIMENTS = (
    exemplars.datasets.KEYS.IMAGENET_SPURIOUS_TEXT,
    exemplars.datasets.KEYS.IMAGENET_SPURIOUS_COLOR,
)

VERSIONS = ("original", "5pct", "10pct", "50pct", "100pct")

CONDITION_SORT_SPURIOUS = "sort-spurious"
CONDITION_SORT_ALL = "sort-all"
CONDITION_RANDOM = "random"
CONDITIONS = (CONDITION_SORT_SPURIOUS, CONDITION_SORT_ALL, CONDITION_RANDOM)


def main() -> None:
    parser = argparse.ArgumentParser(
        description="certify a cnn trained on bad data")
    parser.add_argument("--experiments", choices=EXPERIMENTS,
                        default=(EXPERIMENTS[0],), nargs="+")
    parser.add_argument("--versions", choices=VERSIONS, default=("50pct",),
                        nargs="+")
    parser.add_argument("--conditions", choices=CONDITIONS,
                        default=CONDITIONS, nargs="+")
    parser.add_argument("--cnn", choices=("alexnet", "resnet18"),
                        default="resnet18")
    parser.add_argument("--milan", default="base")
    parser.add_argument("--milan-file", type=pathlib.Path,
                        help="milan payload file (default: hub download)")
    parser.add_argument("--n-random-trials", type=int, default=5)
    parser.add_argument("--fine-tune", action="store_true",
                        help="fine tune last fully-connected cnn layers")
    parser.add_argument("--no-mi", action="store_true")
    parser.add_argument("--data-dir", type=pathlib.Path)
    parser.add_argument("--results-dir", type=pathlib.Path)
    parser.add_argument("--clear-results-dir", action="store_true")
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--patience", type=int, default=4)
    parser.add_argument("--hold-out", type=float, default=0.1)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--ablation-min", type=int, default=0)
    parser.add_argument("--ablation-max", type=int, default=50)
    parser.add_argument("--ablation-step-size", type=int, default=1)
    args = parser.parse_args()

    import optax

    data_dir = args.data_dir or env.data_dir()
    results_dir = args.results_dir or (env.results_dir() / "edit")
    if args.clear_results_dir and results_dir.exists():
        shutil.rmtree(results_dir)
    results_dir.mkdir(exist_ok=True, parents=True)

    decoder = milan.pretrained(args.milan, path=args.milan_file)

    for experiment in args.experiments:
        experiment_dir = results_dir / experiment
        experiment_dir.mkdir(exist_ok=True, parents=True)
        log_file = experiment_dir / "log.jsonl"

        if experiment == exemplars.datasets.KEYS.IMAGENET_SPURIOUS_TEXT:
            target_words = ("word", "text", "letter")
        else:
            target_words = ("red", "yellow", "green", "blue", "cyan",
                            "purple", "brown", "black", "white", "gray")

        for version in args.versions:
            print(f"\n---- BEGIN EXPERIMENT: {experiment}/{version} ----")

            dataset = exemplars.datasets.load(
                experiment, factory=training.PreloadedImageFolder,
                path=data_dir / experiment / version / "train")
            test = exemplars.datasets.load(
                experiment, factory=training.PreloadedImageFolder,
                path=data_dir / experiment / version / "test")

            splits_file = experiment_dir / "splits.pkl"
            if splits_file.exists():
                print(f"reading train/val split from {splits_file}")
                with splits_file.open("rb") as handle:
                    splits = pickle.load(handle)
                train, val = training.fixed_split(dataset, splits["val"])
            else:
                train, val = training.random_split(dataset,
                                                   hold_out=args.hold_out)
                print(f"saving train/val splits to {splits_file}")
                with splits_file.open("wb") as handle:
                    pickle.dump({"train": train.indices,
                                 "val": val.indices}, handle)

            cnn_model, layers, _ = exemplars.models.load(
                f"{args.cnn}/imagenet")
            cnn = ablations.ImageClassifier(cnn_model)

            cnn_file = experiment_dir / f"{args.cnn}-{version}.pkl"
            if cnn_file.exists():
                print(f"loading trained {args.cnn} from {cnn_file}")
                with cnn_file.open("rb") as handle:
                    import jax.numpy as jnp
                    cnn.model.params = {k: jnp.asarray(v) for k, v in
                                        pickle.load(handle).items()}
            else:
                cnn.fit(dataset, hold_out=val.indices,
                        batch_size=args.batch_size, max_epochs=args.epochs,
                        patience=args.patience,
                        optimizer=optax.adamw(args.lr),
                        display_progress_as=f"train {args.cnn}")
                print(f"saving trained {args.cnn} to {cnn_file}")
                import numpy as np
                with cnn_file.open("wb") as handle:
                    pickle.dump({k: np.asarray(v) for k, v in
                                 cnn.model.params.items()}, handle)

            # Dissect the trained model on the validation set.
            dissection_dir = experiment_dir / f"{args.cnn}-{version}"
            for layer in layers:
                print(f"dissecting: {layer}")
                exemplars.compute.discriminative(
                    cnn.model.apply, cnn.model.params, val, layer=layer,
                    results_dir=dissection_dir,
                    tally_cache_file=dissection_dir / str(layer) /
                    "tally.npz",
                    masks_cache_file=dissection_dir / str(layer) /
                    "masks.npz",
                    image_size=224,
                    renormalizer=renormalize.renormalizer(
                        source="imagenet", target="byte"))
            dissected = milannotations.datasets.TopImagesDataset(
                dissection_dir)

            descriptions_file = (experiment_dir /
                                 f"{args.cnn}-{version}-descs.txt")
            if descriptions_file.exists():
                print(f"loading descriptions from {descriptions_file}")
                descriptions = descriptions_file.read_text().split("\n")
                assert len(descriptions) == len(dissected)
            else:
                descriptions = decoder.predict(
                    dissected,
                    strategy="beam" if args.no_mi else "rerank",
                    mi=False if args.no_mi else None,
                    temperature=0.2, beam_size=50)
                print(f"saving descriptions to {descriptions_file}")
                descriptions_file.write_text("\n".join(descriptions))

            candidate_indices = [
                index for index, description in enumerate(descriptions)
                if any(word in description.lower()
                       for word in target_words)
            ]
            candidates_file = (experiment_dir /
                               f"{args.cnn}-{version}-units.json")
            print(f"found {len(candidate_indices)} candidate units; "
                  f"saving to {candidates_file}")
            candidates_file.write_text(json.dumps(candidate_indices))

            # Per-unit importance: val accuracy with just that unit cut.
            scores = None
            if {CONDITION_SORT_SPURIOUS,
                    CONDITION_SORT_ALL} & set(args.conditions):
                scores_file = (experiment_dir /
                               f"{args.cnn}-{version}-scores.json")
                if scores_file.exists():
                    print(f"loading unit scores from {scores_file}")
                    scores = json.loads(scores_file.read_text())
                else:
                    scores = [
                        cnn.accuracy(val,
                                     ablate=[dissected.unit(index)],
                                     display_progress_as=None)
                        for index in range(len(dissected))
                    ]
                    print(f"saving unit scores to {scores_file}")
                    scores_file.write_text(json.dumps(scores))

            for condition in args.conditions:
                trials = (args.n_random_trials
                          if condition == CONDITION_RANDOM else 1)
                for trial in range(1, trials + 1):
                    if condition == CONDITION_SORT_SPURIOUS:
                        indices = sorted(candidate_indices,
                                         key=scores.__getitem__,
                                         reverse=True)
                    elif condition == CONDITION_SORT_ALL:
                        indices = sorted(
                            range(len(dissected)),
                            key=scores.__getitem__,
                            reverse=True)[:len(candidate_indices)]
                    else:
                        indices = random.sample(
                            range(len(dissected)),
                            k=len(candidate_indices))

                    ns_to_ablate = range(
                        args.ablation_min,
                        args.ablation_max or len(candidate_indices),
                        args.ablation_step_size)
                    for n_ablated in ns_to_ablate:
                        ablated_indices = indices[:n_ablated]
                        copied = copy.deepcopy(cnn)
                        if args.fine_tune:
                            copied.fit(
                                dataset, hold_out=val.indices,
                                batch_size=args.batch_size,
                                max_epochs=args.epochs,
                                patience=args.patience,
                                optimizer=optax.adamw(args.lr),
                                ablate=dissected.units(ablated_indices),
                                layers=["fc"] if args.cnn == "resnet18"
                                else ["classifier"],
                                display_progress_as=None)
                        accuracies = {
                            key: copied.accuracy(
                                evaluation,
                                ablate=dissected.units(ablated_indices),
                                display_progress_as=None)
                            for key, evaluation in (("val", val),
                                                    ("test", test))
                        }
                        log = {
                            "experiment": experiment,
                            "version": version,
                            "condition": condition,
                            "trial": trial,
                            "n_ablated": n_ablated,
                            **accuracies,
                        }
                        with log_file.open("a") as handle:
                            handle.write(json.dumps(log) + "\n")
                        print(log)


if __name__ == "__main__":
    main()
