"""MILAN generalization experiments (reference: experiments/generalization.py).

Trains a fresh captioner per train/test split (within-network,
across-network/-dataset/-task/-arch, leave-one-out), five trials each, and
scores BLEU/ROUGE (and BERTScore when a local model is available). wandb is
optional: without it, metrics append to ``<results-dir>/log.jsonl``.
"""
import argparse
import json
import pathlib
import pickle
import shutil
from typing import NamedTuple

from neuron_descriptions_tpu import milan, milannotations
from neuron_descriptions_tpu.utils import env, training, viz


class LoadedSplit(NamedTuple):
    """A loaded train/test split and its metadata
    (reference: generalization.py:18-24)."""

    train: object
    test: object
    train_key: object
    test_key: object


KEYS = milannotations.KEYS

EXPERIMENT_WITHIN_NETWORK = "within-network"
EXPERIMENT_ACROSS_NETWORK = "across-network"
EXPERIMENT_ACROSS_DATASET = "across-dataset"
EXPERIMENT_ACROSS_TASK = "across-task"
EXPERIMENT_ACROSS_ARCH = "across-arch"
EXPERIMENT_LEAVE_ONE_OUT = "leave-one-out"
EXPERIMENTS = {
    EXPERIMENT_WITHIN_NETWORK: (
        KEYS.ALEXNET_IMAGENET,
        KEYS.ALEXNET_PLACES365,
        KEYS.RESNET152_IMAGENET,
        KEYS.RESNET152_PLACES365,
        KEYS.BIGGAN_IMAGENET,
        KEYS.BIGGAN_PLACES365,
    ),
    EXPERIMENT_ACROSS_NETWORK: ((KEYS.ALEXNET, KEYS.RESNET152),),
    EXPERIMENT_ACROSS_DATASET: ((KEYS.IMAGENET, KEYS.PLACES365),),
    EXPERIMENT_ACROSS_TASK: ((KEYS.CLASSIFIERS, KEYS.GENERATORS),),
    EXPERIMENT_ACROSS_ARCH: ((KEYS.BASE, KEYS.DINO_VITS8_IMAGENET),),
    EXPERIMENT_LEAVE_ONE_OUT: (
        (KEYS.NOT_ALEXNET_IMAGENET, KEYS.ALEXNET_IMAGENET),
        (KEYS.NOT_ALEXNET_PLACES365, KEYS.ALEXNET_PLACES365),
        (KEYS.NOT_RESNET152_IMAGENET, KEYS.RESNET152_IMAGENET),
        (KEYS.NOT_RESNET152_PLACES365, KEYS.RESNET152_PLACES365),
        (KEYS.NOT_BIGGAN_IMAGENET, KEYS.BIGGAN_IMAGENET),
        (KEYS.NOT_BIGGAN_PLACES365, KEYS.BIGGAN_PLACES365),
    ),
}


def main() -> None:
    parser = argparse.ArgumentParser(
        description="run generalization experiments")
    parser.add_argument("--experiments", nargs="+",
                        help="experiments to run (default: all experiments)")
    parser.add_argument("--trials", type=int, default=5,
                        help="repeat each experiment this many times")
    parser.add_argument("--data-dir", type=pathlib.Path,
                        help="root dir for datasets "
                        "(default: project data dir)")
    parser.add_argument("--results-dir", type=pathlib.Path,
                        help="root dir for all results "
                        "(default: project results dir)")
    parser.add_argument("--clear-results-dir", action="store_true")
    parser.add_argument("--hold-out", type=float, default=0.1,
                        help="hold out this fraction of data for testing")
    parser.add_argument("--precompute-features", action="store_true",
                        help="precompute visual features (default: do not)")
    parser.add_argument("--no-bert-score", action="store_true",
                        help="skip BERTScore (needs a local BERT model)")
    parser.add_argument("--wandb-project", default="milan")
    parser.add_argument("--wandb-name", default="generalization")
    parser.add_argument("--wandb-group", default="experiments")
    parser.add_argument("--wandb-n-samples", type=int, default=25)
    args = parser.parse_args()

    try:
        import wandb
        wandb.init(project=args.wandb_project, name=args.wandb_name,
                   group=args.wandb_group, config={"trials": args.trials})
    except ImportError:
        wandb = None

    data_dir = args.data_dir or env.data_dir()
    results_dir = args.results_dir or (env.results_dir() / "generalization")
    if args.clear_results_dir and results_dir.exists():
        shutil.rmtree(results_dir)
    results_dir.mkdir(exist_ok=True, parents=True)
    log_file = results_dir / "log.jsonl"

    encoder = milan.encoder()

    for experiment in args.experiments or EXPERIMENTS.keys():
        print(f"\n-------- BEGIN EXPERIMENT: {experiment} --------")

        splits = EXPERIMENTS[experiment]
        if isinstance(splits[0], tuple):
            configs = []
            for left_key, right_key in splits:
                left = milannotations.load(left_key, path=data_dir)
                right = milannotations.load(right_key, path=data_dir)
                configs.append(
                    LoadedSplit(left, right, (left_key,), (right_key,)))
                if experiment != EXPERIMENT_ACROSS_ARCH:
                    configs.append(
                        LoadedSplit(right, left, (right_key,), (left_key,)))
        else:
            assert experiment == EXPERIMENT_WITHIN_NETWORK
            configs = []
            for name in splits:
                dataset = milannotations.load(name, path=data_dir)
                splits_file = (results_dir /
                               f'{name.replace("/", "_")}-splits.pkl')
                if splits_file.exists():
                    print(f"loading {name} w/i-network splits from "
                          f"{splits_file}")
                    with splits_file.open("rb") as handle:
                        indices = pickle.load(handle)["test"]
                    split = training.fixed_split(dataset, indices)
                else:
                    split = training.random_split(dataset,
                                                  hold_out=args.hold_out)
                    print(f"saving {name} w/i-network splits to "
                          f"{splits_file}")
                    with splits_file.open("wb") as handle:
                        pickle.dump({"train": split[0].indices,
                                     "test": split[1].indices}, handle)
                configs.append(LoadedSplit(*split, (name,), (name,)))

        for split_id, (train, test, train_keys,
                       test_keys) in enumerate(configs):
            train_features = test_features = None
            if args.precompute_features:
                train_features = encoder.map(train)
                test_features = encoder.map(test)

            for trial_id in range(args.trials):
                trial_key = f"{experiment}-split{split_id}-trial{trial_id}"

                lm_file = results_dir / f"{trial_key}-lm.pth"
                if lm_file.exists():
                    print(f"loading lm from {lm_file}")
                    lm = milan.LanguageModel.load(lm_file)
                else:
                    # Per-trial seeds: the reference gets across-trial
                    # variance from torch's global RNG; ours is explicit.
                    lm = milan.lm(train, seed=trial_id)
                    lm.fit(train, seed=trial_id)
                    print(f"saving lm to {lm_file}")
                    lm.save(lm_file)

                decoder_file = results_dir / f"{trial_key}-decoder.pth"
                if decoder_file.exists():
                    print(f"loading decoder from {decoder_file}")
                    decoder = milan.Decoder.load(decoder_file)
                else:
                    decoder = milan.decoder(train, encoder, lm=lm,
                                            strategy="rerank", beam_size=50,
                                            temperature=0.2, seed=trial_id)
                    decoder.fit(
                        train, features=train_features, seed=trial_id,
                        patience=10
                        if experiment == EXPERIMENT_WITHIN_NETWORK else 4)
                    print(f"saving decoder to {decoder_file}")
                    decoder.save(decoder_file)

                predictions = decoder.predict(test, features=test_features)
                bleu = decoder.bleu(test, predictions=predictions)
                rouge = decoder.rouge(test, predictions=predictions)

                log = {
                    "experiment": experiment,
                    "trial": trial_id,
                    "train": tuple(train_keys),
                    "test": tuple(test_keys),
                    "bleu": bleu.score,
                }
                for index, precision in enumerate(bleu.precisions):
                    log[f"bleu-{index + 1}"] = precision
                for kind, scores in rouge.items():
                    for key, score in scores.items():
                        log[f"{kind}-{key}"] = score
                if not args.no_bert_score:
                    try:
                        bert_scores = decoder.bert_score(
                            test, predictions=predictions)
                        for kind, score in bert_scores.items():
                            log[f"bert_score-{kind}"] = score
                    except RuntimeError as error:
                        print(f"BERTScore skipped: {error}")

                if wandb is not None:
                    log["samples"] = viz.random_neuron_wandb_images(
                        test, captions=predictions, k=args.wandb_n_samples,
                        experiment=experiment, trial=trial_id,
                        train=tuple(train_keys), test=tuple(test_keys))
                    wandb.log(log)
                else:
                    with log_file.open("a") as handle:
                        handle.write(json.dumps(log) + "\n")
                print({key: value for key, value in log.items()
                       if key != "samples"})


if __name__ == "__main__":
    main()
