"""CNN ablation-by-description experiments
(reference: experiments/analyze.py).

Scores every unit's MILAN description along some axis (semantic similarity
to a concept, POS counts, length, parse depth, ...), ablates units in score
order, and measures the accuracy drop on the classification dataset.

Scoring backends: 'random' and 'description-length' are dependency-free;
the semantic/syntactic/structural-parse scorers require spaCy with
``en_core_web_lg`` (as in the reference) and raise a clear error when it is
unavailable.
"""
import argparse
import csv
import json
import pathlib
import pickle
import shutil

import numpy as np

from neuron_descriptions_tpu import exemplars, milan, milannotations
from neuron_descriptions_tpu.utils import ablations, env, lang, training

EXPERIMENT_RANDOM = "random"
EXPERIMENT_SEM_AIRLINER = "airliner"
EXPERIMENT_SEM_FINCH = "finch"
EXPERIMENT_SEM_GAZELLE = "gazelle"
EXPERIMENT_SEM_SHIP = "ship"
EXPERIMENT_SEM_TABBY = "tabby"
EXPERIMENT_SEM_TRUCK = "truck"
EXPERIMENT_N_NOUNS = "n-nouns"
EXPERIMENT_N_VERBS = "n-verbs"
EXPERIMENT_N_ADPS = "n-adpositions"
EXPERIMENT_N_ADJS = "n-adjectives"
EXPERIMENT_DESCRIPTION_LENGTH = "description-length"
EXPERIMENT_MAX_WORD_DIFFERENCE = "max-word-difference"
EXPERIMENT_PARSE_DEPTH = "parse-depth"

EXPERIMENTS = (EXPERIMENT_RANDOM, EXPERIMENT_SEM_AIRLINER,
               EXPERIMENT_SEM_FINCH, EXPERIMENT_SEM_GAZELLE,
               EXPERIMENT_SEM_SHIP, EXPERIMENT_SEM_TABBY,
               EXPERIMENT_SEM_TRUCK, EXPERIMENT_N_NOUNS, EXPERIMENT_N_VERBS,
               EXPERIMENT_N_ADPS, EXPERIMENT_N_ADJS,
               EXPERIMENT_DESCRIPTION_LENGTH,
               EXPERIMENT_MAX_WORD_DIFFERENCE, EXPERIMENT_PARSE_DEPTH)

GROUP_RANDOM = "random"
GROUP_SEMANTIC = "semantic"
GROUP_SYNTACTIC = "syntactic"
GROUP_STRUCTURAL = "structural"

EXPERIMENTS_BY_GROUP = {
    GROUP_RANDOM: frozenset({EXPERIMENT_RANDOM}),
    GROUP_SEMANTIC: frozenset({
        EXPERIMENT_SEM_AIRLINER, EXPERIMENT_SEM_FINCH,
        EXPERIMENT_SEM_GAZELLE, EXPERIMENT_SEM_SHIP, EXPERIMENT_SEM_TABBY,
        EXPERIMENT_SEM_TRUCK,
    }),
    GROUP_SYNTACTIC: frozenset({
        EXPERIMENT_N_NOUNS, EXPERIMENT_N_VERBS, EXPERIMENT_N_ADPS,
        EXPERIMENT_N_ADJS,
    }),
    GROUP_STRUCTURAL: frozenset({
        EXPERIMENT_DESCRIPTION_LENGTH, EXPERIMENT_MAX_WORD_DIFFERENCE,
        EXPERIMENT_PARSE_DEPTH,
    }),
}
GROUPS_BY_EXPERIMENT = {
    experiment: group
    for group, members in EXPERIMENTS_BY_GROUP.items()
    for experiment in members
}

ORDER_INCREASING = "increasing"
ORDER_DECREASING = "decreasing"
ORDERS = (ORDER_DECREASING, ORDER_INCREASING)

CNNS = ("resnet18",)
DATASETS = ("imagenet",)


def _spacy_nlp():
    try:
        import spacy
        return spacy.load("en_core_web_lg")
    except Exception as error:
        raise RuntimeError(
            "this scoring experiment needs spaCy with en_core_web_lg "
            "(the reference's scorer); install it or run the 'random' / "
            "'description-length' experiments") from error


def score_descriptions(experiment: str, descriptions, seed: int = 0):
    """Score each description for the given experiment
    (reference: analyze.py:259-326)."""
    group = GROUPS_BY_EXPERIMENT[experiment]
    if group == GROUP_RANDOM:
        return np.random.default_rng(seed).random(
            len(descriptions)).tolist()

    if experiment == EXPERIMENT_DESCRIPTION_LENGTH:
        tokenize = lang.tokenizer(lemmatize=False, ignore_stop=False,
                                  ignore_punct=False)
        return [len(tokens) for tokens in tokenize(list(descriptions))]

    nlp = _spacy_nlp()
    tokenized = tuple(nlp.pipe(descriptions))

    if group == GROUP_SEMANTIC:
        target = nlp(experiment)
        return [tokens.similarity(target) for tokens in tokenized]

    if group == GROUP_SYNTACTIC:
        pos = {
            EXPERIMENT_N_NOUNS: "NOUN",
            EXPERIMENT_N_VERBS: "VERB",
            EXPERIMENT_N_ADPS: "ADP",
            EXPERIMENT_N_ADJS: "ADJ",
        }[experiment]
        return [sum(token.pos_ == pos for token in tokens)
                for tokens in tokenized]

    if experiment == EXPERIMENT_PARSE_DEPTH:
        scores = []
        for tokens in tokenized:
            root = next(token for token in tokens if token.dep_ == "ROOT")
            deepest, frontier = 0, [(root, 0)]
            while frontier:
                current, depth = frontier.pop()
                frontier.extend((child, depth + 1)
                                for child in current.children)
                deepest = max(deepest, depth)
            scores.append(deepest)
        return scores

    assert experiment == EXPERIMENT_MAX_WORD_DIFFERENCE
    scores = []
    for tokens in tokenized:
        vectors = np.stack([token.vector for token in tokens])
        distances = ((vectors[:, None] - vectors[None]) ** 2).sum(axis=-1)
        scores.append(float(distances.max()))
    return scores


def main() -> None:
    parser = argparse.ArgumentParser(
        description="run cnn ablation experiments")
    parser.add_argument("--cnns", nargs="+", choices=CNNS, default=CNNS)
    parser.add_argument("--milan", default="base")
    parser.add_argument("--datasets", choices=DATASETS, default=DATASETS)
    parser.add_argument("--experiments", nargs="+", choices=EXPERIMENTS,
                        default=(EXPERIMENT_RANDOM,
                                 EXPERIMENT_DESCRIPTION_LENGTH))
    parser.add_argument("--groups", nargs="+",
                        choices=tuple(EXPERIMENTS_BY_GROUP))
    parser.add_argument("--orders", nargs="+", choices=ORDERS,
                        default=(ORDER_DECREASING,))
    parser.add_argument("--data-dir", type=pathlib.Path)
    parser.add_argument("--results-dir", type=pathlib.Path)
    parser.add_argument("--clear-results-dir", action="store_true")
    parser.add_argument("--ablation-min", type=float, default=0)
    parser.add_argument("--ablation-max", type=float, default=0.2)
    parser.add_argument("--ablation-step-size", type=float, default=0.02)
    parser.add_argument("--n-random-trials", type=int, default=5)
    args = parser.parse_args()

    data_dir = args.data_dir or env.data_dir()
    results_dir = args.results_dir or (env.results_dir() / "analyze")
    if args.clear_results_dir and results_dir.exists():
        shutil.rmtree(results_dir)
    results_dir.mkdir(exist_ok=True, parents=True)

    experiments = set(args.experiments)
    if args.groups:
        for group in args.groups:
            experiments |= EXPERIMENTS_BY_GROUP[group]

    for dataset_name in args.datasets:
        dataset = exemplars.datasets.load(
            dataset_name, factory=training.PreloadedImageFolder)
        for cnn_name in args.cnns:
            model_results_dir = results_dir / cnn_name / dataset_name
            model_results_dir.mkdir(exist_ok=True, parents=True)
            log_file = model_results_dir / "log.jsonl"

            cnn_model, *_ = exemplars.models.load(
                f"{cnn_name}/{dataset_name}")
            cnn = ablations.ImageClassifier(cnn_model)

            dissected = milannotations.load(f"{cnn_name}/{dataset_name}",
                                            path=data_dir)

            descriptions_file = model_results_dir / "descriptions.csv"
            if descriptions_file.exists():
                print(f"loading descriptions from {descriptions_file}")
                with descriptions_file.open("r") as handle:
                    descriptions = [row["description"]
                                    for row in csv.DictReader(handle)]
            else:
                decoder = milan.pretrained(args.milan)
                descriptions = decoder.predict(
                    dissected, strategy="rerank", temperature=0.2,
                    beam_size=50)
                rows = [("layer", "unit", "description")]
                for index, description in enumerate(descriptions):
                    sample = dissected[index]
                    rows.append((sample.layer, str(sample.unit),
                                 description))
                print(f"saving descriptions to {descriptions_file}")
                with descriptions_file.open("w") as handle:
                    csv.writer(handle).writerows(rows)

            for experiment in sorted(
                    experiments, key=lambda exp: GROUPS_BY_EXPERIMENT[exp]):
                group = GROUPS_BY_EXPERIMENT[experiment]
                print(f"\n-------- BEGIN EXPERIMENT: "
                      f"{cnn_name}/{dataset_name}/{group}/{experiment} "
                      "--------")

                trials = (args.n_random_trials
                          if experiment == EXPERIMENT_RANDOM else 1)
                for trial in range(trials):
                    scores = score_descriptions(experiment, descriptions,
                                                seed=trial)
                    scores_file = (model_results_dir /
                                   f"{experiment}-scores.pkl")
                    with scores_file.open("wb") as handle:
                        pickle.dump(scores, handle)

                    for order in args.orders:
                        indices = sorted(
                            range(len(descriptions)),
                            key=lambda i: scores[i],
                            reverse=order == ORDER_DECREASING)
                        fractions = np.arange(args.ablation_min,
                                              args.ablation_max,
                                              args.ablation_step_size)
                        for fraction in fractions:
                            ablated = indices[:int(fraction * len(indices))]
                            units = dissected.units(ablated)
                            predictions = cnn.predict(dataset, ablate=units)
                            accuracy = cnn.accuracy(
                                dataset, predictions=predictions)
                            accuracies = {
                                f"accuracy-{dataset.dataset.classes[cat]}":
                                acc
                                for cat, acc in cnn.accuracies(
                                    dataset,
                                    predictions=predictions).items()
                            }
                            log = {
                                "cnn": cnn_name,
                                "dataset": dataset_name,
                                "group": group,
                                "experiment": experiment,
                                "trial": trial,
                                "order": order,
                                "frac_ablated": float(fraction),
                                "n_ablated": len(ablated),
                                "accuracy": accuracy,
                                **accuracies,
                            }
                            with log_file.open("a") as handle:
                                handle.write(json.dumps(log) + "\n")
                            print({k: v for k, v in log.items()
                                   if not k.startswith("accuracy-")})


if __name__ == "__main__":
    main()
