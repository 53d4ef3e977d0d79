"""Baseline comparison experiments (reference: experiments/baselines.py).

Compares MILAN (with/without PMI decoding) against NetDissect and CompExp
label baselines on the four annotated classifier corpora, by BLEU and
BERTScore. The NetDissect/CompExp branches read those tools' result files
from disk (the reference consumes the same artifacts).
"""
import argparse
import csv
import json
import pathlib
import re
import shutil

from neuron_descriptions_tpu import milan, milannotations
from neuron_descriptions_tpu.utils import env, metrics

ALEXNET_IMAGENET_REMAP = {
    "conv1": "features-0",
    "conv2": "features-3",
    "conv3": "features-6",
    "conv4": "features-8",
    "conv5": "features-10",
}

EXPERIMENTS = (
    milannotations.KEYS.ALEXNET_IMAGENET,
    milannotations.KEYS.ALEXNET_PLACES365,
    milannotations.KEYS.RESNET152_IMAGENET,
    milannotations.KEYS.RESNET152_PLACES365,
)

METHOD_NETDISSECT = "netdissect"
METHOD_COMPEXP = "compexp"
METHOD_NO_PMI = "no-pmi"
METHOD_PMI = "pmi"
METHODS = (METHOD_NETDISSECT, METHOD_COMPEXP, METHOD_NO_PMI, METHOD_PMI)


def main() -> None:
    parser = argparse.ArgumentParser(description="run baselines")
    parser.add_argument("--experiments", nargs="+", choices=EXPERIMENTS,
                        default=EXPERIMENTS,
                        help="experiments to run (default: all)")
    parser.add_argument("--methods", nargs="+", choices=METHODS,
                        default=METHODS,
                        help="methods to run (default: all)")
    parser.add_argument("--netdissect-results-dir", type=pathlib.Path,
                        help="netdissect results dir "
                        "(default: project results dir)")
    parser.add_argument("--compexp-results-dir", type=pathlib.Path,
                        help="compexp results dir "
                        "(default: project results dir)")
    parser.add_argument("--trials", type=int, default=5)
    parser.add_argument("--precompute-features", action="store_true")
    parser.add_argument("--results-dir", type=pathlib.Path)
    parser.add_argument("--clear-results-dir", action="store_true")
    parser.add_argument("--no-bert-score", action="store_true")
    parser.add_argument("--wandb-project", default="milan")
    parser.add_argument("--wandb-name", default="baselines")
    parser.add_argument("--wandb-group", default="experiments")
    args = parser.parse_args()

    try:
        import wandb
        wandb.init(project=args.wandb_project, name=args.wandb_name,
                   group=args.wandb_group, config={"trials": args.trials})
    except ImportError:
        wandb = None

    results_dir = args.results_dir or (env.results_dir() / "baselines")
    if args.clear_results_dir and results_dir.exists():
        shutil.rmtree(results_dir)
    results_dir.mkdir(exist_ok=True, parents=True)
    log_file = results_dir / "log.jsonl"

    netdissect_results_dir = (args.netdissect_results_dir or
                              env.results_dir() / "netdissect")
    compexp_results_dir = (args.compexp_results_dir or
                           env.results_dir() / "compexp")

    for experiment in args.experiments:
        experiment_key = experiment.replace("/", "-")
        test = milannotations.load(experiment)

        for method in args.methods:
            train = None
            if method in {METHOD_NO_PMI, METHOD_PMI}:
                train = milannotations.load(f"not-{experiment_key}")

            trials = (args.trials if method in {METHOD_PMI, METHOD_NO_PMI}
                      else 1)
            for trial in range(trials):
                print(f"---- {experiment_key}/{method}/trial {trial} ----")

                if method == METHOD_NETDISSECT:
                    predictions = _netdissect_predictions(
                        test, experiment_key, netdissect_results_dir)
                elif method == METHOD_COMPEXP:
                    predictions = _compexp_predictions(
                        test, experiment, compexp_results_dir)
                else:
                    predictions = _milan_predictions(
                        test, train, method, experiment_key, trial,
                        results_dir, args.precompute_features)

                outputs = [("layer", "unit", "description")]
                for index in range(len(test)):
                    sample = test[index]
                    outputs.append((sample.layer, str(sample.unit),
                                    predictions[index]))
                trial_key = f"{experiment_key}-{method}-{trial}"
                captions_file = results_dir / f"{trial_key}-descriptions.csv"
                with captions_file.open("w") as handle:
                    csv.writer(handle).writerows(outputs)

                bleu = metrics.bleu(test, predictions)
                log = {"experiment": experiment, "method": method,
                       "trial": trial, "bleu": bleu.score}
                for index, precision in enumerate(bleu.precisions):
                    log[f"bleu-{index + 1}"] = precision
                if not args.no_bert_score:
                    try:
                        for kind, score in metrics.bert_score(
                                test, predictions).items():
                            log[f"bert_score-{kind}"] = score
                    except RuntimeError as error:
                        print(f"BERTScore skipped: {error}")

                if wandb is not None:
                    wandb.log(log)
                else:
                    with log_file.open("a") as handle:
                        handle.write(json.dumps(log) + "\n")
                print(log)


def _netdissect_predictions(test, experiment_key, netdissect_results_dir):
    """Read NetDissect unit labels (reference: baselines.py:133-151)."""
    results_by_layer_unit = {}
    for layer in test.layers:
        results_name = (f'{experiment_key.replace("365", "")}'
                        f"-netpqc-{layer}-10/report.json")
        results_file = netdissect_results_dir / results_name
        with results_file.open("r") as handle:
            results = json.load(handle)
        for result in results["units"]:
            unit = str(result["unit"])
            label = result["label"].split("-")[0]
            results_by_layer_unit[str(layer), unit] = label
    return [results_by_layer_unit[str(test[i].layer), str(test[i].unit)]
            for i in range(len(test))]


def _compexp_predictions(test, experiment, compexp_results_dir):
    """Read CompExp unit labels (reference: baselines.py:153-184)."""
    model, dataset = experiment.split("/")
    model_subdir = f"{model}_{dataset}_broden_ade20k_neuron_3"
    results_by_layer_unit = {}
    for layer in test.layers:
        layer_key = str(layer)
        if experiment == milannotations.KEYS.ALEXNET_IMAGENET:
            layer_key = ALEXNET_IMAGENET_REMAP[layer_key]
        results_file = (compexp_results_dir / model_subdir /
                        f"tally_{layer_key}.csv")
        with results_file.open("r") as handle:
            rows = tuple(csv.DictReader(handle))
        for row in rows:
            label = (row["label"].lower().replace("(", "").replace(")", "")
                     .replace("-", " ").replace("_", " "))
            label = re.sub(r"\W+(s|t|c)($|\W+)", " ", label).strip()
            results_by_layer_unit[str(layer), str(row["unit"])] = label
    return [results_by_layer_unit[str(test[i].layer), str(test[i].unit)]
            for i in range(len(test))]


def _milan_predictions(test, train, method, experiment_key, trial,
                       results_dir, precompute_features):
    """Train (or load) a leave-one-out captioner and decode
    (reference: baselines.py:186-229)."""
    milan_key = f"{experiment_key}-trial{trial}"
    milan_file = results_dir / f"{milan_key}-captioner.pth"
    if milan_file.exists():
        print(f"loading decoder from {milan_file}")
        decoder = milan.Decoder.load(milan_file)
    else:
        lm_file = results_dir / f"{milan_key}-lm.pth"
        if lm_file.exists():
            print(f"loading lm from {lm_file}")
            lm = milan.LanguageModel.load(lm_file)
        else:
            lm = milan.lm(train, seed=trial)
            lm.fit(train, seed=trial)
            print(f"saving lm to {lm_file}")
            lm.save(lm_file)

        encoder = milan.encoder()
        train_features = encoder.map(train) if precompute_features else None
        decoder = milan.decoder(train, encoder, lm=lm, seed=trial)
        decoder.fit(train, features=train_features, seed=trial)
        print(f"saving decoder to {milan_file}")
        decoder.save(milan_file)

    return decoder.predict(
        test,
        strategy="rerank" if method == METHOD_PMI else "greedy",
        beam_size=50, temperature=0.2, mi=False)


if __name__ == "__main__":
    main()
