"""Sweep decode hyperparameters for the captioner
(reference: scripts/sweep_milan.py).

Usage: ``python -m scripts.sweep_milan --sweeps greedy rerank``.

wandb logging is optional here (the reference requires it): when wandb is
not importable, every sweep condition's scores are appended to
``<results-dir>/sweep_log.jsonl`` instead.
"""
import argparse
import json
import pathlib
import pickle
import shutil
from typing import Any, Dict

import numpy

from neuron_descriptions_tpu import milan, milannotations
from neuron_descriptions_tpu.utils import env, training, viz

SWEEP_GREEDY = "greedy"
SWEEP_BEAM = "beam"
SWEEP_GREEDY_MI = "greedy-mi"
SWEEP_BEAM_MI = "beam-mi"
SWEEP_RERANK = "rerank"
SWEEPS = (SWEEP_GREEDY, SWEEP_BEAM, SWEEP_GREEDY_MI, SWEEP_BEAM_MI,
          SWEEP_RERANK)

ENCODERS = ("resnet18", "resnet50", "resnet101")

SCORE_BLEU = "bleu"
SCORE_ROUGE = "rouge"
SCORE_BERT_SCORE = "bert-score"
SCORES = (SCORE_BLEU, SCORE_ROUGE, SCORE_BERT_SCORE)


def main() -> None:
    parser = argparse.ArgumentParser(
        description="sweep over milan hyperparams")
    parser.add_argument("--sweeps", default=SWEEPS, nargs="+",
                        help="sweeps to run (default: all)")
    parser.add_argument("--dataset", default=milannotations.KEYS.BASE,
                        help="milannotations to train/test on "
                        "(default: base)")
    parser.add_argument("--encoder", choices=ENCODERS, default="resnet101",
                        help="encoder config (default: resnet101)")
    parser.add_argument("--scores", nargs="+",
                        default=(SCORE_BLEU, SCORE_ROUGE),
                        help="scores to compute (default: bleu, rouge)")
    parser.add_argument(
        "--pretrained", type=pathlib.Path,
        help="path to results dir from train_milan; if set, use this milan "
        "and its train/val splits")
    parser.add_argument(
        "--hold-out", type=float, default=0.1,
        help="hold out and test on this fraction of data (default: .1)")
    parser.add_argument("--precompute-features", action="store_true",
                        help="precompute visual features (default: do not)")
    parser.add_argument("--beam-size-min", type=int, default=5)
    parser.add_argument("--beam-size-max", type=int, default=50)
    parser.add_argument("--beam-size-step", type=int, default=5)
    parser.add_argument("--mi-temperature-min", type=float, default=0.05)
    parser.add_argument("--mi-temperature-max", type=float, default=0.75)
    parser.add_argument("--mi-temperature-step", type=float, default=0.05)
    parser.add_argument("--data-dir", type=pathlib.Path,
                        help="root dir for datasets "
                        "(default: project data dir)")
    parser.add_argument(
        "--results-dir", type=pathlib.Path,
        help="directory to write intermediate and final results "
        "(default: <project results dir>/milan-<encoder>-sweep)")
    parser.add_argument("--clear-results-dir", action="store_true",
                        help="if set, clear results dir (default: do not)")
    parser.add_argument("--wandb-project", default="lv")
    parser.add_argument("--wandb-name")
    parser.add_argument("--wandb-group", default="milan")
    parser.add_argument("--wandb-n-samples", type=int, default=10)
    args = parser.parse_args()

    config = args.encoder
    key = f"milan-{config}-sweep"

    try:
        import wandb
        wandb.init(project=args.wandb_project, name=args.wandb_name or key,
                   group=args.wandb_group)
    except ImportError:
        wandb = None

    data_dir = args.data_dir or env.data_dir()
    results_dir = args.results_dir or (env.results_dir() / key)
    if args.clear_results_dir and results_dir.exists():
        shutil.rmtree(results_dir)
    results_dir.mkdir(exist_ok=True, parents=True)

    if args.pretrained:
        for child in args.pretrained.iterdir():
            shutil.copy(child, results_dir)

    dataset = milannotations.load(args.dataset, path=data_dir)

    splits_file = results_dir / "splits.pkl"
    if splits_file.exists():
        print(f"loading cached train/test splits from {splits_file}")
        with splits_file.open("rb") as handle:
            splits = pickle.load(handle)
        test, train = training.fixed_split(dataset, splits["train"])
    else:
        train, test = training.random_split(dataset, hold_out=args.hold_out)
        print(f"writing train/test splits to {splits_file}")
        with splits_file.open("wb") as handle:
            pickle.dump({"train": train.indices, "test": test.indices},
                        handle)

    lm = None
    lm_file = results_dir / "lm.pth"
    if lm_file.exists():
        print(f"loading cached lm from {lm_file}")
        lm = milan.LanguageModel.load(lm_file)
    elif ({SWEEP_GREEDY_MI, SWEEP_BEAM_MI, SWEEP_RERANK} & set(args.sweeps)):
        lm = milan.lm(train)
        lm.fit(train, display_progress_as="train lm")
        print(f"saving lm to {lm_file}")
        lm.save(lm_file)

    decoder_file = results_dir / "decoder.pth"
    if decoder_file.is_file() and splits_file.is_file():
        print(f"loading cached decoder from {decoder_file}")
        decoder = milan.Decoder.load(decoder_file)
        encoder = decoder.encoder
    else:
        encoder = milan.encoder(config=config)
        decoder = milan.decoder(train, encoder, lm=lm)
        train_features = None
        if args.precompute_features:
            train_features = encoder.map(train)
        decoder.fit(train, features=train_features)
        print(f"saving decoder to {decoder_file}")
        decoder.save(decoder_file)

    test_features = None
    if args.precompute_features:
        test_features = encoder.map(test)

    log_file = results_dir / "sweep_log.jsonl"

    def evaluate(**kwargs: Any) -> None:
        metadata = viz.kwargs_to_str(**kwargs)
        print(f"evaluating condition: {metadata}")
        predictions = decoder.predict(test, features=test_features, **kwargs)

        log: Dict[str, Any] = {"condition": kwargs}
        if SCORE_BLEU in args.scores:
            bleu = decoder.bleu(test, predictions=predictions)
            log["bleu"] = bleu.score
            for index, precision in enumerate(bleu.precisions):
                log[f"bleu-{index + 1}"] = precision
        if SCORE_ROUGE in args.scores:
            rouge = decoder.rouge(test, predictions=predictions)
            for kind, scores in rouge.items():
                for score_key, score in scores.items():
                    log[f"{kind}-{score_key}"] = score
        if SCORE_BERT_SCORE in args.scores:
            bert_scores = decoder.bert_score(test, predictions=predictions)
            for kind, score in bert_scores.items():
                log[f"bert_score-{kind}"] = score

        if wandb is not None:
            log["samples"] = viz.random_neuron_wandb_images(
                test, captions=predictions, k=args.wandb_n_samples, **kwargs)
            wandb.log(log)
        else:
            with log_file.open("a") as handle:
                handle.write(json.dumps(log) + "\n")

    for sweep in args.sweeps:
        if sweep == SWEEP_GREEDY:
            evaluate(strategy="greedy", mi=False)
        elif sweep == SWEEP_BEAM:
            for beam_size in numpy.arange(args.beam_size_min,
                                          args.beam_size_max,
                                          args.beam_size_step):
                evaluate(strategy="beam", mi=False,
                         beam_size=int(beam_size))
        elif sweep == SWEEP_GREEDY_MI:
            for temperature in numpy.arange(args.mi_temperature_min,
                                            args.mi_temperature_max,
                                            args.mi_temperature_step):
                evaluate(strategy="greedy", mi=True,
                         temperature=float(temperature))
        elif sweep == SWEEP_BEAM_MI:
            for beam_size in numpy.arange(args.beam_size_min,
                                          args.beam_size_max,
                                          args.beam_size_step):
                for temperature in numpy.arange(args.mi_temperature_min,
                                                args.mi_temperature_max,
                                                args.mi_temperature_step):
                    evaluate(strategy="beam", beam_size=int(beam_size),
                             mi=True, temperature=float(temperature))
        else:
            assert sweep == SWEEP_RERANK
            for beam_size in numpy.arange(args.beam_size_min,
                                          args.beam_size_max,
                                          args.beam_size_step):
                for temperature in numpy.arange(args.mi_temperature_min,
                                                args.mi_temperature_max,
                                                args.mi_temperature_step):
                    evaluate(strategy="rerank", beam_size=int(beam_size),
                             temperature=float(temperature))


if __name__ == "__main__":
    main()
