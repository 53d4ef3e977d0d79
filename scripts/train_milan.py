"""Train a neuron captioner from scratch (reference: scripts/train_milan.py).

Usage: ``python -m scripts.train_milan --dataset base``.

Artifacts (splits, LM, decoder) are cached per results dir and skipped when
present, matching the reference's idempotent-recovery pattern
(reference: scripts/train_milan.py:63-109).
"""
import argparse
import pathlib
import pickle
import shutil
from typing import Optional

from neuron_descriptions_tpu import milan, milannotations
from neuron_descriptions_tpu.utils import env, training

ENCODERS = ("resnet18", "resnet50", "resnet101")


def main() -> None:
    parser = argparse.ArgumentParser(description="train milan")
    parser.add_argument(
        "--results-dir", type=pathlib.Path,
        help="save model to this dir "
        "(default: generated in project results dir)")
    parser.add_argument("--clear-results-dir", action="store_true",
                        help="clear results dir (default: do not)")
    parser.add_argument("--dataset", default=milannotations.KEYS.BASE,
                        help="milannotations to train on (default: base)")
    parser.add_argument("--encoder", choices=ENCODERS, default="resnet101",
                        help="image encoder (default: resnet101)")
    parser.add_argument("--no-lm", action="store_true",
                        help="do not train lm (default: train lm)")
    parser.add_argument(
        "--precompute-features", action="store_true",
        help="precompute image features (default: do not)")
    parser.add_argument(
        "--hold-out", type=float, default=0.05,
        help="hold out and validate on this fraction of training data "
        "(default: .05)")
    args = parser.parse_args()

    results_dir: Optional[pathlib.Path] = args.results_dir
    if not results_dir:
        subdir = f'milan-{args.dataset.replace("/", "_")}'
        if args.no_lm:
            subdir += "-no_lm"
        results_dir = env.results_dir() / subdir

    if args.clear_results_dir and results_dir.exists():
        shutil.rmtree(results_dir)
    results_dir.mkdir(exist_ok=True, parents=True)

    dataset = milannotations.load(args.dataset)

    splits_file = results_dir / "splits.pkl"
    if splits_file.exists():
        print(f"loading cached train/test splits from {splits_file}")
        with splits_file.open("rb") as handle:
            splits = pickle.load(handle)
        train, val = training.fixed_split(dataset, splits["val"])
    else:
        train, val = training.random_split(dataset, hold_out=args.hold_out)
        print(f"saving train/test splits to {splits_file}")
        with splits_file.open("wb") as handle:
            pickle.dump({"train": train.indices, "val": val.indices}, handle)

    lm = None
    if not args.no_lm:
        lm_file = results_dir / "lm.pth"
        if lm_file.exists():
            print(f"loading cached lm from {lm_file}")
            lm = milan.LanguageModel.load(lm_file)
        else:
            lm = milan.lm(dataset)
            lm.fit(dataset, hold_out=val.indices)
            print(f"saving lm to {lm_file}")
            lm.save(lm_file)

    encoder = milan.encoder(config=args.encoder)

    features = None
    if args.precompute_features:
        features = encoder.map(dataset)

    decoder_file = results_dir / "decoder.pth"
    if decoder_file.exists():
        print(f"loading cached decoder from {decoder_file}")
        decoder = milan.Decoder.load(decoder_file)
    else:
        decoder = milan.decoder(dataset, encoder, lm=lm)
        decoder.fit(dataset, features=features, hold_out=val.indices)
        print(f"saving decoder to {decoder_file}")
        decoder.save(decoder_file)

    predictions = decoder.predict(val)
    bleu = decoder.bleu(val, predictions=predictions)
    print("BLEU:", f"{bleu.score:.1f}")

    try:
        bert_score = decoder.bert_score(val, predictions=predictions)
        print("BERTScore:",
              ", ".join(f"{k}={v:.2f}" for k, v in bert_score.items()))
    except RuntimeError as error:
        print(f"BERTScore skipped: {error}")


if __name__ == "__main__":
    main()
