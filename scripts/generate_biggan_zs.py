"""Generate (z, y) input samples for the BigGAN generative dissections
(reference: scripts/generate_biggan_zs.py).

The reference samples z ~ N(0, 1) with the generator's latent size and
y ~ Uniform(classes) (reference: src/deps/pretorched/gans/utils.py:163-176).
BigGAN-256's latent size is 140 (reference: biggan.py:828). Outputs are
``zs.npy``/``ys.npy`` in a directory readable by
``exemplars.datasets.TensorDatasetOnDisk``.
"""
import argparse
import pathlib

import numpy as np

from neuron_descriptions_tpu.models import biggan

N_CLASSES = {"imagenet": 1000, "places365": 365}


def main() -> None:
    parser = argparse.ArgumentParser(
        description="generate a bunch of gan inputs")
    parser.add_argument("dataset", choices=("imagenet", "places365"),
                        help="dataset model was trained on")
    parser.add_argument("path", type=pathlib.Path,
                        help="write zs and ys into this directory")
    parser.add_argument("--num-samples", "-n", dest="n", type=int,
                        default=100000,
                        help="number of samples to generate (default: 100k)")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    rng = np.random.default_rng(args.seed)
    zs = rng.standard_normal((args.n, biggan.DIM_Z)).astype(np.float32)
    ys = rng.integers(N_CLASSES[args.dataset], size=(args.n,)).astype(
        np.int64)

    args.path.mkdir(exist_ok=True, parents=True)
    np.save(args.path / "zs.npy", zs)
    np.save(args.path / "ys.npy", ys)
    print(f"wrote {args.n} (z, y) samples to {args.path}")


if __name__ == "__main__":
    main()
