"""Dissect a pretrained vision model (reference: scripts/compute_exemplars.py).

Usage: ``python -m scripts.compute_exemplars <model> <dataset>``.

JAX picks the accelerator automatically (TPU when available); there is no
``--device`` flag. Everything else mirrors the reference arg surface.
"""
import argparse
import pathlib

from neuron_descriptions_tpu.exemplars import compute, datasets, models
from neuron_descriptions_tpu.utils import env


def main() -> None:
    parser = argparse.ArgumentParser(description="compute unit exemplars")
    parser.add_argument("model", help="model architecture")
    parser.add_argument("dataset",
                        help="dataset of unseen examples for model")
    parser_ex = parser.add_mutually_exclusive_group()
    parser_ex.add_argument("--layer-names", nargs="+",
                           help="layer names to compute exemplars for")
    parser_ex.add_argument("--layer-indices", type=int, nargs="+",
                           help="layer indices to compute exemplars for; "
                           "cannot be used with --layer-names")
    parser.add_argument(
        "--units", type=int,
        help="only compute exemplars for first n units (default: all)")
    parser.add_argument(
        "--data-root", type=pathlib.Path,
        help="link results (in --results-root) to this directory "
        "(default: <project data dir> / model / dataset)")
    parser.add_argument("--results-root", type=pathlib.Path,
                        help="exemplars results root "
                        "(default: <project results dir> / exemplars)")
    parser.add_argument("--viz-root", type=pathlib.Path,
                        help="exemplars visualization root (default: "
                        "<project results dir> / exemplars / viz)")
    parser.add_argument("--model-file", type=pathlib.Path,
                        help="path to model weights")
    parser.add_argument("--dataset-path", type=pathlib.Path,
                        help="path to dataset")
    parser.add_argument("--devices", type=int,
                        help="shard the scan over this many devices "
                        "(default: single device)")
    parser.add_argument("--bf16", action="store_true",
                        help="run the subject-model forward in bfloat16 "
                        "(~1.25x faster scan; stats stay f32; masks may "
                        "shift slightly vs the f32 reference)")
    parser.add_argument("--no-viz", action="store_true",
                        help="do not compute visualization")
    parser.add_argument("--no-link", action="store_true",
                        help="do not link results to data dir")
    parser.add_argument("--num-workers", type=int, default=16,
                        help="number of worker threads (default: 16)")
    args = parser.parse_args()

    model, layers, config = models.load(f"{args.model}/{args.dataset}",
                                        path=args.model_file)

    dataset_key, generative = args.dataset, False
    if isinstance(config.exemplars, models.GenerativeModelExemplarsConfig):
        dataset_key = config.exemplars.dataset
        generative = True
    elif dataset_key == datasets.KEYS.IMAGENET_BLURRED:
        dataset_key = datasets.KEYS.IMAGENET

    dataset = datasets.load(dataset_key, path=args.dataset_path)

    if args.layer_names:
        layers = args.layer_names
    elif args.layer_indices:
        layers = [layers[index] for index in args.layer_indices]
    assert layers is not None, "should always be >= 1 layer"

    units = range(args.units) if args.units else None

    mesh = None
    if args.devices:
        from neuron_descriptions_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.default_mesh(args.devices)

    data_root = args.data_root or env.data_dir()
    data_dir = data_root / args.model / args.dataset

    results_root = args.results_root or (env.results_dir() / "exemplars")
    results_dir = results_root / args.model / args.dataset

    viz_dir = None
    if args.viz_root is not None:
        viz_dir = args.viz_root / args.model / args.dataset
    elif not args.no_viz:
        viz_dir = results_root / "viz" / args.model / args.dataset

    for layer in layers:
        kwargs = dict(layer=layer, units=units, results_dir=results_dir,
                      viz_dir=viz_dir, save_viz=not args.no_viz,
                      num_workers=args.num_workers,
                      **config.exemplars.kwargs)
        if mesh is not None:
            kwargs["mesh"] = mesh
        if generative:
            compute.generative(model.apply, model.params, dataset, **kwargs)
        else:
            if args.bf16:
                import jax.numpy as jnp
                kwargs["compute_dtype"] = jnp.bfloat16
            compute.discriminative(model.apply, model.params, dataset,
                                   **kwargs)

    if not args.no_link and not data_dir.exists():
        data_dir.parent.mkdir(exist_ok=True, parents=True)
        data_dir.symlink_to(results_dir, target_is_directory=True)


if __name__ == "__main__":
    main()
