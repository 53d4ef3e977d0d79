"""Exemplar computation: find and visualize top-activating images per unit.

TPU-native rebuild of the reference's NetDissect orchestration (reference:
src/exemplars/compute.py:27-246, driving src/deps/netdissect/tally.py and
runningstats.py). The two passes map onto the hardware like so:

**Pass 1 (full-dataset scan, the hot loop).** Host threads decode/normalize
images (data/loader.py); each batch runs through one jitted fold:
subject-model forward (MXU) → spatial max-pool + NHWC flatten (VPU) →
``ops.topk.update`` + ``ops.quantile.update`` (fixed-shape top-k/sort).
The accumulator states are donated buffers, so the whole loop runs at
forward-pass speed with no reallocation. With a device mesh, batches are
sharded along the data axis and XLA inserts the all-gathers for the
(small) state updates.

**Pass 2 (gather).** The top-k ids are known on host, so the data-dependent
"visit only top images" pass (reference: tally.py:92-124) becomes a *static
batch plan*: a fixed-size loader over the union of needed image ids plus a
padded (image, unit, rank) triple table per batch. One jitted kernel
upsamples the selected activation maps, thresholds at the per-unit quantile
level, and composites the dimmed-outside visualization — fused by XLA into
a single VPU pass per batch.

Artifacts exactly match the reference's on-disk contract
(images.npy/masks.npy/ids.csv/activations.csv/units.npy + per-unit PNG viz
and lightbox HTML, reference: compute.py:210-244), so downstream
``milannotations`` datasets are format-compatible with both pipelines.
"""
import collections
import concurrent.futures
import pathlib
import shutil
from functools import partial
from typing import (Any, Callable, Dict, Optional, Sequence, Tuple, Union)

import jax
import jax.numpy as jnp
import numpy as np

from neuron_descriptions_tpu.data import loader as data_loader
from neuron_descriptions_tpu.data import renormalize
from neuron_descriptions_tpu.exemplars import transforms
from neuron_descriptions_tpu.ops import masks as mask_ops
from neuron_descriptions_tpu.ops import quantile as quantile_ops
from neuron_descriptions_tpu.ops import topk as topk_ops
from neuron_descriptions_tpu.utils import env
from neuron_descriptions_tpu.utils.typing import Array, PathLike

__all__ = ["compute", "discriminative", "generative", "ActivationStats"]

ActivationStats = Tuple[topk_ops.TopKState, quantile_ops.QuantileState]

# compute fns take a host batch (*columns) and return device arrays.
ComputeTopkAndQuantileFn = Callable[..., Tuple[Array, Array]]
ComputeActivationsFn = Callable[..., Union[Array, Tuple[Array, Array]]]

_LIGHTBOX_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>unit exemplars</title>
<style>body{background:#222;margin:0}img{height:224px;margin:2px}</style>
</head><body><script>
for (let i = 0; i < 64; i++) {
  const img = document.createElement('img');
  img.src = `image_${i}.png`;
  img.onerror = () => img.remove();
  document.body.appendChild(img);
}
</script></body></html>
"""


def _save_tally_cache(path: pathlib.Path, tk, qs, args: Dict) -> None:
    arrays = {f"tk_{k}": np.asarray(v) for k, v in tk._asdict().items()}
    arrays.update({f"qs_{k}": np.asarray(v) for k, v in qs._asdict().items()})
    arrays["__args__"] = np.array(sorted(args.items()), dtype=object)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **arrays)


def _load_tally_cache(path: Optional[pathlib.Path],
                      args: Dict) -> Optional[ActivationStats]:
    if path is None or not pathlib.Path(path).exists():
        return None
    data = np.load(path, allow_pickle=True)
    cached_args = dict(map(tuple, data["__args__"]))
    if {k: str(v) for k, v in cached_args.items()} != {
            k: str(v) for k, v in args.items()}:
        return None
    tk = topk_ops.TopKState(
        values=jnp.asarray(data["tk_values"]),
        indices=jnp.asarray(data["tk_indices"]),
        count=jnp.asarray(data["tk_count"]))
    qs = quantile_ops.QuantileState(
        samples=jnp.asarray(data["qs_samples"]),
        tags=jnp.asarray(data["qs_tags"]),
        count=jnp.asarray(data["qs_count"]),
        minima=jnp.asarray(data["qs_minima"]),
        maxima=jnp.asarray(data["qs_maxima"]))
    return tk, qs


def _save_masks_cache(path: pathlib.Path, arrays: Dict[str, np.ndarray],
                      args: Dict) -> None:
    payload = dict(arrays)
    payload["__args__"] = np.array(sorted(args.items()), dtype=object)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **payload)


def _load_masks_cache(path: Optional[pathlib.Path],
                      args: Dict) -> Optional[Dict[str, np.ndarray]]:
    if path is None or not pathlib.Path(path).exists():
        return None
    data = np.load(path, allow_pickle=True)
    cached_args = dict(map(tuple, data["__args__"]))
    if {k: str(v) for k, v in cached_args.items()} != {
            k: str(v) for k, v in args.items()}:
        return None
    return {name: data[name] for name in data.files if name != "__args__"}


def compute(compute_topk_and_quantile: ComputeTopkAndQuantileFn,
            compute_activations: ComputeActivationsFn,
            dataset: Any,
            mesh: Optional[Any] = None,
            units: Optional[Sequence[int]] = None,
            k: int = 15,
            quantile: float = 0.99,
            output_size: int = 224,
            batch_size: int = 128,
            image_size: Optional[int] = None,
            renormalizer: Optional[renormalize.Renormalizer] = None,
            num_workers: int = 16,
            r: int = 4096,
            rng_seed: int = 0,
            results_dir: Optional[PathLike] = None,
            viz_dir: Optional[PathLike] = None,
            tally_cache_file: Optional[PathLike] = None,
            masks_cache_file: Optional[PathLike] = None,
            save_results: bool = True,
            save_viz: bool = True,
            clear_cache_files: bool = False,
            clear_results_dir: bool = False,
            clear_viz_dir: bool = False,
            display_progress: bool = True,
            profile_dir: Optional[PathLike] = None) -> ActivationStats:
    """Find and visualize the top-activating images for each unit.

    Argument semantics mirror the reference's ``compute``
    (reference: src/exemplars/compute.py:27-117). Additional args:

    Args:
        mesh: Optional ``jax.sharding.Mesh`` with a ``'data'`` axis. When
            given, pass 1 runs data-parallel: each host batch is sharded
            along the batch axis, the subject-model forward runs SPMD over
            the mesh, and per-device topk/quantile partials are merged with
            the associative ``ops.*.merge`` reductions at the end (the
            reference has no multi-device path at all, SURVEY.md §2.11).
        r: Quantile sketch resolution (reference: tally.py:200).
        rng_seed: Seed for the sketch's sampling PRNG (the reference relies
            on torch's global RNG; ours is explicit and deterministic).
        profile_dir: When set, capture a ``jax.profiler`` trace of both
            passes into this directory (SURVEY.md §5 — the rebuild makes
            tracing first-class; the reference has none).
    """
    from neuron_descriptions_tpu.utils import profiling
    if units is not None and not len(units):
        raise ValueError("when setting `units`, must provide >= 1 unit")
    if k < 1:
        raise ValueError(f"must have k >= 1, got k={k}")
    if quantile <= 0 or quantile >= 1:
        raise ValueError("must have quantile in range (0, 1), "
                         f"got quantile={quantile}")
    if image_size is None:
        image_size = getattr(dataset, "image_size", None)
        if image_size is None:
            raise ValueError("dataset has no `image_size` property so "
                             "image_size= must be set")
    if renormalizer is None:
        source = getattr(dataset, "normalize", None) or "imagenet"
        renormalizer = renormalize.renormalizer(source, "byte")

    if results_dir is None:
        results_dir = env.results_dir() / "exemplars"
    results_dir = pathlib.Path(results_dir)
    if viz_dir is None:
        viz_dir = results_dir / "viz"
    viz_dir = pathlib.Path(viz_dir)

    if clear_cache_files:
        for cache_file in (tally_cache_file, masks_cache_file):
            if cache_file is not None and pathlib.Path(cache_file).exists():
                pathlib.Path(cache_file).unlink()

    for save, clear, directory in ((save_results, clear_results_dir,
                                    results_dir),
                                   (save_viz, clear_viz_dir, viz_dir)):
        if not save:
            continue
        if clear and directory.exists():
            shutil.rmtree(directory)
        directory.mkdir(exist_ok=True, parents=True)

    units_arr = None
    if units is not None:
        units_arr = np.asarray(sorted(units), dtype=np.int64)
        if save_results:
            np.save(results_dir / "units.npy", units_arr)

        inner_tq, inner_act = compute_topk_and_quantile, compute_activations

        def compute_topk_and_quantile(*args: Any):
            pooled, flat = inner_tq(*args)
            return pooled[:, units_arr], flat[:, units_arr]

        def compute_activations(*args: Any):
            outputs = inner_act(*args)
            if isinstance(outputs, tuple):
                acts, images = outputs
                return acts[:, units_arr], images
            return outputs[:, units_arr]

    # Cache keys must pin everything that shapes the cached arrays;
    # the unit subset changes both passes' outputs (review finding:
    # a different units= run must not reuse a stale cache).
    units_key = ("all" if units_arr is None else
                 ",".join(str(u) for u in units_arr.tolist()))

    def run_passes() -> ActivationStats:
        # ------------------------------------------------------------------
        # PASS 1: stream the whole dataset through topk + quantile folds.
        # ------------------------------------------------------------------
        cache_args = dict(k=k, r=r, count=len(dataset), seed=rng_seed,
                          units=units_key)
        cached = _load_tally_cache(
            pathlib.Path(tally_cache_file) if tally_cache_file else None,
            cache_args)
        if cached is not None:
            tk, qs = cached
        elif mesh is not None:
            tk, qs = _sharded_pass1(compute_topk_and_quantile, dataset, mesh,
                                    k=k, r=r, batch_size=batch_size,
                                    num_workers=num_workers, rng_seed=rng_seed,
                                    display_progress=display_progress)
        else:
            fold = jax.jit(_fold_stats, donate_argnums=(0, 1))
            key = jax.random.PRNGKey(rng_seed)
            tk = qs = None
            start = 0
            it = data_loader.Loader(dataset, batch_size=batch_size,
                                    num_workers=num_workers)
            if display_progress:
                it = _progress(it, "tally activations", len(it))
            for i, batch in enumerate(it):
                batch = batch if isinstance(batch, tuple) else (batch,)
                pooled, flat = compute_topk_and_quantile(*batch)
                if tk is None:
                    n_units = pooled.shape[1]
                    tk = topk_ops.init(n_units, k)
                    qs = quantile_ops.init(n_units, r=r)
                tk, qs = fold(tk, qs, pooled, flat, jnp.int32(start),
                              jax.random.fold_in(key, i))
                start += int(pooled.shape[0])
            if tk is None:
                raise ValueError("dataset is empty")
            if tally_cache_file is not None:
                _save_tally_cache(pathlib.Path(tally_cache_file), tk, qs,
                                  cache_args)

        # ------------------------------------------------------------------
        # PASS 2: revisit only the top-k images; build masks and composites.
        # ------------------------------------------------------------------
        if save_results or save_viz or masks_cache_file is not None:
            levels = np.asarray(quantile_ops.quantiles(qs, quantile))
            values, ids = (np.asarray(x) for x in topk_ops.result(tk))
            n_units = ids.shape[0]
            size = int(output_size)

            # Pass-2 cache: skip the gather when a cache file matches
            # (reference: compute.py:90-94 caches the gathered topk tensor).
            masks_cache_args = dict(k=k, quantile=quantile, output_size=size,
                                    count=len(dataset), seed=rng_seed,
                                    units=units_key)
            cached_masks = _load_masks_cache(
                pathlib.Path(masks_cache_file) if masks_cache_file else None,
                masks_cache_args)

            if cached_masks is not None:
                images_out = cached_masks["images"]
                masks_out = cached_masks["masks"]
                masked_out = cached_masks["masked"]
            else:
                # Static gather plan: image id -> [(unit, rank), ...].
                needed: Dict[int, list] = collections.defaultdict(list)
                for unit in range(n_units):
                    for rank in range(k):
                        img = int(ids[unit, rank])
                        if img >= 0:
                            needed[img].append((unit, rank))
                needed_ids = sorted(needed)

                images_out = np.zeros((n_units, k, 3, size, size),
                                      dtype=np.uint8)
                masks_out = np.zeros((n_units, k, 1, size, size),
                                     dtype=np.uint8)
                masked_out = np.zeros((n_units, k, 3, size, size),
                                      dtype=np.uint8)

                gather_batch = min(batch_size, max(1, len(needed_ids)))
                chunks = [
                    needed_ids[i:i + gather_batch]
                    for i in range(0, len(needed_ids), gather_batch)
                ]
                max_hits = max(
                    (sum(len(needed[i]) for i in chunk) for chunk in chunks),
                    default=0)

                kernel = jax.jit(partial(_gather_kernel, output_size=size))
                levels_j = jnp.asarray(levels)

                it2 = data_loader.Loader(dataset, batch_size=gather_batch,
                                         num_workers=num_workers,
                                         indices=needed_ids)
                if display_progress:
                    it2 = _progress(it2, "compute top images", len(chunks))
                for chunk, batch in zip(chunks, it2):
                    batch = batch if isinstance(batch, tuple) else (batch,)
                    outputs = compute_activations(*batch)
                    if isinstance(outputs, tuple):
                        acts, images = outputs
                    else:
                        acts, images = outputs, jnp.asarray(batch[0])

                    triples = [(b, unit, rank) for b, img in enumerate(chunk)
                               for unit, rank in needed[img]]
                    pad = max_hits - len(triples)
                    b_idx = np.array([t[0] for t in triples] + [0] * pad,
                                     np.int32)
                    u_idx = np.array([t[1] for t in triples] + [0] * pad,
                                     np.int32)

                    byte_images = _to_byte_space(images, renormalizer)
                    masked_b, images_b, mask_b = kernel(jnp.asarray(acts),
                                                        byte_images,
                                                        jnp.asarray(b_idx),
                                                        jnp.asarray(u_idx),
                                                        levels_j)
                    masked_b = np.asarray(masked_b)
                    images_b = np.asarray(images_b)
                    mask_b = np.asarray(mask_b)
                    for t, (b, unit, rank) in enumerate(triples):
                        masked_out[unit, rank] = masked_b[t]
                        images_out[unit, rank] = images_b[t]
                        masks_out[unit, rank, 0] = mask_b[t]

                if masks_cache_file is not None:
                    _save_masks_cache(
                        pathlib.Path(masks_cache_file),
                        {"images": images_out, "masks": masks_out,
                         "masked": masked_out}, masks_cache_args)

            if save_results:
                np.save(results_dir / "images.npy", images_out)
                np.save(results_dir / "masks.npy", masks_out)
                np.savetxt(results_dir / "activations.csv",
                           values.reshape(n_units, k), delimiter=",",
                           fmt="%.5e")
                np.savetxt(results_dir / "ids.csv", ids.reshape(n_units, k),
                           delimiter=",", fmt="%i")

            if save_viz:
                _save_viz(viz_dir, masked_out, num_workers=num_workers)

        return tk, qs

    # The profiler trace must stop even when a pass raises.
    with profiling.trace(profile_dir):
        return run_passes()


def _fold_stats(tk, qs, pooled, flat, start, key):
    tk = topk_ops.update(tk, pooled, start)
    qs = quantile_ops.update(qs, flat, key)
    return tk, qs


def _sharded_pass1(compute_topk_and_quantile: ComputeTopkAndQuantileFn,
                   dataset: Any, mesh: Any, *, k: int, r: int,
                   batch_size: int, num_workers: int, rng_seed: int,
                   display_progress: bool) -> ActivationStats:
    """Pass 1 over a device mesh: SPMD forward + per-device partial folds.

    Host batches are padded to a multiple of the mesh size and device_put
    sharded along the batch axis, so the (jitted) subject-model forward
    inside ``compute_topk_and_quantile`` runs data-parallel; the stats fold
    is a ``shard_map`` with zero per-batch collectives
    (see parallel/sharded.py).
    """
    from neuron_descriptions_tpu.parallel import mesh as mesh_lib
    from neuron_descriptions_tpu.parallel import sharded

    n_dev = mesh.devices.size
    fold = sharded.make_sharded_fold(mesh)
    key = jax.random.PRNGKey(rng_seed)
    stats = None
    start = 0

    it = data_loader.Loader(dataset, batch_size=batch_size,
                            num_workers=num_workers)
    if display_progress:
        it = _progress(it, "tally activations (sharded)", len(it))
    for i, batch in enumerate(it):
        batch = batch if isinstance(batch, tuple) else (batch,)
        valid = len(batch[0])
        padded = []
        for column in batch:
            column = np.asarray(column)
            column, _ = sharded.pad_rows(column, n_dev)
            padded.append(mesh_lib.shard_batch(column, mesh))
        pooled, flat = compute_topk_and_quantile(*padded)
        if stats is None:
            stats = sharded.init_sharded(mesh, int(pooled.shape[1]), k, r=r)
        stats = fold(*stats, pooled, flat, jnp.int32(start),
                     jnp.int32(valid), jax.random.fold_in(key, i))
        start += valid
    if stats is None:
        raise ValueError("dataset is empty")
    return sharded.merge_sharded(stats)


def _gather_kernel(acts: Array, images: Array, b_idx: Array, u_idx: Array,
                   levels: Array, output_size: int):
    """Fused mask + composite for a padded batch of (image, unit) pairs.

    acts: (B, U, h, w) activations; images: (B, 3, H, W) in byte space.

    On TPU the upsample+threshold+composite runs as the Pallas kernel
    (``ops.pallas_masks``, SURVEY.md §7's fused gather kernel); elsewhere
    the XLA-fused ops path computes the identical bytes.
    """
    size = (output_size, output_size)
    sel = acts[b_idx, u_idx]  # (M, h, w)
    imgs = mask_ops.resize_nearest(images[b_idx], size)
    byte_imgs = jnp.clip(imgs, 0, 255).astype(jnp.uint8)
    if jax.default_backend() == "tpu":
        from neuron_descriptions_tpu.ops import pallas_masks
        masked, mask = pallas_masks.fused_masked_composite(
            sel, imgs, levels[u_idx], size, outside_bright=0.25,
            interpret=False)
        return masked, byte_imgs, mask
    mask = mask_ops.activation_mask(sel, levels[u_idx], size)
    masked = mask_ops.masked_image(imgs, mask, outside_bright=0.25)
    return masked, byte_imgs, mask.astype(jnp.uint8)


def _to_byte_space(images: Array,
                   renormalizer: renormalize.Renormalizer) -> Array:
    """Convert model-space images to float byte-range [0, 255] on device."""
    mul = jnp.asarray(renormalizer.mul).reshape(1, 3, 1, 1)
    add = jnp.asarray(renormalizer.add).reshape(1, 3, 1, 1)
    return jnp.asarray(images) * mul + add


def _save_viz(viz_dir: pathlib.Path, masked: np.ndarray,
              num_workers: int = 16) -> None:
    """Write per-unit PNGs + a lightbox page (reference: compute.py:229-244).

    PNG encoding runs on a thread pool — the rebuild's equivalent of the
    reference's WorkerPool-based imgsave (src/deps/netdissect/imgsave.py).
    """
    from PIL import Image

    def save_one(args) -> None:
        unit, rank, array = args
        unit_dir = viz_dir / f"unit_{unit}"
        unit_dir.mkdir(exist_ok=True, parents=True)
        Image.fromarray(array.transpose(1, 2, 0)).save(
            unit_dir / f"image_{rank}.png")

    jobs = [(unit, rank, masked[unit, rank])
            for unit in range(masked.shape[0])
            for rank in range(masked.shape[1])]
    with concurrent.futures.ThreadPoolExecutor(max(1, num_workers)) as pool:
        list(pool.map(save_one, jobs))
    for unit in range(masked.shape[0]):
        (viz_dir / f"unit_{unit}" / "+lightbox.html").write_text(
            _LIGHTBOX_HTML)


def _progress(iterable, desc: str, total: int):
    try:
        from tqdm.auto import tqdm  # noqa: PLC0415
        return tqdm(iterable, desc=desc, total=total)
    except ImportError:  # pragma: no cover
        return iterable


def discriminative(
    apply_fn: Callable[..., Tuple[Array, Dict[str, Array]]],
    params: Any,
    dataset: Any,
    layer: Optional[Union[int, str]] = None,
    results_dir: Optional[PathLike] = None,
    viz_dir: Optional[PathLike] = None,
    transform_inputs: Callable = transforms.first,
    transform_hiddens: Callable = transforms.identity,
    compute_dtype: Optional[Any] = None,
    **kwargs: Any,
) -> ActivationStats:
    """Compute exemplars for a discriminative (image → prediction) model.

    Mirrors the reference's ``discriminative`` (reference:
    src/exemplars/compute.py:263-349) with the functional model contract:
    ``apply_fn(params, images) -> (outputs, {layer: activations})`` — no
    hooking; the tapped intermediates come back from the forward directly.

    Args:
        compute_dtype: Optional dtype (e.g. ``jnp.bfloat16``) for the
            subject-model forward — ~1.25x faster scans on TPU. The stats
            fold stays float32. Opt-in: bf16 activations can shift
            quantile thresholds (and thus mask boundaries) slightly
            relative to the f32 reference.
    """
    if compute_dtype is not None:
        params = jax.tree_util.tree_map(
            lambda leaf: leaf.astype(compute_dtype)
            if hasattr(leaf, "astype") else leaf, params)

    def resolve(directory: Optional[PathLike]) -> Optional[pathlib.Path]:
        if directory is not None:
            directory = pathlib.Path(directory)
            directory /= str(layer) if layer is not None else "outputs"
        return directory

    def cast_in(images: Array) -> Array:
        return images if compute_dtype is None else images.astype(
            compute_dtype)

    @jax.jit
    def forward_hiddens(images: Array) -> Array:
        outputs, taps = apply_fn(params, cast_in(images))
        hiddens = outputs if layer is None else taps[str(layer)]
        return transform_hiddens(hiddens).astype(jnp.float32)

    @jax.jit
    def forward_stats(images: Array) -> Tuple[Array, Array]:
        outputs, taps = apply_fn(params, cast_in(images))
        hiddens = outputs if layer is None else taps[str(layer)]
        hiddens = transform_hiddens(hiddens).astype(jnp.float32)
        batch, channels = hiddens.shape[:2]
        pooled = hiddens.reshape(batch, channels, -1).max(axis=2)
        flat = jnp.moveaxis(hiddens, 1, -1).reshape(-1, channels)
        return pooled, flat

    def compute_topk_and_quantile(*batch: Any) -> Tuple[Array, Array]:
        (images,) = transform_inputs(*batch)
        return forward_stats(jnp.asarray(images))

    def compute_activations(*batch: Any) -> Array:
        (images,) = transform_inputs(*batch)
        return forward_hiddens(jnp.asarray(images))

    return compute(compute_topk_and_quantile, compute_activations, dataset,
                   results_dir=resolve(results_dir), viz_dir=resolve(viz_dir),
                   **kwargs)


def generative(
    apply_fn: Callable[..., Tuple[Array, Dict[str, Array]]],
    params: Any,
    dataset: Any,
    layer: Union[int, str],
    results_dir: Optional[PathLike] = None,
    viz_dir: Optional[PathLike] = None,
    transform_inputs: Callable = transforms.identities,
    transform_hiddens: Callable = transforms.identity,
    transform_outputs: Callable = transforms.identity,
    **kwargs: Any,
) -> ActivationStats:
    """Compute exemplars for a generative (representation → image) model.

    Mirrors the reference's ``generative`` (reference:
    src/exemplars/compute.py:352-437): the dataset holds model inputs
    (e.g. BigGAN z/y pairs); both the tracked hidden layer and the
    generated images come back from one forward.
    """
    if results_dir is not None:
        results_dir = pathlib.Path(results_dir) / str(layer)
    if viz_dir is not None:
        viz_dir = pathlib.Path(viz_dir) / str(layer)

    @jax.jit
    def forward(*model_inputs: Any) -> Tuple[Array, Array]:
        outputs, taps = apply_fn(params, *model_inputs)
        hiddens = transform_hiddens(taps[str(layer)])
        images = transform_outputs(outputs)
        return hiddens, images

    def compute_topk_and_quantile(*batch: Any) -> Tuple[Array, Array]:
        inputs = transform_inputs(*(jnp.asarray(b) for b in batch))
        hiddens, _ = forward(*inputs)
        batch_size, channels = hiddens.shape[:2]
        pooled = hiddens.reshape(batch_size, channels, -1).max(axis=2)
        flat = jnp.moveaxis(hiddens, 1, -1).reshape(-1, channels)
        return pooled, flat

    def compute_activations(*batch: Any) -> Tuple[Array, Array]:
        inputs = transform_inputs(*(jnp.asarray(b) for b in batch))
        return forward(*inputs)

    return compute(compute_topk_and_quantile, compute_activations, dataset,
                   results_dir=results_dir, viz_dir=viz_dir, **kwargs)
