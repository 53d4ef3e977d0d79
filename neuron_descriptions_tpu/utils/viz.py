"""Visualization utilities (reference: src/utils/viz.py).

The reference depends on wandb unconditionally; this environment treats
wandb as optional. Image helpers return ``wandb.Image`` objects when wandb
is importable and lightweight ``CaptionedImage`` records otherwise, so
sweeps and experiments run (and log to disk) without it.
"""
import collections
import concurrent.futures
import pathlib
import random
from typing import (Any, Callable, Mapping, NamedTuple, Optional, Sequence,
                    Tuple, Union)

from PIL import Image

from neuron_descriptions_tpu.milannotations import datasets
from neuron_descriptions_tpu.utils.typing import PathLike, StrSequence

__all__ = [
    "kwargs_to_str",
    "CaptionedImage",
    "wandb_image",
    "wandb_images",
    "random_wandb_images",
    "random_neuron_wandb_images",
    "generate_html",
]


def kwargs_to_str(**kwargs: Any) -> str:
    """Return metadata as a compact string (reference: viz.py:17-28)."""
    kvs = []
    for key, value in kwargs.items():
        if isinstance(value, float):
            kv = f"{key}={value:.2f}"
        elif isinstance(value, str):
            kv = f'{key}="{value}"'
        else:
            kv = f"{key}={value}"
        kvs.append(kv)
    return ", ".join(kvs)


class CaptionedImage(NamedTuple):
    """Fallback record used when wandb is unavailable."""

    image: Image.Image
    caption: str


def _wandb():
    try:
        import wandb
        return wandb
    except ImportError:
        return None


def wandb_image(image: Image.Image, caption: str, **kwargs: Any) -> Any:
    """Create a (wandb) image with metadata-prefixed caption
    (reference: viz.py:31-46)."""
    metadata = kwargs_to_str(**kwargs)
    full_caption = f"({metadata}) {caption}"
    wandb = _wandb()
    if wandb is not None:
        return wandb.Image(image, caption=full_caption)
    return CaptionedImage(image, full_caption)


def wandb_images(images: Sequence[Image.Image], captions: StrSequence,
                 **kwargs: Any) -> Sequence[Any]:
    """Convert (image, caption) pairs to wandb images
    (reference: viz.py:49-78)."""
    if len(images) != len(captions):
        raise ValueError(
            f"got {len(images)} images, {len(captions)} captions")
    results = []
    for index, (image, caption) in enumerate(zip(images, captions)):
        metadata = collections.OrderedDict()
        for key, value in kwargs.items():
            metadata[key] = value(index) if callable(value) else value
        results.append(wandb_image(image, caption, **metadata))
    return tuple(results)


def random_wandb_images(
    dataset: Any,
    sample_to_image: Callable[[int, Any], Image.Image],
    sample_to_caption: Callable[[int, Any], str],
    indices: Optional[Sequence[int]] = None,
    k: int = 25,
    **kwargs: Any,
) -> Sequence[Any]:
    """Sample the dataset and map to wandb images
    (reference: viz.py:81-123)."""
    if indices is None:
        indices = list(range(len(dataset)))

    chosen = random.sample(list(indices), k=min(k, len(indices)))
    images = [sample_to_image(index, dataset[index]) for index in chosen]
    captions = [sample_to_caption(index, dataset[index]) for index in chosen]

    metadata = collections.OrderedDict()
    for key, value in kwargs.items():
        if callable(value):
            metadata[key] = (
                lambda index, value=value:
                value(index, dataset[index]))
        else:
            metadata[key] = value

    return wandb_images(images, captions, **metadata)


def random_neuron_wandb_images(dataset: Any,
                               captions: StrSequence,
                               indices: Optional[Sequence[int]] = None,
                               k: int = 25,
                               **kwargs: Any) -> Sequence[Any]:
    """Sample neurons; images are top-image grids (reference:
    viz.py:126-152)."""
    kwargs.setdefault("layer", lambda _, sample: sample.layer)
    kwargs.setdefault("unit", lambda _, sample: sample.unit)
    return random_wandb_images(dataset,
                               lambda _, sample: sample.as_pil_image_grid(),
                               lambda i, _: captions[i],
                               indices=indices,
                               k=k,
                               **kwargs)


PredictedCaptions = Union[StrSequence, Sequence[Mapping[str, str]]]
GetHeaderFn = Callable[[Any, int], str]
GetBaseUrlFn = Callable[[Any, int], str]
GetUrlUnitIdFn = Callable[[Any, int], int]


def generate_html(
    dataset: Any,
    out_dir: PathLike,
    predictions: Optional[PredictedCaptions] = None,
    get_header: Optional[GetHeaderFn] = None,
    get_base_url: Optional[GetBaseUrlFn] = None,
    get_unit_id: Optional[GetUrlUnitIdFn] = None,
    include_gt: bool = True,
    save_images: bool = True,
    grid_images: bool = False,
    image_size: Optional[Tuple[int, int]] = None,
    num_workers: int = 16,
) -> None:
    """Generate an HTML page of neuron top images and captions
    (reference: viz.py:160-316)."""
    length = len(dataset)
    if predictions is not None and len(predictions) != length:
        raise ValueError(f"expected {length} predictions, "
                         f"got {len(predictions)}")

    if image_size is None:
        image_height = 600 if grid_images else 224
        image_width = 1000 if grid_images else 224
    else:
        image_height, image_width = image_size

    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(exist_ok=True, parents=True)

    images: list = []
    if grid_images:
        image_file_name_pattern = "top_images_%d.png"
    else:
        image_file_name_pattern = "top_images_%d_%d.png"

    html = [
        "<!doctype html>",
        "<html>",
        "<head>",
        "<style>",
        "td { padding-right: 10px; }",
        "</style>",
        "</head>",
        "<body>",
    ]
    for index in range(length):
        sample = dataset[index]
        key = f"{sample.layer}-{sample.unit}"

        header = get_header(sample, index) if get_header is not None else key

        base_url = None
        if get_base_url is not None:
            base_url = get_base_url(sample, index)

        unit_id = index if get_unit_id is None else get_unit_id(sample, index)

        if base_url is None:
            image_urls = []
        elif grid_images:
            image_urls = [f"{base_url}/{image_file_name_pattern % unit_id}"]
        else:
            image_urls = [
                f"{base_url}/{image_file_name_pattern % (unit_id, position)}"
                for position in range(len(sample.images))
            ]

        if save_images and grid_images:
            images.append(sample.as_pil_image_grid())
        elif save_images:
            images.append(sample.as_pil_images())

        html += [
            "<div>",
            f"<h2>{header}</h2>",
            '<div style="display: inline-block">',
        ]
        for image_url in image_urls:
            html += [
                f'<img src="{image_url}" alt="{key}" '
                f'style="height: {image_height}px; width: {image_width}px"'
                "/>"
            ]
        html += ["</div>"]

        if include_gt and isinstance(sample, datasets.AnnotatedTopImages):
            html += ["<h3>human annotations</h3>", "<ul>"]
            for annotation in sample.annotations:
                html += [f"<li>{annotation}</li>"]
            html += ["</ul>"]

        if predictions is not None:
            if include_gt:
                html += ["<h3>predicted caption</h3>"]
            prediction = predictions[index]
            if isinstance(prediction, str):
                html += ["<div>", prediction, "</div>"]
            else:
                html += ["<table>"]
                for label, caption in prediction.items():
                    html += [
                        "<tr>",
                        f"<td><b>{label}</b></td>",
                        f"<td>{caption}</td>",
                        "</tr>",
                    ]
                html += ["</table>"]
        html += ["</div>"]
    html += ["</body>", "</html>"]

    if save_images:
        jobs = []
        for unit_id, entry in enumerate(images):
            if grid_images:
                jobs.append((out_dir / (image_file_name_pattern % unit_id),
                             entry))
            else:
                for position, image in enumerate(entry):
                    jobs.append(
                        (out_dir /
                         (image_file_name_pattern % (unit_id, position)),
                         image))
        with concurrent.futures.ThreadPoolExecutor(
                max(1, num_workers)) as pool:
            list(pool.map(lambda job: job[1].save(job[0]), jobs))

    html_file = out_dir / "index.html"
    with html_file.open("w") as handle:
        handle.writelines(html)
