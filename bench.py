"""Benchmark the exemplar-scan hot loop on the available accelerator.

Measures the pass-1 NetDissect scan step (subject-model forward with layer
taps -> spatial max-pool + NHWC flatten -> streaming topk/quantile fold;
reference hot loop: src/exemplars/compute.py:325-334 driving
src/deps/netdissect/tally.py:199-222) fully jitted and device-resident,
using the ResNet-152 subject model from the north-star workload
(BASELINE.md: describe all 4k resnet152/places365 units in <5 min on a
v4-8).

Prints ONE JSON line:
    {"metric": "exemplar_scan_images_per_sec", "value": N,
     "unit": "images/sec/chip", "vs_baseline": N, ...extras}

The reference publishes no throughput numbers (BASELINE.json published={}),
so ``vs_baseline`` is computed against the north-star requirement: scanning
the 1.803M-image Places365 train set + captioning 4k units in <5 min on 4
chips needs >= ~1500 images/sec/chip for the scan half; vs_baseline =
value / 1500.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from neuron_descriptions_tpu.models import resnet
from neuron_descriptions_tpu.ops import quantile as quantile_ops
from neuron_descriptions_tpu.ops import topk as topk_ops

DEPTH = 152
LAYER = "layer4"
BATCH = 64
IMAGE_SIZE = 224
WARMUP = 2
STEPS = 8
NORTH_STAR_IMAGES_PER_SEC = 1500.0


def main() -> None:
    device = jax.devices()[0]
    params = resnet.init(jax.random.PRNGKey(0), depth=DEPTH)
    params = jax.device_put(params, device)

    n_units = 2048  # layer4 channels for bottleneck resnets

    @jax.jit
    def scan_step(params, tk, qs, images, start, key):
        _, taps = resnet.apply(params, images, depth=DEPTH)
        hiddens = taps[LAYER]
        batch, channels = hiddens.shape[:2]
        pooled = hiddens.reshape(batch, channels, -1).max(axis=2)
        flat = jnp.moveaxis(hiddens, 1, -1).reshape(-1, channels)
        tk = topk_ops.update(tk, pooled, start)
        qs = quantile_ops.update(qs, flat, key)
        return tk, qs

    tk = jax.device_put(topk_ops.init(n_units, 15), device)
    qs = jax.device_put(quantile_ops.init(n_units, r=4096), device)
    key = jax.random.PRNGKey(0)

    rng = np.random.default_rng(0)
    batches = [
        jax.device_put(
            rng.normal(size=(BATCH, 3, IMAGE_SIZE, IMAGE_SIZE))
            .astype(np.float32), device)
        for _ in range(2)
    ]

    for i in range(WARMUP):
        tk, qs = scan_step(params, tk, qs, batches[i % 2], jnp.int32(0),
                           jax.random.fold_in(key, i))
    jax.block_until_ready(tk.values)

    start_t = time.perf_counter()
    for i in range(STEPS):
        tk, qs = scan_step(params, tk, qs, batches[i % 2],
                           jnp.int32(i * BATCH), jax.random.fold_in(key, i))
    jax.block_until_ready(tk.values)
    elapsed = time.perf_counter() - start_t

    images_per_sec = STEPS * BATCH / elapsed
    result = {
        "metric": "exemplar_scan_images_per_sec",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / NORTH_STAR_IMAGES_PER_SEC, 3),
        "model": f"resnet{DEPTH}/{LAYER}",
        "batch_size": BATCH,
        "image_size": IMAGE_SIZE,
        "ms_per_batch": round(1000 * elapsed / STEPS, 2),
        "device": str(device.platform),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
