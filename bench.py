"""Benchmark the two hot loops on the available accelerator.

1. **Exemplar scan** (pass-1 NetDissect): jitted ResNet-152 forward with
   layer taps → pooled/flattened activation statistics folded into the
   streaming top-k + quantile sketch (reference hot loop:
   src/exemplars/compute.py:325-334 driving tally.py:199-222).
2. **Captioning**: the full MILAN decode configuration — PyramidConv
   feature shape (3904-d), beam-50 rerank with in-loop LM rescoring over a
   realistic vocab — jitted end-to-end (reference hot loop:
   src/milan/decoders.py:576-634 × beam width × units).

Prints ONE JSON line. The primary metric stays the scan throughput for
cross-round comparability; extras report caption throughput and the
projected wall-clock for the BASELINE.md north star (scan Places365's
1.803M images + caption 4k units on 4 chips, target < 5 min).

The reference publishes no throughput numbers (BASELINE.json
published={}), so ``vs_baseline`` is computed against the north-star
requirement of ~1500 scan images/sec/chip.
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

# MILAN decode configuration (reference: decoders.py:233-244 + the
# published milan-base dimensions: resnet101 pyramid -> 3904-d features,
# k=15 exemplars, vocab ~2k incl. specials, beam 50, length 15).
FEATURE_SIZE = 3904
K_IMAGES = 15
VOCAB = 2000
CAPTION_BATCH = 16
BEAM = 50
LENGTH = 15

N_SCAN_IMAGES = 1_803_460  # Places365 train
N_UNITS = 4000  # resnet152/places365 annotated units
N_CHIPS = 4  # v4-8


def bench_scan(device) -> dict:
    params = resnet.init(jax.random.PRNGKey(0), depth=DEPTH)
    params = jax.device_put(params, device)
    n_units = 2048

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

    tk = jax.device_put(topk_ops.init(n_units, K_IMAGES), device)
    qs = jax.device_put(quantile_ops.init(n_units, r=4096), device)
    key = jax.random.PRNGKey(0)

    rng = np.random.default_rng(0)
    batches = [
        jax.device_put(
            rng.normal(size=(BATCH, 3, IMAGE_SIZE, IMAGE_SIZE))
            .astype(np.float32), device) for _ in range(2)
    ]

    for i in range(WARMUP):
        tk, qs = scan_step(params, tk, qs, batches[i % 2], jnp.int32(0),
                           jax.random.fold_in(key, i))
    jax.block_until_ready(tk.values)

    # Best of 3 windows: the chip is shared through a tunnel here, so a
    # single window can catch contention; speed-of-light is the min.
    elapsed = float("inf")
    for _ in range(3):
        start_t = time.perf_counter()
        for i in range(STEPS):
            tk, qs = scan_step(params, tk, qs, batches[i % 2],
                               jnp.int32(i * BATCH),
                               jax.random.fold_in(key, i))
        jax.block_until_ready(tk.values)
        elapsed = min(elapsed, time.perf_counter() - start_t)

    return {
        "images_per_sec": STEPS * BATCH / elapsed,
        "ms_per_batch": 1000 * elapsed / STEPS,
    }


def bench_caption(device) -> dict:
    """Beam-50 rerank decode on synthetic weights at real dimensions."""
    from neuron_descriptions_tpu.milan import decoders, encoders, lms
    from neuron_descriptions_tpu.utils import lang

    rng = np.random.default_rng(0)
    tokens = tuple(f"w{i}" for i in range(VOCAB - 4))
    vocabulary = lang.Vocab(tokens)
    tokenize = lang.tokenizer(lemmatize=False, ignore_stop=False,
                              ignore_punct=False)
    indexer = lang.Indexer(vocabulary, tokenize, start=True, stop=True,
                           pad=True, unk=True)

    class FeatEncoder(encoders.Encoder):
        feature_shape = (FEATURE_SIZE,)

        def forward(self, images, masks=None, **kwargs):
            raise NotImplementedError  # bench decodes from features

        def properties(self):
            return {}

        def state_dict(self):
            return {}

        def load_state_dict(self, state_dict):
            del state_dict

    lm = lms.LanguageModel(indexer, embedding_size=128, hidden_size=512,
                           layers=2)
    decoder = decoders.Decoder(indexer, FeatEncoder(), lm=lm,
                               embedding_size=128, hidden_size=512,
                               length=LENGTH, beam_size=BEAM,
                               temperature=0.2)
    decoder.params = jax.device_put(decoder.params, device)
    lm.params = jax.device_put(lm.params, device)

    features = jax.device_put(
        rng.normal(size=(CAPTION_BATCH, K_IMAGES, FEATURE_SIZE))
        .astype(np.float32), device)

    # Warmup (compilation) + best-of-3 timed windows of the full rerank
    # pipeline.
    decoder(features, strategy="rerank")
    steps = 4
    elapsed = float("inf")
    for _ in range(3):
        start_t = time.perf_counter()
        for _ in range(steps):
            out = decoder(features, strategy="rerank")
        jax.block_until_ready(out.scores)
        elapsed = min(elapsed, time.perf_counter() - start_t)

    return {"units_per_sec": steps * CAPTION_BATCH / elapsed}


def main() -> None:
    device = jax.devices()[0]
    scan = bench_scan(device)
    caption = bench_caption(device)

    images_per_sec = scan["images_per_sec"]
    units_per_sec = caption["units_per_sec"]
    north_star_minutes = (
        N_SCAN_IMAGES / (images_per_sec * N_CHIPS) +
        N_UNITS / (units_per_sec * N_CHIPS)) / 60.0

    result = {
        "metric": "exemplar_scan_images_per_sec",
        "value": round(images_per_sec, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / NORTH_STAR_IMAGES_PER_SEC, 3),
        "model": f"resnet{DEPTH}/{LAYER}",
        "batch_size": BATCH,
        "image_size": IMAGE_SIZE,
        "ms_per_batch": round(scan["ms_per_batch"], 2),
        "caption_units_per_sec": round(units_per_sec, 2),
        "caption_config": f"rerank beam={BEAM} len={LENGTH} vocab={VOCAB} "
                          f"feat={FEATURE_SIZE} k={K_IMAGES}",
        "north_star_minutes_est_v4_8": round(north_star_minutes, 2),
        "device": str(device.platform),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
