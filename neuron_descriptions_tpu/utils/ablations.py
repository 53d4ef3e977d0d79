"""Ablating unit activations mid-forward (reference: src/utils/ablations.py).

The reference edits layers by monkeypatching module forwards through
nethook; here the zoo models accept an ``edits={layer: fn}`` argument that
rewrites a tap inside the (jitted) forward — same semantics, no hooking.

``ablated`` wraps a ``SubjectModel`` so every call runs with the given
units zeroed; ``ImageClassifier`` adds fit/predict/accuracy with optional
ablation during either, used by the spurious-feature editing and ablation
experiments (reference: experiments/edit.py, experiments/analyze.py).
"""
import collections
import contextlib
import dataclasses
from typing import (Any, Callable, Dict, Iterator, Mapping, Optional,
                    Sequence, Union)

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neuron_descriptions_tpu.utils import training
from neuron_descriptions_tpu.utils.typing import Array, Layer, Unit

__all__ = ["zero", "ablated", "ImageClassifier"]

Rule = Callable[[Array], Array]
RuleFactory = Callable[[Sequence[int]], Rule]


def zero(units: Sequence[int]) -> Rule:
    """Zero the given channels of a (N, C, H, W) activation tensor
    (reference: ablations.py:20-42)."""
    units = tuple(units)

    def fn(features: Array) -> Array:
        if features.ndim != 4:
            raise ValueError(f"expected 4D features, got {features.ndim}")
        mask = jnp.ones((features.shape[1],), features.dtype)
        mask = mask.at[jnp.asarray(units, jnp.int32)].set(0.0)
        return features * mask[None, :, None, None]

    return fn


@contextlib.contextmanager
def ablated(model: Any,
            units: Sequence[Unit],
            rule: RuleFactory = zero) -> Iterator[Any]:
    """Yield a view of the subject model with the given units ablated
    (reference: ablations.py:45-70).

    Args:
        model: A ``SubjectModel``-like object (``apply``/``params``/
            ``layers``) whose apply accepts ``edits=``.
        units: (layer, unit) pairs to ablate.
        rule: Rule factory mapping unit lists to an edit function.
    """
    per_layer = collections.defaultdict(list)
    for layer, unit in units:
        per_layer[str(layer)].append(unit)
    edits = {layer: rule(sorted(layer_units))
             for layer, layer_units in per_layer.items()}

    base_apply = model.apply

    def apply(params: Any, *inputs: Any, **kwargs: Any):
        # Only inject when there is something to edit, so models whose
        # apply lacks an edits= parameter still work un-ablated.
        if edits:
            kwargs.setdefault("edits", edits)
        return base_apply(params, *inputs, **kwargs)

    yield dataclasses.replace(model, apply=apply) \
        if dataclasses.is_dataclass(model) else _Wrapped(model, apply)


class _Wrapped:
    """SubjectModel-shaped view with a replaced apply."""

    def __init__(self, model: Any, apply: Callable):
        self.model = model
        self.apply = apply
        self.params = model.params
        self.layers = model.layers

    def __call__(self, *inputs: Any) -> Any:
        return self.apply(self.params, *inputs)


class ImageClassifier:
    """An image classifier with ablation-aware fit/predict/accuracy
    (reference: ablations.py:73-367)."""

    def __init__(self, model: Any):
        self.model = model

    def __call__(self, *args: Any, **kwargs: Any) -> Any:
        return self.model.apply(self.model.params, *args, **kwargs)

    def fit(self,
            dataset: Any,
            image_index: int = 0,
            target_index: int = 1,
            batch_size: int = 128,
            max_epochs: int = 100,
            patience: int = 4,
            hold_out: Union[float, Sequence[int]] = 0.1,
            optimizer: Optional[optax.GradientTransformation] = None,
            ablate: Optional[Sequence[Unit]] = None,
            layers: Optional[Sequence[Layer]] = None,
            seed: int = 0,
            display_progress_as: Optional[str] = "train classifier") -> None:
        """Train the classifier, optionally with units ablated
        (reference: ablations.py:90-216).

        ``layers`` restricts which parameters train (the reference selects
        submodule parameters; we select by state-dict key prefix).
        """
        if optimizer is None:
            optimizer = optax.adamw(1e-3)

        if isinstance(hold_out, float):
            train, val = training.random_split(dataset, hold_out=hold_out)
        else:
            train, val = training.fixed_split(dataset, hold_out)

        params = dict(self.model.params)
        if layers is None:
            trainable_keys = set(params)
        else:
            prefixes = tuple(str(layer) for layer in layers)
            trainable_keys = {name for name in params
                              if name.startswith(prefixes)}
            missing = [p for p in prefixes
                       if not any(name.startswith(p) for name in params)]
            if missing:
                raise KeyError(f"could not find layers: {sorted(missing)}")
        frozen = {name: value for name, value in params.items()
                  if name not in trainable_keys}
        trainable = {name: value for name, value in params.items()
                     if name in trainable_keys}

        with ablated(self.model, ablate or []) as model:
            apply_fn = model.apply

            def loss_fn(trainable_params: Dict[str, Array], images: Array,
                        targets: Array) -> Array:
                logits, _ = apply_fn({**frozen, **trainable_params}, images)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, targets).mean()

            @jax.jit
            def update(trainable_params, opt_state, images, targets):
                loss, grads = jax.value_and_grad(loss_fn)(
                    trainable_params, images, targets)
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      trainable_params)
                return (optax.apply_updates(trainable_params, updates),
                        opt_state, loss)

            eval_loss = jax.jit(loss_fn)

            def batches(subset, shuffle_key):
                order = np.arange(len(subset))
                if shuffle_key is not None:
                    order = np.asarray(jax.random.permutation(
                        shuffle_key, len(subset)))
                for start in range(0, len(subset), batch_size):
                    chunk = [subset[int(i)]
                             for i in order[start:start + batch_size]]
                    images = jnp.asarray(
                        np.stack([np.asarray(s[image_index])
                                  for s in chunk]))
                    targets = jnp.asarray(
                        np.asarray([s[target_index] for s in chunk],
                                   np.int32))
                    yield images, targets

            opt_state = optimizer.init(trainable)
            stopper = training.EarlyStopping(patience=patience)
            best = trainable
            key = jax.random.PRNGKey(seed)

            for epoch in range(max_epochs):
                key, shuffle_key = jax.random.split(key)
                for images, targets in batches(train, shuffle_key):
                    trainable, opt_state, _ = update(trainable, opt_state,
                                                     images, targets)

                val_losses = [float(eval_loss(trainable, images, targets))
                              for images, targets in batches(val, None)]
                val_loss = float(np.mean(val_losses)) if val_losses else 0.0
                if display_progress_as is not None:
                    print(f"{display_progress_as} [epoch={epoch} "
                          f"val_loss={val_loss:.3f}]")

                if stopper(val_loss):
                    trainable = best
                    break
                if stopper.improved:
                    best = trainable

        self.model.params = {**frozen, **trainable}

    def predict(self,
                dataset: Any,
                image_index: int = 0,
                batch_size: int = 128,
                ablate: Optional[Sequence[Unit]] = None,
                display_progress_as: Optional[str] = "classify images",
                ) -> np.ndarray:
        """Class predictions for every sample
        (reference: ablations.py:218-269)."""
        del display_progress_as
        predictions = []
        with ablated(self.model, ablate or []) as model:
            apply_jit = jax.jit(
                lambda params, images: model.apply(params, images)[0])
            for start in range(0, len(dataset), batch_size):
                chunk = [dataset[i]
                         for i in range(start,
                                        min(start + batch_size,
                                            len(dataset)))]
                images = jnp.asarray(
                    np.stack([np.asarray(s[image_index]) for s in chunk]))
                logits = apply_jit(model.params, images)
                predictions.append(np.asarray(logits).argmax(axis=-1))
        return np.concatenate(predictions)

    def accuracy(self,
                 dataset: Any,
                 predictions: Optional[np.ndarray] = None,
                 target_index: int = 1,
                 **kwargs: Any) -> float:
        """Overall accuracy (reference: ablations.py:271-312)."""
        if predictions is None:
            predictions = self.predict(dataset, **kwargs)
        targets = np.asarray([dataset[index][target_index]
                              for index in range(len(dataset))])
        return float((predictions == targets).sum() / len(dataset))

    def accuracies(self,
                   dataset: Any,
                   predictions: Optional[np.ndarray] = None,
                   target_index: int = 1,
                   **kwargs: Any) -> Mapping[int, float]:
        """Class-by-class accuracy (reference: ablations.py:314-367)."""
        if predictions is None:
            predictions = self.predict(dataset, **kwargs)
        targets = np.asarray([dataset[index][target_index]
                              for index in range(len(dataset))])
        correct: Dict[int, int] = collections.defaultdict(int)
        total: Dict[int, int] = collections.defaultdict(int)
        for prediction, target in zip(predictions.tolist(),
                                      targets.tolist()):
            correct[target] += int(prediction == target)
            total[target] += 1
        return {target: correct[target] / total[target]
                for target in correct}
