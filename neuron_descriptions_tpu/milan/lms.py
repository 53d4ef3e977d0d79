"""The language model component of MILAN.

A 2-layer LSTM LM over caption tokens (reference: src/milan/lms.py). It is
consumed two ways: full-sequence scoring for PMI reranking
(``forward(reduce=True)``, reference: lms.py:58-101) and one-token-at-a-time
stepping fused inside the decoder's PMI decode step (reference:
src/milan/decoders.py:624-630).

TPU design: parameters are a flat torch-keyed dict; the compute is pure
functions (``apply`` = embed → ``ops.lstm.lstm`` scan → linear →
log-softmax) that jit per shape and fuse into whichever program calls them.
The reduce=True mask semantics replicate the reference exactly, including
its "score one token past the first stop" behavior, because rerank parity
depends on it.
"""
from typing import Any, Dict, Mapping, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neuron_descriptions_tpu.ops import lstm as lstm_ops
from neuron_descriptions_tpu.utils import lang, serialize, training
from neuron_descriptions_tpu.utils.typing import Array, StrSequence

__all__ = ["LanguageModel", "lm"]

Params = Dict[str, Array]


def layer_params(params: Mapping[str, Array],
                 layers: int,
                 prefix: str = "lstm") -> Tuple[Dict[str, Array], ...]:
    """View flat torch LSTM keys as per-layer cell param dicts."""
    return tuple(
        {
            "w_ih": params[f"{prefix}.weight_ih_l{i}"],
            "w_hh": params[f"{prefix}.weight_hh_l{i}"],
            "b_ih": params[f"{prefix}.bias_ih_l{i}"],
            "b_hh": params[f"{prefix}.bias_hh_l{i}"],
        } for i in range(layers))


def apply(params: Mapping[str, Array], inputs: Array,
          layers: int) -> Array:
    """Token log-probs for a batch of sequences.

    Args:
        params: flat torch-keyed LM parameters.
        inputs: (batch, length) int32 token ids.
        layers: number of LSTM layers (static).

    Returns:
        (batch, length, vocab) log-probabilities.
    """
    embeddings = params["embedding.weight"][inputs]
    hiddens, _, _ = lstm_ops.lstm(layer_params(params, layers), embeddings)
    logits = hiddens @ params["output.0.weight"].T + params["output.0.bias"]
    return jax.nn.log_softmax(logits, axis=-1)


def sequence_mask(inputs: Array, stop_index: int) -> Array:
    """Reference reduce-mask: scoring position t is live until one past the
    first stop token (reference: lms.py:93-96 — ``masks[i, j+1:] = 0`` for
    each stop at input position j)."""
    stops = (inputs == stop_index).astype(jnp.int32)
    cum = jnp.cumsum(stops, axis=1)
    batch, length = inputs.shape
    return jnp.concatenate(
        [jnp.ones((batch, 1), inputs.dtype),
         (cum[:, :length - 2] == 0).astype(inputs.dtype)], axis=1)


def apply_reduced(params: Mapping[str, Array], inputs: Array, layers: int,
                  stop_index: int, masks: Optional[Array] = None) -> Array:
    """Sequence log-probs: sum of token log-probs up to (one past) stop."""
    lps = apply(params, inputs, layers)
    batch, length = inputs.shape
    if masks is None:
        masks = sequence_mask(inputs, stop_index)
    token_lps = jnp.take_along_axis(
        lps[:, :-1], inputs[:, 1:, None], axis=-1)[..., 0]
    return (token_lps * masks.astype(token_lps.dtype)).sum(axis=-1)


def step(params: Mapping[str, Array], tokens: Array, h: Array, c: Array,
         layers: int) -> Tuple[Array, Array, Array]:
    """One LM step for in-decode PMI (reference: decoders.py:624-630).

    Args:
        tokens: (batch,) int32 current tokens.
        h, c: (layers, batch, hidden) LM LSTM state.

    Returns:
        (log_probs (batch, vocab), h', c').
    """
    embeddings = params["embedding.weight"][tokens]
    top, h_new, c_new = lstm_ops.lstm_step(layer_params(params, layers),
                                           embeddings, h, c)
    logits = top @ params["output.0.weight"].T + params["output.0.bias"]
    return jax.nn.log_softmax(logits, axis=-1), h_new, c_new


class LanguageModel(serialize.SerializableParams):
    """A simple LSTM language model (reference: src/milan/lms.py:17-281)."""

    def __init__(self,
                 indexer: lang.Indexer,
                 embedding_size: int = 128,
                 hidden_size: int = 512,
                 layers: int = 2,
                 dropout: float = 0.5,
                 state_dict: Optional[Mapping[str, np.ndarray]] = None,
                 seed: int = 0):
        self.indexer = indexer
        self.embedding_size = embedding_size
        self.hidden_size = hidden_size
        self.layers = layers
        self.dropout = dropout

        vocab_size = len(indexer)
        key = jax.random.PRNGKey(seed)
        keys = jax.random.split(key, 2 + layers)
        self.params: Params = {
            "embedding.weight":
                jax.random.normal(keys[0], (vocab_size, embedding_size)),
            "output.0.weight":
                _linear_init(keys[1], vocab_size, hidden_size),
            "output.0.bias": jnp.zeros((vocab_size,)),
        }
        # torch zeroes the padding_idx embedding row (reference: lms.py:47-49).
        self.params["embedding.weight"] = (
            self.params["embedding.weight"].at[indexer.pad_index].set(0.0))
        for i, cell in enumerate(
                lstm_ops.lstm_init(keys[2], embedding_size, hidden_size,
                                   layers)):
            self.params[f"lstm.weight_ih_l{i}"] = cell["w_ih"]
            self.params[f"lstm.weight_hh_l{i}"] = cell["w_hh"]
            self.params[f"lstm.bias_ih_l{i}"] = cell["b_ih"]
            self.params[f"lstm.bias_hh_l{i}"] = cell["b_hh"]

        if state_dict is not None:
            self.load_state_dict(state_dict)

        self._jit_reduced = jax.jit(
            lambda p, x: apply_reduced(p, x, self.layers,
                                       self.indexer.stop_index))
        self._jit_full = jax.jit(lambda p, x: apply(p, x, self.layers))

    def __call__(self, inputs: Array, reduce: bool = False,
                 masks: Optional[Array] = None) -> Array:
        """Token (or reduced sequence) log-probs (reference: lms.py:58-101)."""
        inputs = jnp.asarray(inputs, jnp.int32)
        if reduce:
            if masks is not None:
                return apply_reduced(self.params, inputs, self.layers,
                                     self.indexer.stop_index,
                                     masks=jnp.asarray(masks))
            return self._jit_reduced(self.params, inputs)
        return self._jit_full(self.params, inputs)

    forward = __call__

    def logp(self, sequences: StrSequence, **_: Any) -> Array:
        """Log-probability of each text sequence
        (reference: lms.py:103-132)."""
        inputs = jnp.asarray(
            self.indexer(sequences, start=True, stop=True, pad=True,
                         unk=True), jnp.int32)
        return self(inputs, reduce=True)

    def fit(self,
            dataset: Any,
            annotation_index: int = 4,
            batch_size: int = 128,
            max_epochs: int = 100,
            patience: int = 4,
            hold_out: Union[float, Sequence[int]] = 0.1,
            optimizer: Optional[optax.GradientTransformation] = None,
            seed: int = 0,
            display_progress_as: Optional[str] = "train lm") -> None:
        """Train the LM on dataset annotations (reference: lms.py:134-265).

        The update step (forward + NLL + AdamW update) is one jitted,
        donated-buffer function; batches are padded to a fixed shape so XLA
        compiles a single program.

        Note on ``hold_out`` indices: like the reference (lms.py:198-202),
        the split is taken over the FLATTENED per-annotation sequence list,
        not over dataset samples — callers passing neuron-level indices
        (e.g. scripts/train_milan.py, mirroring the reference script) get
        the reference's exact (annotation-level) split semantics.
        """
        sequences = []
        for index in range(len(dataset)):
            annotation = dataset[index][annotation_index]
            if isinstance(annotation, str):
                sequences.append(annotation)
            else:
                sequences.extend(annotation)

        if isinstance(hold_out, float):
            train, val = training.random_split(sequences, hold_out=hold_out)
        else:
            train, val = training.fixed_split(sequences, hold_out)

        if optimizer is None:
            optimizer = optax.adamw(1e-3)

        pad_index = self.indexer.pad_index
        layers = self.layers

        def lossify(params: Params, inputs: Array, targets: Array) -> Array:
            lps = apply(params, inputs, layers)
            picked = jnp.take_along_axis(lps, targets[:, :, None],
                                         axis=-1)[..., 0]
            live = (targets != pad_index).astype(lps.dtype)
            return -(picked * live).sum() / jnp.maximum(live.sum(), 1.0)

        @jax.jit
        def update(params: Params, opt_state: Any, inputs: Array,
                   targets: Array) -> Tuple[Params, Any, Array]:
            loss, grads = jax.value_and_grad(lossify)(params, inputs, targets)
            # padding_idx embedding row never trains (torch semantics).
            grads["embedding.weight"] = (
                grads["embedding.weight"].at[pad_index].set(0.0))
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        eval_loss = jax.jit(lossify)

        def batches(items: Any, shuffle_key: Optional[Any]):
            order = np.arange(len(items))
            if shuffle_key is not None:
                order = np.asarray(
                    jax.random.permutation(shuffle_key, len(items)))
            for start in range(0, len(items), batch_size):
                chunk = [items[int(i)]
                         for i in order[start:start + batch_size]]
                inputs = np.asarray(self.indexer(
                    chunk, start=True, stop=False, pad=True, unk=True,
                    length=self.indexer.length or 15))
                targets = np.asarray(self.indexer(
                    chunk, start=False, stop=True, pad=True, unk=True,
                    length=self.indexer.length or 15))
                yield jnp.asarray(inputs), jnp.asarray(targets)

        params = self.params
        opt_state = optimizer.init(params)
        stopper = training.EarlyStopping(patience=patience)
        best = params
        key = jax.random.PRNGKey(seed)

        for epoch in range(max_epochs):
            key, subkey = jax.random.split(key)
            for inputs, targets in batches(train, subkey):
                params, opt_state, _ = update(params, opt_state, inputs,
                                              targets)

            val_losses = [float(eval_loss(params, inputs, targets))
                          for inputs, targets in batches(val, None)]
            val_loss = float(np.mean(val_losses)) if val_losses else 0.0
            if display_progress_as is not None:
                print(f"{display_progress_as} [epoch={epoch} "
                      f"val_loss={val_loss:.3f}]")

            if stopper(val_loss):
                params = best
                break
            if stopper.improved:
                best = params

        self.params = params

    def load_state_dict(self, state_dict: Mapping[str, np.ndarray]) -> None:
        """Ingest a torch-keyed LM state dict, failing on unknown keys."""
        for name, value in state_dict.items():
            if name not in self.params:
                raise KeyError(f"unexpected lm weight: {name}")
            expected = tuple(self.params[name].shape)
            if expected != tuple(np.shape(value)):
                raise ValueError(f"shape mismatch for {name}: {expected} "
                                 f"vs {np.shape(value)}")
            self.params[name] = jnp.asarray(value)

    def state_dict(self) -> Dict[str, np.ndarray]:
        return {name: np.asarray(value)
                for name, value in self.params.items()}

    def properties(self) -> serialize.Properties:
        return {
            "indexer": self.indexer,
            "embedding_size": self.embedding_size,
            "hidden_size": self.hidden_size,
            "layers": self.layers,
            "dropout": self.dropout,
        }

    @classmethod
    def resolve(cls, children: serialize.Children) -> serialize.Resolved:
        return {"indexer": lang.Indexer}


def _linear_init(key: Any, out_size: int, in_size: int) -> Array:
    bound = 1.0 / (in_size ** 0.5)
    return jax.random.uniform(key, (out_size, in_size), minval=-bound,
                              maxval=bound)


def lm(dataset: Any,
       annotation_index: int = 4,
       indexer_kwargs: Optional[Mapping[str, Any]] = None,
       **kwargs: Any) -> LanguageModel:
    """Instantiate an LM with vocab drawn from dataset annotations
    (reference: lms.py:283-322)."""
    if indexer_kwargs is None:
        indexer_kwargs = {}

    annotations = []
    for index in range(len(dataset)):
        annotation = dataset[index][annotation_index]
        annotations.append(lang.join(annotation))

    indexer_kwargs = dict(indexer_kwargs)
    if "tokenize" not in indexer_kwargs:
        indexer_kwargs["tokenize"] = lang.tokenizer(lemmatize=False,
                                                    ignore_stop=False,
                                                    ignore_punct=False)
    for key in ("start", "stop", "pad", "unk"):
        indexer_kwargs.setdefault(key, True)
    indexer = lang.indexer(annotations, **indexer_kwargs)

    return LanguageModel(indexer, **kwargs)
