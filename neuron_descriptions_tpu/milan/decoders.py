"""The MILAN caption decoder, rebuilt TPU-first.

An attention LSTM in the Show-Attend-Tell family (reference:
src/milan/decoders.py:224-1260): given k visual feature vectors (one per
exemplar image), each step attends over them, gates the attended feature,
and feeds [token embedding ⧺ gated feature] to an LSTM cell whose hidden
state produces next-token log-probs. Decoding supports greedy / sample /
beam / rerank / forced-teacher strategies, PMI decoding against a language
model (reference: decoders.py:624-630), and LM rescoring of the final beam
(reference: decoders.py:495-512).

TPU design decisions:

- All compute is pure functions over a flat torch-keyed param dict; decode
  loops are ``lax.scan``s with static shapes, jitted once per
  (strategy, length, beam, mi) configuration and cached.
- Beam search is the fixed-shape ``ops.beam.search`` scan (the AllenNLP
  replacement), with the decoder state pytree (features, h, c, lm state)
  tiled across beams and reordered by backpointer gathers.
- PMI decoding fuses the LM's LSTM step into the same program — on the
  reference this is a second module call per step; here XLA schedules both
  matmul chains together.
- Training (`fit`) precomputes frozen-encoder features once, then runs a
  single donated-buffer jitted update step (NLL + the double-stochasticity
  attention regularizer ``((1-Σ_t α_t)²)``, reference: decoders.py:1018-1022)
  with early stopping on validation BLEU.
- ``predict`` can shard the unit batch over a ``jax.sharding.Mesh`` so
  captioning scales across chips (the reference is single-device).
"""
import functools
from typing import (Any, Dict, Mapping, NamedTuple, Optional, Sequence,
                    Tuple, Union)

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neuron_descriptions_tpu.milan import encoders, lms
from neuron_descriptions_tpu.ops import beam as beam_ops
from neuron_descriptions_tpu.ops import lstm as lstm_ops
from neuron_descriptions_tpu.utils import lang, metrics, serialize, training
from neuron_descriptions_tpu.utils.typing import Array, StrSequence

__all__ = [
    "Decoder",
    "DecoderOutput",
    "decoder",
    "STRATEGY_GREEDY",
    "STRATEGY_SAMPLE",
    "STRATEGY_BEAM",
    "STRATEGY_RERANK",
    "STRATEGIES",
]

Params = Dict[str, Array]

STRATEGY_GREEDY = "greedy"
STRATEGY_SAMPLE = "sample"
STRATEGY_BEAM = "beam"
STRATEGY_RERANK = "rerank"
STRATEGIES = (STRATEGY_GREEDY, STRATEGY_SAMPLE, STRATEGY_BEAM,
              STRATEGY_RERANK)

Strategy = Union[str, np.ndarray, Array]


class DecoderOutput(NamedTuple):
    """Decoder outputs (reference: decoders.py:120-150)."""

    captions: StrSequence
    scores: Array
    tokens: Array
    predictions: Optional[Array]
    attentions: Optional[Array]
    beam_captions: Optional[Sequence[StrSequence]]
    beam_scores: Optional[Array]
    beam_tokens: Optional[Array]


# ---------------------------------------------------------------------------
# Functional core.
# ---------------------------------------------------------------------------
def _linear(params: Mapping[str, Array], prefix: str, x: Array) -> Array:
    return x @ params[f"{prefix}.weight"].T + params[f"{prefix}.bias"]


def attend(params: Mapping[str, Array], query: Array,
           keys: Array) -> Array:
    """Additive attention (reference: decoders.py:29-73).

    Args:
        query: (batch, hidden) decoder hidden state.
        keys: (batch, n, feature) visual features.

    Returns:
        (batch, n) attention weights (softmax over n).
    """
    q_hidden = _linear(params, "attend.query_to_hidden", query)[:, None]
    k_hidden = _linear(params, "attend.key_to_hidden", keys)
    hidden = jnp.tanh(q_hidden + k_hidden)
    scores = _linear(params, "attend.output.0", hidden)[..., 0]
    return jax.nn.softmax(scores, axis=1)


def init_state(params: Mapping[str, Array],
               features: Array) -> Tuple[Array, Array]:
    """Initial (h, c) from mean-pooled features
    (reference: decoders.py:563-565)."""
    pooled = features.mean(axis=1)
    h = jnp.tanh(_linear(params, "init_h.0", pooled))
    c = jnp.tanh(_linear(params, "init_c.0", pooled))
    return h, c


def _cell_params(params: Mapping[str, Array]) -> Dict[str, Array]:
    return {
        "w_ih": params["lstm.weight_ih"],
        "w_hh": params["lstm.weight_hh"],
        "b_ih": params["lstm.bias_ih"],
        "b_hh": params["lstm.bias_hh"],
    }


def step(params: Mapping[str, Array],
         lm_params: Optional[Mapping[str, Array]],
         features: Array,
         tokens: Array,
         h: Array,
         c: Array,
         h_lm: Optional[Array],
         c_lm: Optional[Array],
         temperature: Array,
         *,
         mi: bool,
         lm_layers: int = 2,
         dropout_mask: Optional[Array] = None
         ) -> Tuple[Array, Array, Array, Array, Optional[Array],
                    Optional[Array]]:
    """One decoding step (reference: decoders.py:576-634).

    Attend → gate → LSTM step → log p(w); when ``mi``, subtract
    ``temperature * log p_LM(w)`` computed by stepping the LM in the same
    program. LM states are carried batch-major (batch, layers, hidden) so
    beam-tiling works on the leading axis.

    Returns:
        (predictions (batch, vocab), attentions (batch, n), h', c',
         h_lm', c_lm').
    """
    attentions = attend(params, h, features)
    attenuated = (attentions[..., None] * features).sum(axis=1)
    gate = jax.nn.sigmoid(_linear(params, "feature_gate.0", h))
    gated = attenuated * gate

    embeddings = params["embedding.weight"][tokens]
    inputs = jnp.concatenate([embeddings, gated], axis=-1)
    h, c = lstm_ops.lstm_cell(_cell_params(params), inputs, h, c)

    out = h if dropout_mask is None else h * dropout_mask
    predictions = jax.nn.log_softmax(_linear(params, "output.1", out),
                                     axis=-1)

    if mi:
        assert lm_params is not None and h_lm is not None and c_lm is not None
        lm_lp, h_lm_t, c_lm_t = lms.step(
            lm_params, tokens, jnp.swapaxes(h_lm, 0, 1),
            jnp.swapaxes(c_lm, 0, 1), lm_layers)
        h_lm = jnp.swapaxes(h_lm_t, 0, 1)
        c_lm = jnp.swapaxes(c_lm_t, 0, 1)
        predictions = predictions - temperature * jax.lax.stop_gradient(lm_lp)

    return predictions, attentions, h, c, h_lm, c_lm


def _loop_decode(params: Mapping[str, Array],
                 lm_params: Optional[Mapping[str, Array]],
                 features: Array,
                 start_index: int,
                 temperature: Array,
                 forced: Optional[Array],
                 sample_key: Optional[Array],
                 dropout_masks: Optional[Array],
                 *,
                 mode: str,
                 mi: bool,
                 lm_layers: int,
                 length: int) -> Tuple[Array, Array, Array, Array]:
    """Greedy / sample / forced decoding as one ``lax.scan``
    (reference: decoders.py:430-463).

    Returns (tokens (B, T), scores (B,), predictions (B, T, V),
    attentions (B, T, n)).
    """
    batch = features.shape[0]
    h, c = init_state(params, features)
    h_lm = c_lm = None
    if mi:
        hidden = lm_params["lstm.weight_hh_l0"].shape[1]
        h_lm = jnp.zeros((batch, lm_layers, hidden), features.dtype)
        c_lm = jnp.zeros((batch, lm_layers, hidden), features.dtype)
    currents0 = jnp.full((batch,), start_index, jnp.int32)

    def scan_fn(carry, xs):
        currents, h, c, h_lm, c_lm = carry
        forced_t, key_t, drop_t = xs
        predictions, attentions, h, c, h_lm, c_lm = step(
            params, lm_params, features, currents, h, c, h_lm, c_lm,
            temperature, mi=mi, lm_layers=lm_layers, dropout_mask=drop_t)
        if mode == "forced":
            currents = forced_t
        elif mode == "greedy":
            currents = jnp.argmax(predictions, axis=1).astype(jnp.int32)
        else:  # sample
            currents = jax.random.categorical(key_t, predictions,
                                              axis=-1).astype(jnp.int32)
        picked = jnp.take_along_axis(predictions, currents[:, None],
                                     axis=1)[:, 0]
        return (currents, h, c, h_lm, c_lm), (currents, predictions,
                                              attentions, picked)

    # lax.scan xs leaves must be arrays: slots unused by this mode carry a
    # length-shaped dummy that scan_body maps back to None.
    xs = (
        jnp.swapaxes(forced, 0, 1) if forced is not None else
        jnp.zeros((length,), jnp.int32),
        jax.random.split(sample_key, length) if sample_key is not None else
        jnp.zeros((length,), jnp.int32),
        jnp.swapaxes(dropout_masks, 0, 1) if dropout_masks is not None else
        jnp.zeros((length,), jnp.int32),
    )

    def scan_body(carry, t_xs):
        forced_t, key_t, drop_t = t_xs
        return scan_fn(carry, (
            forced_t,
            key_t if sample_key is not None else None,
            drop_t if dropout_masks is not None else None,
        ))

    (_, _, _, _, _), (tokens, predictions, attentions, picked) = jax.lax.scan(
        scan_body, (currents0, h, c, h_lm, c_lm), xs)

    tokens = jnp.swapaxes(tokens, 0, 1)
    predictions = jnp.swapaxes(predictions, 0, 1)
    attentions = jnp.swapaxes(attentions, 0, 1)
    scores = jnp.swapaxes(picked, 0, 1).sum(axis=1)
    return tokens, scores, predictions, attentions


def _beam_decode(params: Mapping[str, Array],
                 lm_params: Optional[Mapping[str, Array]],
                 features: Array,
                 start_index: int,
                 stop_index: int,
                 temperature: Array,
                 *,
                 mi: bool,
                 lm_layers: int,
                 length: int,
                 beam_size: int) -> Tuple[Array, Array]:
    """Beam search over the decoder step (reference: decoders.py:465-489).

    Returns (tokens (B, beam, T), scores (B, beam)) sorted best-first.
    """
    batch = features.shape[0]
    h, c = init_state(params, features)
    state = {"features": features, "h": h, "c": c}
    if mi:
        hidden = lm_params["lstm.weight_hh_l0"].shape[1]
        state["h_lm"] = jnp.zeros((batch, lm_layers, hidden), features.dtype)
        state["c_lm"] = jnp.zeros((batch, lm_layers, hidden), features.dtype)

    def step_fn(tokens: Array, state: Mapping[str, Array]):
        predictions, _, h, c, h_lm, c_lm = step(
            params, lm_params, state["features"], tokens, state["h"],
            state["c"], state.get("h_lm"), state.get("c_lm"), temperature,
            mi=mi, lm_layers=lm_layers)
        new_state = {"features": state["features"], "h": h, "c": c}
        if mi:
            new_state["h_lm"] = h_lm
            new_state["c_lm"] = c_lm
        return predictions, new_state

    starts = jnp.full((batch,), start_index, jnp.int32)
    return beam_ops.search(starts, state, step_fn, end_index=stop_index,
                           max_steps=length, beam_size=beam_size)


def train_loss(params: Params,
               lm_unused: None,
               features: Array,
               targets: Array,
               dropout_masks: Optional[Array],
               *,
               start_index: int,
               pad_index: int,
               length: int,
               regularization_weight: float) -> Array:
    """NLL + attention regularizer (reference: decoders.py:990-1023)."""
    tokens, _, predictions, attentions = _loop_decode(
        params, None, features, start_index,
        jnp.asarray(0.0, features.dtype), targets, None, dropout_masks,
        mode="forced", mi=False, lm_layers=0, length=length)
    del tokens
    picked = jnp.take_along_axis(predictions, targets[..., None],
                                 axis=-1)[..., 0]
    live = (targets != pad_index).astype(predictions.dtype)
    nll = -(picked * live).sum() / jnp.maximum(live.sum(), 1.0)
    regularizer = ((1.0 - attentions.sum(axis=1)) ** 2).mean()
    return nll + regularization_weight * regularizer


# ---------------------------------------------------------------------------
# The Decoder.
# ---------------------------------------------------------------------------
class Decoder(serialize.SerializableParams):
    """Neuron caption decoder (reference: src/milan/decoders.py:224-1109)."""

    def __init__(self,
                 indexer: lang.Indexer,
                 encoder: encoders.Encoder,
                 lm: Optional[lms.LanguageModel] = None,
                 embedding_size: int = 128,
                 hidden_size: int = 512,
                 attention_hidden_size: Optional[int] = None,
                 dropout: float = 0.5,
                 length: int = 15,
                 strategy: Optional[str] = None,
                 temperature: float = 0.2,
                 beam_size: int = 50,
                 state_dict: Optional[Mapping[str, np.ndarray]] = None,
                 seed: int = 0):
        if lm is not None:
            my_vocab = indexer.vocab.unique
            lm_vocab = lm.indexer.vocab.unique
            if my_vocab != lm_vocab:
                raise ValueError("lm and decoder have different vocabs;"
                                 f"lm missing {my_vocab - lm_vocab} and "
                                 f"decoder missing {lm_vocab - my_vocab}")

        if strategy is None:
            strategy = STRATEGY_BEAM if lm is None else STRATEGY_RERANK

        self.indexer = indexer
        self.encoder = encoder
        self.lm = lm
        self.embedding_size = embedding_size
        self.hidden_size = hidden_size
        self.attention_hidden_size = attention_hidden_size
        self.dropout = dropout
        self.length = length
        self.strategy = strategy
        self.temperature = temperature
        self.beam_size = beam_size
        self.training = False

        feature_size = self.feature_size
        att_hidden = attention_hidden_size or min(hidden_size, feature_size)
        key = jax.random.PRNGKey(seed)
        keys = iter(jax.random.split(key, 16))

        def linear(out_size: int, in_size: int) -> Dict[str, Array]:
            bound = 1.0 / (in_size ** 0.5)
            weight = jax.random.uniform(next(keys), (out_size, in_size),
                                        minval=-bound, maxval=bound)
            bias = jax.random.uniform(next(keys), (out_size,), minval=-bound,
                                      maxval=bound)
            return weight, bias

        self.params: Params = {}
        for name, (out_size, in_size) in (
                ("init_h.0", (hidden_size, feature_size)),
                ("init_c.0", (hidden_size, feature_size)),
                ("attend.query_to_hidden", (att_hidden, hidden_size)),
                ("attend.key_to_hidden", (att_hidden, feature_size)),
                ("attend.output.0", (1, att_hidden)),
                ("feature_gate.0", (feature_size, hidden_size)),
                ("output.1", (self.vocab_size, hidden_size)),
        ):
            weight, bias = linear(out_size, in_size)
            self.params[f"{name}.weight"] = weight
            self.params[f"{name}.bias"] = bias
        self.params["embedding.weight"] = jax.random.normal(
            next(keys), (self.vocab_size, embedding_size))
        cell = lstm_ops.lstm_cell_init(next(keys),
                                       embedding_size + feature_size,
                                       hidden_size)
        self.params["lstm.weight_ih"] = cell["w_ih"]
        self.params["lstm.weight_hh"] = cell["w_hh"]
        self.params["lstm.bias_ih"] = cell["b_ih"]
        self.params["lstm.bias_hh"] = cell["b_hh"]

        if state_dict is not None:
            self.load_state_dict(state_dict)

    # -- basic properties ---------------------------------------------------
    @property
    def feature_size(self) -> int:
        """The visual feature size (reference: decoders.py:325-328)."""
        return self.encoder.feature_shape[-1]

    @property
    def vocab_size(self) -> int:
        """The vocab size incl. specials (reference: decoders.py:330-333)."""
        return len(self.indexer)

    def train(self, mode: bool = True) -> "Decoder":
        """Toggle training mode (controls dropout and MI defaults)."""
        self.training = mode
        return self

    def eval(self) -> "Decoder":
        return self.train(False)

    # -- compiled decode cache ----------------------------------------------
    @functools.lru_cache(maxsize=32)
    def _compiled_loop(self, mode: str, mi: bool, length: int,
                       has_key: bool, has_dropout: bool):
        lm_layers = self.lm.layers if self.lm is not None else 0
        start_index = self.indexer.start_index

        def run(params, lm_params, features, temperature, forced, key,
                dropout_masks):
            return _loop_decode(params, lm_params, features, start_index,
                                temperature,
                                forced if mode == "forced" else None,
                                key if has_key else None,
                                dropout_masks if has_dropout else None,
                                mode=mode, mi=mi, lm_layers=lm_layers,
                                length=length)

        return jax.jit(run)

    @functools.lru_cache(maxsize=32)
    def _compiled_beam(self, mi: bool, length: int, beam_size: int):
        lm_layers = self.lm.layers if self.lm is not None else 0
        start_index = self.indexer.start_index
        stop_index = self.indexer.stop_index

        def run(params, lm_params, features, temperature):
            return _beam_decode(params, lm_params, features, start_index,
                                stop_index, temperature, mi=mi,
                                lm_layers=lm_layers, length=length,
                                beam_size=beam_size)

        return jax.jit(run)

    # -- forward ------------------------------------------------------------
    def __call__(self, *args: Any, **kwargs: Any) -> DecoderOutput:
        return self.forward(*args, **kwargs)

    def forward(self,
                images_or_features: Any,
                masks: Optional[Any] = None,
                encode: Optional[bool] = None,
                length: Optional[int] = None,
                strategy: Optional[Strategy] = None,
                mi: Optional[bool] = None,
                temperature: Optional[float] = None,
                beam_size: Optional[int] = None,
                key: Optional[Array] = None,
                dropout_key: Optional[Array] = None) -> DecoderOutput:
        """Decode captions (reference: decoders.py:335-523).

        Args mirror the reference; ``key`` seeds the 'sample' strategy and
        ``dropout_key`` enables output dropout (training only).
        """
        if encode is None:
            encode = masks is not None
        if length is None:
            length = self.length
        if strategy is None:
            strategy = self.strategy
        if mi is None:
            mi = self.lm is not None and not self.training
            mi &= not isinstance(strategy, str) or strategy != STRATEGY_RERANK
        if temperature is None:
            temperature = self.temperature
        if beam_size is None:
            beam_size = self.beam_size

        forced = None
        if not isinstance(strategy, str):
            forced = jnp.asarray(strategy, jnp.int32)
            if forced.ndim != 2:
                raise ValueError(f"strategy must be 2D, got {forced.ndim}")
            if forced.shape[-1] != length:
                raise ValueError(f"strategy must have length {length}, "
                                 f"got {forced.shape[-1]}")
        elif strategy not in STRATEGIES:
            raise ValueError(f"unknown strategy: {strategy}")

        if mi and strategy == STRATEGY_RERANK:
            raise ValueError("cannot set `mi=` decoding when reranking")
        if (mi or strategy == STRATEGY_RERANK) and self.lm is None:
            raise ValueError("cannot use MI/rerank decoding without an LM")
        if (mi or strategy == STRATEGY_RERANK) and self.training:
            raise ValueError("cannot use MI/rerank decoding while training")

        if encode:
            features = self.encode(images_or_features, masks=masks)
        else:
            features = jnp.asarray(images_or_features)
        batch = features.shape[0]

        lm_params = self.lm.params if self.lm is not None else None
        temp = jnp.asarray(temperature, features.dtype)

        predictions = attentions = None
        beam_captions = beam_scores = beam_tokens = None

        if forced is not None or strategy in (STRATEGY_GREEDY,
                                              STRATEGY_SAMPLE):
            mode = ("forced" if forced is not None else strategy)
            has_key = mode == STRATEGY_SAMPLE
            if has_key and key is None:
                key = jax.random.PRNGKey(0)
            dropout_masks = None
            if dropout_key is not None and self.training and self.dropout > 0:
                keep = 1.0 - self.dropout
                dropout_masks = (jax.random.bernoulli(
                    dropout_key, keep,
                    (batch, length, self.hidden_size)).astype(features.dtype)
                    / keep)
            run = self._compiled_loop(mode, mi, length, has_key,
                                      dropout_masks is not None)
            tokens, scores, predictions, attentions = run(
                self.params, lm_params, features, temp,
                forced if forced is not None else
                jnp.zeros((batch, length), jnp.int32),
                key if has_key else None,
                dropout_masks)
        else:
            run = self._compiled_beam(mi, length, beam_size)
            all_tokens, all_scores = run(self.params, lm_params, features,
                                         temp)
            beam_tokens = all_tokens
            beam_scores = all_scores
            beam_captions = tuple(
                tuple(self.indexer.reconstruct([t.tolist()
                                                for t in beam_row]))
                for beam_row in np.asarray(all_tokens))

            if strategy == STRATEGY_BEAM:
                tokens = all_tokens[:, 0]
                scores = all_scores[:, 0]
            else:  # rerank (reference: decoders.py:495-512)
                assert self.lm is not None
                starts = jnp.full((batch, beam_size, 1),
                                  self.lm.indexer.start_index, jnp.int32)
                inputs_lm = jnp.concatenate([starts, all_tokens], axis=-1)
                inputs_lm = inputs_lm.reshape(batch * beam_size, -1)
                scores_lm = self.lm(inputs_lm, reduce=True)
                scores_lm = scores_lm.reshape(batch, beam_size)
                rescored = all_scores - temp * scores_lm
                best = jnp.argmax(rescored, axis=-1)
                tokens = jnp.take_along_axis(
                    all_tokens, best[:, None, None], axis=1)[:, 0]
                scores = jnp.take_along_axis(rescored, best[:, None],
                                             axis=1)[:, 0]

        captions = self.indexer.reconstruct(
            [row.tolist() for row in np.asarray(tokens)])
        return DecoderOutput(
            captions=captions,
            scores=scores,
            tokens=tokens,
            predictions=predictions,
            attentions=attentions,
            beam_captions=beam_captions,
            beam_scores=beam_scores,
            beam_tokens=beam_tokens,
        )

    def encode(self, images: Any, masks: Optional[Any] = None) -> Array:
        """Featurize (B, k, 3, H, W) images (+ masks) → (B, k, F)
        (reference: decoders.py:525-546)."""
        images = jnp.asarray(images)
        batch = images.shape[0]
        flat_images = images.reshape(-1, *images.shape[-3:])
        flat_masks = None
        if masks is not None:
            masks = jnp.asarray(masks)
            flat_masks = masks.reshape(-1, *masks.shape[-3:])
        features = self.encoder(flat_images, masks=flat_masks)
        return features.reshape(batch, -1, self.feature_size)

    # -- scoring / evaluation ------------------------------------------------
    def score(self,
              captions: StrSequence,
              images_or_features: Any,
              masks: Optional[Any] = None,
              **kwargs: Any) -> Array:
        """Force-decode captions and return their total scores
        (reference: decoders.py:636-711)."""
        for forbidden in ("strategy", "length"):
            if forbidden in kwargs:
                raise ValueError(f"option disallowed: {forbidden}")

        images_or_features = jnp.asarray(images_or_features)
        if masks is not None:
            masks = jnp.asarray(masks)
            if len(masks) != len(images_or_features):
                raise ValueError(
                    "images_or_features and masks must have the same batch "
                    f"size; got {len(images_or_features)} and {len(masks)}")

        if len(images_or_features) == 1:
            reps = (len(captions),) + (1,) * (images_or_features.ndim - 1)
            images_or_features = jnp.tile(images_or_features, reps)
            if masks is not None:
                masks = jnp.tile(masks, (len(captions),) + (1,) *
                                 (masks.ndim - 1))
        elif len(images_or_features) != len(captions):
            raise ValueError("images_or_features must have batch size 1 or "
                             f"{len(captions)}; got "
                             f"{len(images_or_features)}")

        targets = np.asarray(self.indexer(captions))[:, 1:]
        length = targets.shape[1]
        outputs = self(images_or_features, masks=masks,
                       strategy=jnp.asarray(targets), length=length,
                       **kwargs)

        indexed = self.indexer(captions, start=False, stop=True, pad=False,
                               unk=True)
        predictions = np.asarray(outputs.predictions)
        totals = []
        for scores, indices in zip(predictions, indexed):
            totals.append(float(
                scores[np.arange(len(indices)), list(indices)].sum()))
        return jnp.asarray(totals)

    def bleu(self, dataset: Any, annotation_index: int = 4,
             predictions: Optional[StrSequence] = None, **kwargs: Any) -> Any:
        """Corpus BLEU on a dataset (reference: decoders.py:713-740)."""
        if predictions is None:
            predictions = self.predict(dataset, **kwargs)
        return metrics.bleu(dataset, predictions,
                            annotation_index=annotation_index)

    def rouge(self, dataset: Any, annotation_index: int = 4,
              predictions: Optional[StrSequence] = None,
              **kwargs: Any) -> Mapping[str, Mapping[str, float]]:
        """Average ROUGE on a dataset (reference: decoders.py:742-769)."""
        if predictions is None:
            predictions = self.predict(dataset, **kwargs)
        return metrics.rouge(dataset, predictions,
                             annotation_index=annotation_index)

    def bert_score(self, dataset: Any, annotation_index: int = 4,
                   predictions: Optional[StrSequence] = None,
                   **kwargs: Any) -> Mapping[str, float]:
        """Average BERTScore on a dataset (reference: decoders.py:771-807)."""
        if predictions is None:
            predictions = self.predict(dataset, **kwargs)
        return metrics.bert_score(dataset, predictions,
                                  annotation_index=annotation_index)

    def predict(self,
                dataset: Any,
                mask: bool = True,
                image_index: int = 2,
                mask_index: int = 3,
                batch_size: int = 16,
                features: Optional[np.ndarray] = None,
                mesh: Optional[Any] = None,
                display_progress_as: Optional[str] = "predict captions",
                **kwargs: Any) -> StrSequence:
        """Caption every sample in the dataset
        (reference: decoders.py:809-871).

        When ``mesh`` is given, each feature batch is sharded over the
        mesh's data axis before decoding, so units are captioned
        data-parallel across chips (batches are padded to the mesh size).
        """
        del display_progress_as
        captions: list = []
        for start in range(0, len(dataset), batch_size):
            stop = min(start + batch_size, len(dataset))
            if features is not None:
                batch_features = jnp.asarray(features[start:stop])
            else:
                samples = [dataset[i] for i in range(start, stop)]
                images = np.stack(
                    [np.asarray(s[image_index]) for s in samples])
                batch_masks = None
                if mask:
                    batch_masks = np.stack(
                        [np.asarray(s[mask_index]) for s in samples])
                batch_features = self.encode(jnp.asarray(images),
                                             masks=batch_masks)

            pad_to = None
            if mesh is not None:
                n = int(np.prod(list(mesh.shape.values())))
                pad_to = -(-batch_features.shape[0] // n) * n
                if pad_to != batch_features.shape[0]:
                    padding = jnp.zeros(
                        (pad_to - batch_features.shape[0],) +
                        batch_features.shape[1:], batch_features.dtype)
                    batch_features = jnp.concatenate(
                        [batch_features, padding])
                axis = list(mesh.axis_names)[0]
                sharding = jax.sharding.NamedSharding(
                    mesh, jax.sharding.PartitionSpec(axis))
                batch_features = jax.device_put(batch_features, sharding)

            outputs = self(batch_features, **kwargs)
            batch_captions = list(outputs.captions)
            captions.extend(batch_captions[:stop - start])

        return tuple(captions)

    # -- training ------------------------------------------------------------
    def fit(self,
            dataset: Any,
            mask: bool = True,
            image_index: int = 2,
            mask_index: int = 3,
            annotation_index: int = 4,
            batch_size: int = 64,
            max_epochs: int = 100,
            patience: int = 4,
            hold_out: Union[float, Sequence[int]] = 0.1,
            stop_on_bleu: bool = True,
            regularization_weight: float = 1.0,
            optimizer: Optional[optax.GradientTransformation] = None,
            features: Optional[np.ndarray] = None,
            seed: int = 0,
            display_progress_as: Optional[str] = "train decoder") -> None:
        """Train the decoder (reference: decoders.py:873-1070).

        The featurizer is frozen (reference: decoders.py:999-1002), so
        features are precomputed once up front; every optimization step is
        then one jitted donated-buffer update on device. Targets are indexed
        to the fixed decode length (static shapes; the reference pads to the
        per-batch max instead).
        """
        if optimizer is None:
            optimizer = optax.adamw(1e-3)

        # Precompute features for every neuron (frozen encoder).
        if features is None:
            features = self.encoder.map(dataset, mask=mask,
                                        image_index=image_index,
                                        mask_index=mask_index)
        features = np.asarray(features)

        # Split train/val BY NEURON, then flatten to per-annotation samples
        # (reference: decoders.py:940-972).
        if isinstance(hold_out, float):
            train, val = training.random_split(dataset, hold_out=hold_out)
        else:
            train, val = training.fixed_split(dataset, hold_out)

        def flatten(subset: training.Subset) -> Sequence[Tuple[int, str]]:
            samples = []
            for index in subset.indices:
                annotations = dataset[index][annotation_index]
                if isinstance(annotations, str):
                    annotations = [annotations]
                for annotation in annotations:
                    samples.append((index, annotation))
            return samples

        train_samples = flatten(train)
        val_samples = flatten(val)

        length = self.length
        pad_index = self.indexer.pad_index
        start_index = self.indexer.start_index

        loss_fn = functools.partial(
            train_loss, start_index=start_index, pad_index=pad_index,
            length=length, regularization_weight=regularization_weight)

        @jax.jit
        def update(params, opt_state, batch_features, targets, dropout_masks):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, None, batch_features, targets, dropout_masks)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def val_loss_fn(params, batch_features, targets):
            return train_loss(params, None, batch_features, targets, None,
                              start_index=start_index, pad_index=pad_index,
                              length=length, regularization_weight=0.0)

        def batches(samples, shuffle_key):
            order = np.arange(len(samples))
            if shuffle_key is not None:
                order = np.asarray(
                    jax.random.permutation(shuffle_key, len(samples)))
            for bstart in range(0, len(samples), batch_size):
                chunk = [samples[int(i)]
                         for i in order[bstart:bstart + batch_size]]
                idxs = [index for index, _ in chunk]
                texts = [text for _, text in chunk]
                targets = np.asarray(self.indexer(
                    texts, length=length - 1))[:, 1:]
                if targets.shape[1] < length:
                    targets = np.pad(
                        targets, ((0, 0), (0, length - targets.shape[1])),
                        constant_values=pad_index)
                yield (jnp.asarray(features[idxs]),
                       jnp.asarray(targets, jnp.int32))

        params = self.params
        opt_state = optimizer.init(params)
        stopper = training.EarlyStopping(patience=patience,
                                         decreasing=not stop_on_bleu)
        best = params
        key = jax.random.PRNGKey(seed)

        for epoch in range(max_epochs):
            self.train()
            key, shuffle_key, drop_key = jax.random.split(key, 3)
            for batch_features, targets in batches(train_samples,
                                                   shuffle_key):
                drop_key, subkey = jax.random.split(drop_key)
                keep = 1.0 - self.dropout
                dropout_masks = (jax.random.bernoulli(
                    subkey, keep,
                    (batch_features.shape[0], length, self.hidden_size))
                    .astype(batch_features.dtype) / keep)
                params, opt_state, _ = update(params, opt_state,
                                              batch_features, targets,
                                              dropout_masks)

            self.eval()
            self.params = params
            val_losses = [float(val_loss_fn(params, f, t))
                          for f, t in batches(val_samples, None)]
            val_loss = float(np.mean(val_losses)) if val_losses else 0.0
            val_predictions = self.predict(
                val, features=features[val.indices],
                strategy=STRATEGY_GREEDY, mi=False)
            val_bleu = metrics.bleu(val, val_predictions,
                                    annotation_index=annotation_index).score

            if display_progress_as is not None:
                print(f"{display_progress_as} [epoch={epoch} "
                      f"val_loss={val_loss:.3f} val_bleu={val_bleu:.1f}]")

            stop = stop_on_bleu and stopper(val_bleu)
            stop |= not stop_on_bleu and stopper(val_loss)
            if stop:
                params = best
                break
            if stopper.improved:
                best = params

        self.params = params
        self.eval()

    # -- serialization -------------------------------------------------------
    def load_state_dict(self, state_dict: Mapping[str, np.ndarray]) -> None:
        """Ingest a flat torch-keyed state dict, dispatching ``encoder.`` /
        ``lm.`` prefixes to the children (reference payload layout)."""
        own, enc, lm_sd = {}, {}, {}
        for name, value in state_dict.items():
            if name.startswith("encoder."):
                enc[name[len("encoder."):]] = value
            elif name.startswith("lm."):
                lm_sd[name[len("lm."):]] = value
            else:
                own[name] = value
        for name, value in own.items():
            if name not in self.params:
                raise KeyError(f"unexpected decoder weight: {name}")
            expected = tuple(self.params[name].shape)
            if expected != tuple(np.shape(value)):
                raise ValueError(f"shape mismatch for {name}: {expected} vs "
                                 f"{np.shape(value)}")
            self.params[name] = jnp.asarray(value)
        if enc:
            self.encoder.load_state_dict(enc)
        if lm_sd:
            if self.lm is None:
                raise ValueError("state dict has lm weights but decoder "
                                 "has no lm")
            self.lm.load_state_dict(lm_sd)

    def state_dict(self) -> Dict[str, np.ndarray]:
        out = {name: np.asarray(value)
               for name, value in self.params.items()}
        for name, value in self.encoder.state_dict().items():
            out[f"encoder.{name}"] = value
        if self.lm is not None:
            for name, value in self.lm.state_dict().items():
                out[f"lm.{name}"] = value
        return out

    def properties(self) -> serialize.Properties:
        """Reference: decoders.py:1072-1086."""
        return {
            "indexer": self.indexer,
            "encoder": self.encoder,
            "lm": self.lm,
            "embedding_size": self.embedding_size,
            "hidden_size": self.hidden_size,
            "attention_hidden_size": self.attention_hidden_size,
            "dropout": self.dropout,
            "length": self.length,
            "strategy": self.strategy,
            "temperature": self.temperature,
            "beam_size": self.beam_size,
        }

    def serializable(self) -> serialize.Children:
        """Reference: decoders.py:1088-1093."""
        serializable = {}
        if self.encoder is not None:
            serializable["encoder"] = encoders.key(self.encoder)
        return serializable

    @classmethod
    def resolve(cls, children: serialize.Children) -> serialize.Resolved:
        """Reference: decoders.py:1095-1109."""
        resolved: Dict[str, Any] = {
            "indexer": lang.Indexer,
            "lm": lms.LanguageModel,
        }
        encoder_key = children.get("encoder")
        if encoder_key is None:
            raise ValueError("serialized decoder missing encoder")
        resolved["encoder"] = encoders.parse(encoder_key)
        return resolved


def decoder(dataset: Any,
            encoder: encoders.Encoder,
            rerank_with_clip: bool = False,
            annotation_index: int = 4,
            indexer_kwargs: Optional[Mapping[str, Any]] = None,
            **kwargs: Any) -> Decoder:
    """Instantiate a new decoder with vocab from dataset annotations
    (reference: decoders.py:1214-1260)."""
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

    if rerank_with_clip:
        from neuron_descriptions_tpu.milan.rerankers import DecoderWithCLIP
        return DecoderWithCLIP(indexer, encoder, **kwargs)
    return Decoder(indexer, encoder, **kwargs)


def dryrun_train_step(mesh: Any) -> None:
    """One decoder train step with the batch sharded over the mesh.

    Used by ``__graft_entry__.dryrun_multichip`` to validate that the
    training path compiles and executes under a multi-device sharding.
    """
    batch, k, feature_size, length = 8, 3, 16, 6

    vocabulary = lang.Vocab(("unit", "test", "words", "here"))
    tok = lang.tokenizer(lemmatize=False, ignore_stop=False,
                         ignore_punct=False)
    indexer = lang.Indexer(vocabulary, tok, start=True, stop=True, pad=True,
                           unk=True)

    class _FakeEncoder(encoders.Encoder):

        feature_shape = (feature_size,)

        def forward(self, images, masks=None, **kwargs):
            return jnp.zeros((images.shape[0], feature_size))

        def properties(self):
            return {}

        def state_dict(self):
            return {}

        def load_state_dict(self, state_dict):
            del state_dict

    model = Decoder(indexer, _FakeEncoder(), length=length)
    optimizer = optax.adamw(1e-3)
    params = model.params
    opt_state = optimizer.init(params)

    loss_fn = functools.partial(
        train_loss, start_index=indexer.start_index,
        pad_index=indexer.pad_index, length=length,
        regularization_weight=1.0)

    axis = list(mesh.axis_names)[0]
    data_sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(axis))
    replicated = jax.sharding.NamedSharding(mesh,
                                            jax.sharding.PartitionSpec())

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def update(params, opt_state, features, targets):
        loss, grads = jax.value_and_grad(loss_fn)(params, None, features,
                                                  targets, None)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    features = jax.device_put(
        rng.normal(size=(batch, k, feature_size)).astype(np.float32),
        data_sharding)
    targets = jax.device_put(
        rng.integers(0, len(indexer), size=(batch, length)).astype(np.int32),
        data_sharding)
    params = jax.device_put(params, replicated)
    opt_state = jax.device_put(opt_state, replicated)

    params, opt_state, loss = update(params, opt_state, features, targets)
    assert np.isfinite(float(loss)), "non-finite decoder train loss"
