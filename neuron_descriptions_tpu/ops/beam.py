"""Fixed-shape beam search as a ``lax.scan``.

TPU-native replacement for the AllenNLP ``BeamSearch`` the reference
delegates to (reference: src/milan/decoders.py:22,465-489). The semantics
are matched exactly so that pretrained-checkpoint decoding is reproducible
(SURVEY.md §7 "hard parts" #1):

- step 0: expand the start token to the top ``beam_size`` continuations;
- later steps: beams whose last token is the end index are frozen by
  replacing their next-token distribution with one that is 0 log-prob on the
  end index and -inf elsewhere (AllenNLP's ``log_probs_after_end``);
- each step takes the global top ``beam_size`` of the ``beam_size * vocab``
  summed scores; backpointers are recorded and sequences reconstructed at
  the end, sorted by score descending (``lax.top_k`` order).

Unlike AllenNLP, which early-exits when all beams finish, this runs a fixed
``max_steps`` — finished beams keep emitting the end token with zero score
delta, so results are identical while shapes stay static for XLA. The whole
search jits and the per-step work is a batched matmul-heavy ``step_fn`` plus
one ``top_k`` — ideal MXU/VPU split.
"""
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp

from neuron_descriptions_tpu.utils.typing import Array

__all__ = ["search"]

StepFn = Callable[[Array, Any], Tuple[Array, Any]]


def search(start_tokens: Array,
           init_state: Any,
           step_fn: StepFn,
           *,
           end_index: int,
           max_steps: int,
           beam_size: int) -> Tuple[Array, Array]:
    """Run beam search.

    Args:
        start_tokens: (batch,) int32 initial tokens (the decoder's start
            index, reference: decoders.py:419-420).
        init_state: Pytree of per-sequence state with leading dim ``batch``.
        step_fn: ``(tokens (n,), state) -> (log_probs (n, vocab), state')``.
            Must be traceable; it is called once with n=batch and then inside
            the scan with n=batch*beam_size.
        end_index: Token index that terminates a sequence.
        max_steps: Number of decode steps (sequence length).
        beam_size: Beam width.

    Returns:
        (tokens (batch, beam_size, max_steps) int32,
         log_probs (batch, beam_size)), beams sorted best-first.
    """
    batch = start_tokens.shape[0]

    # Step 0: one expansion of the start token.
    log_probs0, state = step_fn(start_tokens, init_state)
    vocab = log_probs0.shape[-1]
    top_lp, top_tok = jax.lax.top_k(log_probs0, beam_size)  # (batch, beam)

    # Tile state to (batch * beam, ...), batch-major (beams contiguous).
    def tile(leaf):
        return jnp.repeat(leaf, beam_size, axis=0)

    state = jax.tree_util.tree_map(tile, state)

    # Distribution forced onto finished beams.
    after_end = jnp.full((vocab,), -jnp.inf)
    after_end = after_end.at[end_index].set(0.0)

    def scan_fn(carry, _):
        last_tok, lp, state = carry  # (batch, beam), (batch, beam), pytree
        flat_tok = last_tok.reshape(batch * beam_size)
        step_lp, state = step_fn(flat_tok, state)
        step_lp = step_lp.reshape(batch, beam_size, vocab)

        finished = (last_tok == end_index)[..., None]
        step_lp = jnp.where(finished, after_end[None, None, :], step_lp)

        summed = lp[..., None] + step_lp  # (batch, beam, vocab)
        flat = summed.reshape(batch, beam_size * vocab)
        new_lp, flat_idx = jax.lax.top_k(flat, beam_size)
        backptr = flat_idx // vocab  # (batch, beam)
        new_tok = flat_idx % vocab

        # Reorder per-sequence state rows to follow the surviving beams.
        gather_rows = (backptr +
                       jnp.arange(batch)[:, None] * beam_size).reshape(-1)
        state = jax.tree_util.tree_map(lambda leaf: leaf[gather_rows], state)

        return (new_tok, new_lp, state), (new_tok, backptr)

    (last_tok, final_lp, _), (toks, backptrs) = jax.lax.scan(
        scan_fn, (top_tok, top_lp, state), None, length=max_steps - 1)

    # Reconstruct token sequences by walking backpointers in reverse.
    def backtrack(carry, xs):
        beam_pos = carry  # (batch, beam) position of each final beam at t+1
        tok_t, back_t = xs  # (batch, beam)
        token = jnp.take_along_axis(tok_t, beam_pos, axis=1)
        beam_pos = jnp.take_along_axis(back_t, beam_pos, axis=1)
        return beam_pos, token

    init_pos = jnp.broadcast_to(
        jnp.arange(beam_size, dtype=backptrs.dtype)[None, :],
        (batch, beam_size))
    final_pos, rev_tokens = jax.lax.scan(
        backtrack, init_pos, (toks, backptrs), reverse=True)
    # rev_tokens: (max_steps - 1, batch, beam) in forward time order
    # (reverse scan emits ys at their original positions).

    first = jnp.take_along_axis(top_tok, final_pos, axis=1)  # (batch, beam)
    tokens = jnp.concatenate(
        [first[None], rev_tokens], axis=0)  # (max_steps, batch, beam)
    tokens = jnp.moveaxis(tokens, 0, -1)  # (batch, beam, max_steps)
    return tokens.astype(jnp.int32), final_lp
