"""Tests for fixed-shape beam search.

Oracle: a literal numpy transcription of the AllenNLP BeamSearch algorithm
(the semantics the reference decoder relies on, reference:
src/milan/decoders.py:465-489). The transcription is generic over a step
function with state, so it also validates beam-following state reordering.
"""
import jax
import jax.numpy as jnp
import numpy as np

from neuron_descriptions_tpu.ops import beam

VOCAB = 6
END = 3


def numpy_beam_search(step_fn, start, state, end, max_steps, beam_size):
    """AllenNLP-style beam search in numpy.

    step_fn: (tokens (n,), state (n, ...)) -> (log_probs (n, vocab), state').
    """
    batch = len(start)
    lp0, state = step_fn(start, state)
    vocab = lp0.shape[-1]
    order = np.argsort(-lp0, axis=1, kind="stable")[:, :beam_size]
    lps = np.take_along_axis(lp0, order, axis=1)
    seqs = order[:, :, None]  # (batch, beam, 1)
    state = np.repeat(state, beam_size, axis=0)  # batch-major tiling

    after_end = np.full((vocab,), -np.inf)
    after_end[end] = 0.0

    for _ in range(max_steps - 1):
        last = seqs[:, :, -1]
        step_lp, state = step_fn(last.reshape(-1), state)
        step_lp = step_lp.reshape(batch, beam_size, vocab)
        step_lp = np.where((last == end)[:, :, None], after_end[None, None],
                           step_lp)
        summed = lps[:, :, None] + step_lp
        flat = summed.reshape(batch, -1)
        idx = np.argsort(-flat, axis=1, kind="stable")[:, :beam_size]
        lps = np.take_along_axis(flat, idx, axis=1)
        backptr = idx // vocab
        tok = idx % vocab
        rows = (backptr + np.arange(batch)[:, None] * beam_size).reshape(-1)
        state = state[rows]
        seqs = np.concatenate(
            [np.take_along_axis(seqs, backptr[:, :, None], axis=1),
             tok[:, :, None]], axis=2)
    return seqs, lps


def markov_steps(trans: np.ndarray):
    """Stateless step fns (numpy + jax) for a Markov transition table."""
    trans_j = jnp.asarray(trans)

    def np_step(tokens, state):
        return trans[tokens], state

    def jax_step(tokens, state):
        return trans_j[tokens], state

    return np_step, jax_step


def random_log_trans(seed):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((VOCAB, VOCAB))
    return logits - np.log(np.exp(logits).sum(-1, keepdims=True))


def markov_seq_score(trans, start_tok, seq):
    """Score a sequence under the freeze-after-END semantics."""
    total, prev = 0.0, start_tok
    for tok in seq:
        if prev == END:
            assert tok == END
            continue
        total += trans[prev, tok]
        prev = tok
    return total


def assert_beams_match(trans, start, tokens, lps, want_tokens, want_lps,
                       tol=1e-4):
    """Compare beams tolerating reordering of near-tied scores.

    JAX scores in float32 and the numpy oracle in float64, so beams whose
    totals differ by less than float32 resolution may legitimately swap.
    """
    np.testing.assert_allclose(np.asarray(lps), want_lps, atol=tol)
    for b in range(len(start)):
        for j in range(tokens.shape[1]):
            # Every reported beam's score must equal its sequence's true
            # score — this catches token/backpointer corruption even when
            # tied beams reorder.
            got_seq = [int(t) for t in np.asarray(tokens[b, j])]
            np.testing.assert_allclose(
                float(lps[b, j]),
                markov_seq_score(trans, start[b], got_seq), atol=tol)
        # Note: exact token equality is NOT asserted — random Markov tables
        # admit true ties (different orderings of the same transition
        # multiset score identically), and float32 vs float64 arithmetic
        # legitimately picks different members of the tied set. Rank-for-
        # rank score equality plus per-sequence score consistency pins the
        # semantics up to those ties.


def test_matches_reference_semantics():
    for seed in range(3):
        trans = random_log_trans(seed)
        np_step, jax_step = markov_steps(trans)
        start = np.array([0, 1, 5], dtype=np.int32)

        tokens, lps = beam.search(jnp.asarray(start), jnp.zeros((3, 1)),
                                  jax_step, end_index=END, max_steps=7,
                                  beam_size=4)
        want_tokens, want_lps = numpy_beam_search(
            np_step, start, np.zeros((3, 1)), END, 7, 4)

        assert_beams_match(trans, start, tokens, lps, want_tokens, want_lps)


def test_statefull_step_reordering():
    """Log-probs depend on accumulated per-beam state, so any error in
    beam-following state gathers changes the output."""

    def np_step(tokens, state):
        new_state = state + tokens[:, None].astype(np.float64)
        logits = np.concatenate(
            [np.cos(new_state + i) for i in range(VOCAB)], axis=1)
        lp = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
        return lp, new_state

    def jax_step(tokens, state):
        new_state = state + tokens[:, None].astype(jnp.float32)
        logits = jnp.concatenate(
            [jnp.cos(new_state + i) for i in range(VOCAB)], axis=1)
        return jax.nn.log_softmax(logits, axis=-1), new_state

    start = np.array([0, 2], dtype=np.int32)
    tokens, lps = beam.search(jnp.asarray(start), jnp.zeros((2, 1)),
                              jax_step, end_index=END, max_steps=5,
                              beam_size=3)
    want_tokens, want_lps = numpy_beam_search(
        np_step, start, np.zeros((2, 1)), END, 5, 3)

    # f32 cos/log_softmax accumulates ~3e-4 drift vs the f64 oracle.
    np.testing.assert_allclose(np.asarray(lps), want_lps, atol=2e-3)
    np.testing.assert_array_equal(np.asarray(tokens), want_tokens)


def test_finished_beams_freeze():
    """Once a beam emits END it only ever extends with END at no cost."""
    # Transition table that always prefers END.
    trans = np.full((VOCAB, VOCAB), -10.0)
    trans[:, END] = -0.1
    _, jax_step = markov_steps(trans)

    tokens, lps = beam.search(jnp.asarray([0], dtype=jnp.int32), (),
                              jax_step, end_index=END, max_steps=6,
                              beam_size=2)
    top = np.asarray(tokens[0, 0])
    np.testing.assert_array_equal(top, [END] * 6)
    np.testing.assert_allclose(float(lps[0, 0]), -0.1, atol=1e-6)


def test_beam_one_equals_greedy():
    trans = random_log_trans(7)
    _, jax_step = markov_steps(trans)
    start = np.array([1, 4], dtype=np.int32)

    tokens, _ = beam.search(jnp.asarray(start), (), jax_step,
                            end_index=END, max_steps=5, beam_size=1)

    for b, s in enumerate(start):
        prev, seq = s, []
        for _ in range(5):
            nxt = END if prev == END else int(np.argmax(trans[prev]))
            seq.append(nxt)
            prev = nxt
        np.testing.assert_array_equal(np.asarray(tokens[b, 0]), seq)


def test_search_jits():
    trans = jnp.asarray(random_log_trans(9))

    @jax.jit
    def run(start):
        def step_fn(tokens, state):
            return trans[tokens], state

        return beam.search(start, (), step_fn, end_index=END, max_steps=5,
                           beam_size=3)

    tokens, lps = run(jnp.asarray([0, 1], dtype=jnp.int32))
    assert tokens.shape == (2, 3, 5)
    assert lps.shape == (2, 3)


def test_tie_breaking_prefers_lower_token_then_earlier_beam():
    """Pin tie-break order (SURVEY.md §7 hazard #1).

    AllenNLP's BeamSearch takes ``torch.topk`` over the flattened
    (beam * vocab) scores; on exact ties torch returns the earlier flat
    index, i.e. earlier beam first, then lower token id. ``lax.top_k`` has
    the same first-occurrence guarantee, which this test pins: a uniform
    distribution must select token ids 0..beam-1 in order at step 0, and
    keep beam order stable on all-tied steps.
    """
    vocab = 6

    def step_fn(tokens, state):
        return jnp.zeros((tokens.shape[0], vocab)), state

    tokens, lps = beam.search(jnp.asarray([0], dtype=jnp.int32), (),
                              step_fn, end_index=END, max_steps=3,
                              beam_size=4)
    # Step 0: top-4 of a uniform row = token ids 0,1,2,3 in that order.
    # Later steps: ALL (beam, token) continuations tie at score 0, so the
    # flat top-k keeps the earliest flat indices — all four survivors
    # descend from beam 0 with tokens 0,1,2,3 — and backtracking rewrites
    # the beam prefixes accordingly.
    expected = [[0, 0, 0], [0, 0, 1], [0, 0, 2], [0, 0, 3]]
    np.testing.assert_array_equal(np.asarray(tokens[0]), expected)
    np.testing.assert_array_equal(np.asarray(lps[0]), np.zeros(4))


def test_post_end_tokens_stay_end():
    """After a beam emits END, it must keep emitting END with zero score
    delta (AllenNLP log_probs_after_end semantics)."""
    vocab = 5

    def step_fn(tokens, state):
        # Strongly prefer END at step 0, then prefer token 1.
        lp = jnp.where(
            (state == 0)[:, None],
            jnp.log(jnp.asarray([0.01, 0.01, 0.01, 0.96, 0.01]))[None],
            jnp.log(jnp.asarray([0.1, 0.6, 0.1, 0.1, 0.1]))[None])
        return lp, state + 1

    state = jnp.zeros((1,), jnp.int32)
    tokens, lps = beam.search(jnp.asarray([0], dtype=jnp.int32), state,
                              step_fn, end_index=END, max_steps=4,
                              beam_size=2)
    best = np.asarray(tokens[0, 0])
    assert best[0] == END
    np.testing.assert_array_equal(best, [END] * 4)
    np.testing.assert_allclose(float(lps[0, 0]), np.log(0.96), atol=1e-6)
