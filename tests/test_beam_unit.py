"""Unit tests for the beam-search machinery with scripted step functions."""

import jax.numpy as jnp
import numpy as np

from doc2tex_tpu.decode.beam import beam_decode
from doc2tex_tpu.decode.greedy import greedy_decode

V = 4  # tokens: 0=pad, 1=start, 2=end, 3=x


def scripted_step(script):
    """step_fn emitting scripted per-step log-prob rows.

    script: list over steps of (K*B, V) logits arrays.  State is the step
    index (jnp scalar).
    """

    def step(state, tokens):
        t = state
        logits = jnp.asarray(script)[t]
        return t + 1, logits

    return step


def gather_noop(state, beam_idx, batch_size, k):
    return state


class TestGreedy:
    def test_stops_at_end_token(self):
        B = 1
        big, small = 10.0, -10.0
        script = [
            [[small, small, small, big]],   # -> 3
            [[small, small, big, small]],   # -> 2 = [s]
            [[big, small, small, small]],   # never reached
        ]
        tokens, lengths = greedy_decode(
            scripted_step(script), jnp.int32(0), B, 3,
            start_token=1, end_token=2, pad_token=0,
        )
        assert np.asarray(tokens)[0].tolist() == [3, 2, 0]
        assert int(lengths[0]) == 2


class TestBeamFinishedStore:
    def test_finished_hypothesis_survives_eviction(self):
        """A hypothesis that finishes early with a good normalized score
        must win even if live continuations later evict its slot
        (reference keeps every completed hypothesis aside,
        seq2seq.py:170-178)."""
        B, K = 1, 2
        # step 0: only beam 0 live (beam 1 at -inf). token 2 ([s]) has the
        # TOP score -> beam slot picks [2] (finished, score -0.1) and [3]
        # (live, score -0.3).
        s0 = np.full((K, V), -20.0, np.float32)
        s0[0, 2] = -0.1   # finish immediately
        s0[0, 3] = -0.3   # live alternative
        # step 1+: live beam keeps extending with strong scores so its raw
        # cumulative overtakes the frozen one and evicts it from the slots,
        # but its normalized score stays worse than the finished hypothesis.
        s1 = np.full((K, V), -20.0, np.float32)
        s1[:, 3] = -0.05
        script = [s0, s1, s1, s1]

        tokens, scores = beam_decode(
            scripted_step(script), jnp.int32(0), gather_noop,
            batch_size=B, beam_size=K, max_steps=4,
            start_token=1, end_token=2, pad_token=0,
        )
        row = np.asarray(tokens)[0].tolist()
        # normalized: finished [2] = -0.1/2 = -0.05 ;
        # live [3,3,3,3] = (-0.3-3*0.05)/5 = -0.09 -> finished wins
        assert row[0] == 2, row

    def test_live_fallback_when_nothing_finishes(self):
        B, K = 1, 2
        s = np.full((K, V), -20.0, np.float32)
        s[:, 3] = -0.1
        script = [s, s, s]
        tokens, scores = beam_decode(
            scripted_step(script), jnp.int32(0), gather_noop,
            batch_size=B, beam_size=K, max_steps=3,
            start_token=1, end_token=2, pad_token=0,
        )
        assert np.asarray(tokens)[0].tolist() == [3, 3, 3]

    def test_better_late_finisher_replaces_store(self):
        B, K = 1, 2
        s0 = np.full((K, V), -20.0, np.float32)
        s0[0, 2] = -2.0   # an early but bad finisher
        s0[0, 3] = -0.1
        s1 = np.full((K, V), -20.0, np.float32)
        s1[:, 2] = -0.05  # the live beam finishes later with a better score
        script = [s0, s1, s1]
        tokens, scores = beam_decode(
            scripted_step(script), jnp.int32(0), gather_noop,
            batch_size=B, beam_size=K, max_steps=3,
            start_token=1, end_token=2, pad_token=0,
        )
        row = np.asarray(tokens)[0].tolist()
        # late finisher [3, 2]: norm (-0.15)/3 = -0.05 beats [2]: -2.0/2
        assert row[:2] == [3, 2], row


class TestTFMSlotAncestry:
    def test_fixed_slot_cache_matches_full_pass_through_reorders(self):
        """The TFM decode never physically reorders its KV caches: beam
        shuffles only permute the (B, K, T, K) ancestry selection
        (``TFMState.sel``, ``beam.tfm_gather``).  After a sequence of
        steps interleaved with reorders — including DUPLICATED parents,
        the case where physical reordering and ancestry tracking differ
        most — each hypothesis's step logits must equal a full causal
        forward over its gathered token prefix."""
        import jax

        from doc2tex_tpu.decode.beam import tfm_gather
        from doc2tex_tpu.models.decoder_tfm import TransformerDecoder

        B, K, S, d, vocab = 2, 3, 4, 16, 6
        dec = TransformerDecoder(
            num_classes=vocab, d_model=d, nhead=2, num_decoder_layers=2,
            dim_feedforward=32, dropout=0.0, max_seq_len=8,
        )
        rng = np.random.default_rng(0)
        memory = jnp.asarray(rng.normal(size=(B, S, d)), jnp.float32)
        variables = dec.init(
            jax.random.PRNGKey(0), memory, jnp.ones((B, 3), jnp.int32), False
        )

        state = dec.apply(
            variables, memory, 5, K, method=TransformerDecoder.init_state
        )
        prefixes = [[[] for _ in range(K)] for _ in range(B)]

        def run_step(tokens_bk):
            nonlocal state
            toks = jnp.asarray(np.asarray(tokens_bk).reshape(B * K), jnp.int32)
            state, logits = dec.apply(
                variables, state, toks, method=TransformerDecoder.step
            )
            for b in range(B):
                for k in range(K):
                    prefixes[b][k].append(int(tokens_bk[b][k]))
            return logits.reshape(B, K, vocab)

        def reorder(beam_idx):
            nonlocal state
            state = tfm_gather(state, jnp.asarray(beam_idx, jnp.int32), B, K)
            for b in range(B):
                prefixes[b] = [list(prefixes[b][j]) for j in beam_idx[b]]

        run_step([[1, 1, 1], [1, 1, 1]])            # GO everywhere
        reorder([[2, 0, 0], [1, 2, 1]])             # duplicated parents
        run_step([[3, 4, 5], [5, 3, 4]])
        reorder([[1, 1, 2], [0, 2, 2]])
        logits = np.asarray(run_step([[4, 5, 3], [3, 5, 4]]), np.float32)

        # oracle: full causal pass over each hypothesis's prefix
        for b in range(B):
            for k in range(K):
                tgt = jnp.asarray([prefixes[b][k]], jnp.int32)   # (1, 3)
                full = dec.apply(
                    variables, memory[b:b + 1], tgt, False
                )  # (1, 3, vocab)
                want = np.asarray(full, np.float32)[0, -1]
                got = logits[b, k]
                np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
