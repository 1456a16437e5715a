"""Learning sanity: the neural DMV must learn a deterministic grammar.

Generates a corpus of right-branching trees (head = previous word,
root = first word). After the count-matching init phase plus a few NLL
epochs, dev UAS must be near-perfect -- validating the full loss/grad
wiring end-to-end, not just shapes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import optax

from vlgae_tpu.models import ldndmv_decode, loss_init_rules, loss_nll
from vlgae_tpu.models.dmv_init import generate_rule_1o

from test_models import build_ldndmv


def make_batch(rng, B, L, n_token=12, n_word=20, n_tag=6):
    seq_len = rng.integers(3, L + 1, B).astype(np.int32)
    token = np.zeros((B, L), np.int32)
    word = np.zeros((B, L), np.int32)
    tag = np.zeros((B, L), np.int32)
    arcs = np.zeros((B, L), np.int32)
    for b in range(B):
        n = seq_len[b]
        ids = rng.integers(2, n_token, n)
        token[b, :n] = ids
        word[b, :n] = ids % n_word
        tag[b, :n] = ids % n_tag
        arcs[b, :n] = np.arange(n)  # right-branching: head = previous
    return {
        "token": jnp.asarray(token), "word": jnp.asarray(word),
        "tag": jnp.asarray(tag), "seq_len": jnp.asarray(seq_len),
    }, arcs


@pytest.mark.slow
def test_ldndmv_learns_right_branching():
    rng = np.random.default_rng(0)
    model = build_ldndmv()
    B, L = 32, 6
    inputs, arcs = make_batch(rng, B, L)
    params = jax.jit(model.init)(jax.random.key(0), inputs)
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    gold = {
        "dec_rule": np.zeros((B, L, 2, 2, 2), np.float32),
        "attach_rule": np.zeros((B, L, L, 2), np.float32),
        "root_rule": np.zeros((B, L), np.float32),
    }
    for b in range(B):
        n = int(inputs["seq_len"][b])
        rules = generate_rule_1o(list(arcs[b, :n]))
        gold["dec_rule"][b, :n] = rules["dec_rule"]
        gold["attach_rule"][b, :n, :n] = rules["attach_rule"]
        gold["root_rule"][b, :n] = rules["root_rule"]
    gold = {k: jnp.asarray(v) for k, v in gold.items()}

    @jax.jit
    def init_step(params, opt_state):
        def loss_fn(p):
            out = model.apply(p, inputs)
            return loss_init_rules(out, gold)[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def nll_step(params, opt_state):
        def loss_fn(p):
            out = model.apply(p, inputs)
            return loss_nll(out, inputs["seq_len"], viterbi=True)[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(60):
        params, opt_state, l1 = init_step(params, opt_state)
    for _ in range(20):
        params, opt_state, l2 = nll_step(params, opt_state)

    out = model.apply(params, inputs)
    heads = np.asarray(ldndmv_decode(out, inputs["seq_len"], mbr=False))
    correct = total = 0
    for b in range(B):
        n = int(inputs["seq_len"][b])
        correct += (heads[b, :n] == arcs[b, :n]).sum()
        total += n
    uas = correct / total
    assert uas > 0.9, f"model failed to learn right-branching: UAS={uas:.3f}"
