"""Orbax checkpoint save/load roundtrip through the Pipeline."""

import numpy as np

import jax
import jax.numpy as jnp


def test_checkpoint_roundtrip(tmp_path):
    from vlgae_tpu.training import Pipeline

    from test_models import build_ldndmv, make_inputs

    rng = np.random.default_rng(0)
    model = build_ldndmv()

    class FakeDM:
        datasets = {"train": [1] * 8}
        vocabs = {}

        def get_vocab_count(self):
            return {}

    pipe = Pipeline(model, FakeDM(), {"optimizer": {"args": {"lr": 1e-3}}},
                    workdir=str(tmp_path))
    inputs = make_inputs(rng)
    pipe.init_state((inputs, {}), seed=0)
    orig = jax.tree_util.tree_map(np.asarray, pipe.state.params)
    path = pipe.save_checkpoint("best")

    # perturb and restore
    pipe.state.params = jax.tree_util.tree_map(
        lambda x: x + 1.0, pipe.state.params
    )
    pipe.load_checkpoint(path)
    restored = jax.tree_util.tree_map(np.asarray, pipe.state.params)
    flat_o, _ = jax.tree_util.tree_flatten(orig)
    flat_r, _ = jax.tree_util.tree_flatten(restored)
    for a, b in zip(flat_o, flat_r):
        np.testing.assert_array_equal(a, b)
