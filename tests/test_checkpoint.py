"""Orbax checkpoint save/load roundtrip through the Pipeline."""

import numpy as np

import jax
import jax.numpy as jnp
import pytest


@pytest.mark.slow
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


@pytest.mark.slow
def test_export_forward_roundtrip(tmp_path):
    import numpy as np
    import jax.numpy as jnp

    from vlgae_tpu.training.export import export_forward, load_forward
    from test_models import build_ldndmv, make_inputs

    rng = np.random.default_rng(0)
    model = build_ldndmv()
    inputs = make_inputs(rng)
    params = jax.jit(model.init)(jax.random.key(0), inputs)
    path = str(tmp_path / "fwd.stablehlo")
    size = export_forward(model, params, inputs, path, platforms=("cpu",))
    assert size > 1000

    fn = load_forward(path)
    out = fn(dict(inputs))
    want = model.apply(params, inputs, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out["merged_attach"]),
        np.asarray(want["merged_attach"]), rtol=1e-5, atol=1e-5,
    )
