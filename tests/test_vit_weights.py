"""Pretrained ViT backbone loading for the CLIP/ViT swap (BASELINE #5).

The reference's stretch configuration swaps Faster-RCNN region features
for a pretrained CLIP/ViT encoder; here the weights enter through
``vis_encoder.vit_weights`` (a HF checkpoint dir, a flax msgpack, or an
npz), are validated against the recipe's ViT dims, grafted over the
random init at pipeline setup, and — with ``requires_grad: false`` —
are frozen in the optimizer itself (ref: BASELINE.json configs[4]).
"""

import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import synth_data  # noqa: E402  (tests/ is on sys.path via conftest)


def _tiny_cfg():
    from transformers import ViTConfig

    return ViTConfig(
        hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=32, image_size=32, patch_size=16,
        num_channels=3,
    )


def _init_tree(cfg, seed=7, bump=0.0):
    from transformers.models.vit.modeling_flax_vit import FlaxViTModule

    module = FlaxViTModule(cfg, dtype=jnp.float32, add_pooling_layer=False)
    px = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    tree = module.init(jax.random.key(seed), pixel_values=px)["params"]
    if bump:
        tree = jax.tree.map(lambda a: np.asarray(a) + bump, tree)
    return jax.tree.map(np.asarray, tree)


def _flat(tree):
    from flax import traverse_util

    return {
        "/".join(map(str, k)): np.asarray(v)
        for k, v in traverse_util.flatten_dict(tree).items()
    }


def test_load_vit_params_roundtrip_formats(tmp_path):
    """msgpack, npz, and HF-directory checkpoints all load to the same
    validated tree; shape and config mismatches fail loudly."""
    from flax import serialization

    from vlgae_tpu.models import load_vit_params

    cfg = _tiny_cfg()
    tree = _init_tree(cfg, bump=0.125)

    mp = tmp_path / "vit.msgpack"
    mp.write_bytes(serialization.msgpack_serialize(tree))
    got = load_vit_params(str(mp), cfg)
    for k, v in _flat(tree).items():
        np.testing.assert_array_equal(_flat(got)[k], v)

    # the {'params': ...} wrapping convention also loads
    mpw = tmp_path / "vit_wrapped.msgpack"
    mpw.write_bytes(serialization.msgpack_serialize({"params": tree}))
    got_w = load_vit_params(str(mpw), cfg)
    np.testing.assert_array_equal(
        _flat(got_w)[next(iter(_flat(tree)))],
        _flat(tree)[next(iter(_flat(tree)))],
    )

    npz = tmp_path / "vit.npz"
    np.savez(npz, **_flat(tree))
    got2 = load_vit_params(str(npz), cfg)
    for k, v in _flat(tree).items():
        np.testing.assert_array_equal(_flat(got2)[k], v)

    # HF checkpoint directory (flax save_pretrained layout)
    from transformers import FlaxViTModel

    hf = FlaxViTModel(cfg, dtype=jnp.float32, seed=9)
    hf.params = jax.tree.map(lambda a: np.asarray(a) + 0.5, dict(hf.params))
    ref = _flat(dict(hf.params))
    ckdir = tmp_path / "hf_ckpt"
    hf.save_pretrained(str(ckdir))
    got3 = load_vit_params(str(ckdir), cfg)
    key = "embeddings/cls_token"
    np.testing.assert_allclose(_flat(got3)[key], ref[key], rtol=1e-6)

    # loud failure: checkpoint dims disagree with the recipe's ViT
    from transformers import ViTConfig

    other = ViTConfig(hidden_size=24, num_hidden_layers=1,
                      num_attention_heads=2, intermediate_size=32,
                      image_size=32, patch_size=16, num_channels=3)
    with pytest.raises(ValueError, match="hidden_size=16"):
        load_vit_params(str(ckdir), other)

    # loud failure: a tensor with the wrong shape names the path
    bad = dict(_flat(tree))
    bad["embeddings/cls_token"] = np.zeros((1, 1, 24), np.float32)
    npz_bad = tmp_path / "vit_bad.npz"
    np.savez(npz_bad, **bad)
    with pytest.raises(ValueError, match="cls_token"):
        load_vit_params(str(npz_bad), cfg)

    # loud failure: a missing tensor names the path
    partial = {k: v for k, v in _flat(tree).items()
               if k != "embeddings/cls_token"}
    npz_missing = tmp_path / "vit_missing.npz"
    np.savez(npz_missing, **partial)
    with pytest.raises(ValueError, match="MISSING"):
        load_vit_params(str(npz_missing), cfg)


def test_graft_vit_params_scope_errors():
    from vlgae_tpu.models import graft_vit_params

    params = {"params": {"other": {"w": jnp.zeros((2,))}}}
    with pytest.raises(ValueError, match="no parameters under"):
        graft_vit_params(params, {"w2": np.ones((3,))})


@pytest.mark.slow
def test_vit_weights_reach_model_and_stay_frozen(
    tmp_path_factory, tmp_path, monkeypatch
):
    """e2e through the CLI: exp=vlgae_vit with vis_encoder.vit_weights
    set — the checkpoint tensors must (a) land in the initialized
    pipeline params bit-for-bit, and (b) still be there after training
    (requires_grad=false -> optimizer-frozen), while the rest of the
    model trains normally."""
    from flax import serialization, traverse_util

    cfg = _tiny_cfg()
    tree = _init_tree(cfg, seed=11, bump=0.25)
    ck = tmp_path / "vit_pretrained.msgpack"
    ck.write_bytes(serialization.msgpack_serialize(tree))

    corpus = tmp_path_factory.mktemp("vlparse_vitw")
    synth_data.make_corpus(corpus, n_imgs=4, feat_dim=32, n_box=8,
                           image_size=32)
    monkeypatch.chdir(tmp_path)
    import train as train_cli

    pipe, test_result = train_cli.main([
        "exp=vlgae_vit",
        f"root={corpus.parent}",
        f"datamodule.train_path={corpus}/train",
        f"datamodule.train_init_path={corpus}/init",
        f"datamodule.dev_path={corpus}/val",
        f"datamodule.test_path={corpus}/test",
        f"datamodule.sg_path={corpus}/vlparse.json",
        "datamodule.vit_image_size=32",
        "datamodule.vit_patch_size=16",
        "datamodule.train_dataloader.batch_size=8",
        "datamodule.train_dataloader.num_bucket=1",
        "datamodule.dev_dataloader.num_bucket=1",
        "datamodule.dev_dataloader.batch_size=8",
        "datamodule.test_dataloader.num_bucket=1",
        "datamodule.test_dataloader.batch_size=8",
        "trainer.max_epochs=2",
        "model.init_epoch=1",
        "embedding.use_subword=false",
        "embedding.use_word=true",
        "_hidden_size=32",
        "_match_hidden_size=16",
        "_rank=4",
        "model.dep_model_cfg.mid_ff.n_bottleneck=8",
        "vis_encoder.vit_hidden_size=16",
        "vis_encoder.vit_num_layers=1",
        "vis_encoder.vit_num_heads=2",
        "vis_encoder.vit_intermediate_size=32",
        f"vis_encoder.vit_weights={ck}",
    ])
    assert "uas" in test_result

    flat = traverse_util.flatten_dict(pipe.state.params)
    prefix = ("params", "vis_encoder", "vit")
    got = {
        "/".join(map(str, k[len(prefix):])): np.asarray(v)
        for k, v in flat.items() if k[: len(prefix)] == prefix
    }
    want = _flat(tree)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k].astype(got[k].dtype))

    # ...while trainable weights did move (training actually happened)
    head = [
        np.asarray(v) for k, v in flat.items()
        if k[:2] == ("params", "vis_encoder") and k[2] != "vit"
    ]
    assert head, "vis_encoder head params missing"
