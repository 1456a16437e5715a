"""Data pipeline tests on a synthetic VLParse corpus."""

import numpy as np
import pytest

from vlgae_tpu.data import (
    ConstantTokenNumSampler,
    DepDataModule,
    TokenVocabulary,
    VLParseDataModule,
    normalize_word,
)

import synth_data


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("vlparse")
    synth_data.make_corpus(root, n_imgs=6, feat_dim=32, n_box=10)
    return root


@pytest.fixture(scope="module")
def dm(corpus):
    dm = VLParseDataModule(
        use_img=False,
        use_gold_scene_graph=False,
        sg_path=str(corpus / "vlparse.json"),
        train_path=str(corpus / "train"),
        train_init_path=str(corpus / "init"),
        dev_path=str(corpus / "val"),
        test_path=str(corpus / "test"),
        num_lex=10,
        train_dataloader={"token_size": 64, "num_bucket": 3, "batch_size": 8},
        dev_dataloader={"token_size": 64, "num_bucket": 2, "batch_size": 8},
        test_dataloader={"token_size": 64, "num_bucket": 2, "batch_size": 8},
        max_len={"train": 10},
        pad_boxes=12,
        sample_boxes=5,
    )
    return dm.setup()


def test_normalize_word():
    assert normalize_word("-LRB-") == "("
    assert normalize_word("a1b23") == "a0b00"
    assert normalize_word(r"a\/b") == "a/b"


def test_vocab_backoff():
    v = TokenVocabulary()
    v.update(["dog:NN", "<unk>:NN", "<unk>:VB"])
    v.build()
    assert v["dog:NN"] == v.word2idx["dog:NN"]
    assert v["zebra:NN"] == v.word2idx["<unk>:NN"]
    assert v["zebra:XX"] == v.unk_index


def test_datamodule_setup(dm):
    assert len(dm.datasets["train"]) > 0
    counts = dm.get_vocab_count()
    assert counts["n_word"] > 2 and counts["n_tag"] > 2 and counts["n_token"] > 2
    assert dm.token2word is not None and dm.token2tag is not None
    assert len(dm.token2word) == counts["n_token"]
    # dev keeps only instances with scene graphs
    assert all(i["has_sg"] for i in dm.datasets["dev"])


def test_batches_shapes(dm):
    for x, y in dm.batches("train"):
        B, L = x["word"].shape
        assert L % 8 == 0
        assert x["token"].shape == (B, L)
        assert x["tag"].shape == (B, L)
        assert y["arc"].shape == (B, L)
        assert x["vis_box_feat"].shape == (B, 12, 32)
        assert x["vis_box_mask"].shape == (B, 12)
        assert y["sg_box"].shape == (B, L, 8)
        assert (x["seq_len"] <= L).all()
        # only sampled 5 boxes during training
        assert x["vis_box_mask"].sum(1).max() <= 5
        break
    for x, y in dm.batches("dev"):
        # eval uses all (<= pad) boxes
        assert x["vis_box_mask"].sum(1).max() == 10
        break


def test_sg_targets(dm):
    x, y = next(dm.batches("dev", shuffle=False))
    # token index 1 (0-based) is OBJ type=1, token 2 is REL type=3
    assert (y["sg_type"][:, 1] == 1).all()
    assert (y["sg_type"][:, 2] == 3).all()
    assert y["sg_mask"][:, 1].all()
    assert (y["sg_box"][:, 1, :4] != 0).any()


def test_projectivity_filter(corpus, dm):
    for inst in dm.datasets["train"]:
        from vlgae_tpu.struct.alg import isprojective

        assert isprojective(inst["arc"])


def test_sampler_token_budget():
    rng = np.random.default_rng(0)
    seq_len = rng.integers(3, 40, 200).tolist()
    s = ConstantTokenNumSampler(seq_len, max_token=100, num_bucket=5)
    seen = set()
    for batch in s:
        assert sum(seq_len[i] for i in batch) <= 100 + max(seq_len)
        seen.update(batch)
        assert s.pad_len(batch) % 8 == 0
        assert s.pad_len(batch) >= max(seq_len[i] for i in batch)
    assert seen == set(range(200))


def test_sampler_epoch_shuffle():
    seq_len = list(range(3, 43))
    s = ConstantTokenNumSampler(seq_len, max_token=50, num_bucket=4)
    e1 = [tuple(b) for b in s]
    e2 = [tuple(b) for b in s]
    assert e1 != e2  # epoch-seeded reshuffling
    flat = sorted(i for b in e2 for i in b)
    assert flat == list(range(40))


def test_char_field(corpus):
    import jax
    import jax.numpy as jnp

    from vlgae_tpu.models import CompositeEmbedding
    from vlgae_tpu.models.embedding import EmbeddingItemCfg

    dm = DepDataModule(
        train_path=str(corpus / "train.conll"),
        dev_path=str(corpus / "val.conll"),
        test_path=str(corpus / "test.conll"),
        num_lex=10, use_char=True, max_word_len=8,
        train_dataloader={"batch_size": 8},
        dev_dataloader={"batch_size": 8},
        test_dataloader={"batch_size": 8},
    ).setup()
    n_char = dm.get_vocab_count()["n_char"]
    assert n_char > 3
    x, _ = next(iter(dm.batches("train", shuffle=False)))
    B, L = x["word"].shape
    assert x["char"].shape == (B, L, 8)
    # pad words are all-zero char rows; real words have nonzero chars
    for b in range(B):
        n = x["seq_len"][b]
        assert (x["char"][b, :n, 0] > 0).all()
        assert (x["char"][b, n:] == 0).all()

    emb = CompositeEmbedding(items=(
        EmbeddingItemCfg("char", "char", "char", n_vocab=n_char,
                         embedding_dim=12, char_dim=6,
                         kernel_sizes=(1, 3), filter_nums=(4, 4)),
    ))
    params = emb.init(jax.random.key(0), {"char": jnp.asarray(x["char"])})
    h, _ = emb.apply(params, {"char": jnp.asarray(x["char"])})
    assert h.shape == (B, L, 12)
    h = np.asarray(h)
    assert np.all(np.isfinite(h))
    # padding words embed to exactly zero
    for b in range(B):
        assert np.all(h[b, x["seq_len"][b]:] == 0.0)


def test_no_create_entry_words_tie_to_unk(tmp_path):
    """Dev/test-only words without pretrained vectors share the unk row
    and never train private vectors (fastNLP StaticEmbedding semantics,
    ref: datamodule.py:179-224)."""
    import jax
    import jax.numpy as jnp

    from vlgae_tpu.data.vocab import Vocabulary
    from vlgae_tpu.models.embedding import (
        EmbeddingItemCfg,
        StaticItem,
        glove_row_map,
        load_glove,
    )

    v = Vocabulary()
    v.update(["dog", "cat"])                      # train words
    v.update(["zebra", "dog", "yak"], no_create_entry=True)  # dev-only
    v.build()
    glove = tmp_path / "glove.txt"
    dim = 3
    glove.write_text(
        "dog 1 0 0\ncat 0 1 0\nzebra 0 0 1\n"
    )
    table, found = load_glove(str(glove), v, dim)
    assert found == {"dog", "cat", "zebra"}
    rm = glove_row_map(v, found)
    # zebra: no-create but found -> own row; yak: no-create, missing -> unk
    assert rm[v["zebra"]] == v["zebra"]
    assert rm[v["yak"]] == v.unk_index
    assert rm[v["dog"]] == v["dog"]

    item = StaticItem(
        EmbeddingItemCfg("w", "word", "static", n_vocab=len(v),
                         embedding_dim=dim),
        pretrained=table, row_map=rm,
    )
    ids = jnp.asarray([[v["yak"], v.unk_index, v["dog"]]])
    params = item.init(jax.random.key(0), ids)
    h, _ = item.apply(params, ids)
    # yak's embedding IS the unk embedding
    np.testing.assert_array_equal(np.asarray(h)[0, 0], np.asarray(h)[0, 1])
    # and yak's grad accumulates into the unk row, not a private row
    def loss(p):
        out, _ = item.apply(p, jnp.asarray([[v["yak"]]]))
        return jnp.sum(out)

    g = jax.grad(loss)(params)["params"]["embedding"]
    assert np.abs(np.asarray(g)[v.unk_index]).sum() > 0
    assert np.abs(np.asarray(g)[v["yak"]]).sum() == 0
