"""Model-family variant drives on the real TPU: lang_only (RNN encoder +
variational LSTM recipe), classic DMV + EM, and the tiny-BERT subword
embedding path (stride windows forced by a small position limit)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _tpu_drive_common import setup  # noqa: E402

setup("/tmp/variants_tpu", 4500, "VARIANTS")

from pathlib import Path  # noqa: E402

from synth_data import make_corpus  # noqa: E402

corpus = make_corpus(Path("vlparse"), n_imgs=8, feat_dim=32, n_box=8)
print("corpus done", flush=True)

# --- leg 1: exp=lang_only (RNN encoder, exponential LR) ---------------
import train as train_cli  # noqa: E402

t0 = time.time()
pipe, res = train_cli.main([
    "exp=lang_only", "root=.",
    "datamodule.train_path=vlparse/train",
    "datamodule.train_init_path=vlparse/init",
    "datamodule.dev_path=vlparse/val",
    "datamodule.test_path=vlparse/test",
    "datamodule.sg_path=vlparse/vlparse.json",
    "datamodule.pad_boxes=8",
    "datamodule.train_dataloader.batch_size=8",
    "datamodule.train_dataloader.num_bucket=1",
    "datamodule.dev_dataloader.num_bucket=1",
    "datamodule.dev_dataloader.batch_size=8",
    "datamodule.test_dataloader.num_bucket=1",
    "datamodule.test_dataloader.batch_size=8",
    "trainer.max_epochs=2", "trainer.accumulate_grad_batches=2",
    "model.init_epoch=1", "_hidden_size=32", "_rank=4",
    "encoder.hidden_size=16", "encoder.num_layers=1",
    "model.root_emb_dim=8", "model.dec_emb_dim=8",
])
assert "uas" in res
print("LANG_ONLY OK", round(time.time() - t0, 1), "s uas=", res["uas"],
      flush=True)

# --- leg 2: classic DMV + EM ------------------------------------------
import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vlgae_tpu.models import dmv_model  # noqa: E402

t0 = time.time()
rng = np.random.default_rng(0)
n_token = 30
toks = [rng.integers(1, n_token, rng.integers(3, 8)) for _ in range(64)]
L = max(len(t) for t in toks)
tok = np.zeros((64, L), np.int32)
lens = np.zeros(64, np.int32)
for i, t in enumerate(toks):
    tok[i, :len(t)] = t
    lens[i] = len(t)
tok, lens = jnp.asarray(tok), jnp.asarray(lens)
cfg = dmv_model.DMVConfig(init_method="km", n_token=n_token, smooth=0.1)
params = dmv_model.init_params(
    cfg, token_seqs=[list(map(int, t)) for t in toks])
em = dmv_model.EMAccumulator(smooth=0.1)
prev = None
for it in range(4):
    v = float(dmv_model.loss(params, tok, lens, viterbi=False)[0])
    counts = dmv_model.expected_counts(params, tok, lens)
    em.accumulate(counts)
    params = em.apply(params)
    print(f"EM iter {it}: nll {v:.4f}", flush=True)
    assert prev is None or v <= prev + 1e-3, "EM must be monotone"
    prev = v
heads = dmv_model.decode(params, tok, lens, mbr=True)
print("decode heads shape:", np.asarray(heads).shape, flush=True)
print("CLASSIC_DMV_EM OK", round(time.time() - t0, 1), "s", flush=True)

# --- leg 3: tiny-BERT subword embedding fwd+grad ----------------------
t0 = time.time()
from transformers import BertConfig  # noqa: E402

from vlgae_tpu.models import CompositeEmbedding  # noqa: E402
from vlgae_tpu.models.embedding import EmbeddingItemCfg  # noqa: E402

bcfg = BertConfig(vocab_size=200, hidden_size=16, num_hidden_layers=1,
                  num_attention_heads=2, intermediate_size=32,
                  max_position_embeddings=8)  # forces stride windows
emb = CompositeEmbedding(
    items=(EmbeddingItemCfg("transformer", "subword", "transformer",
                            embedding_dim=16, n_layers=1,
                            requires_grad=False),),
    bert_config=bcfg,
)
B, Lq, S = 4, 5, 20
sub = rng.integers(3, 200, (B, S)).astype(np.int32)
first = np.tile(np.sort(rng.choice(np.arange(1, S - 1), Lq,
                                   replace=False))[None], (B, 1))
inputs = {"subword": jnp.asarray(sub),
          "subword_mask": jnp.asarray(np.ones((B, S), bool)),
          "subword_first": jnp.asarray(first.astype(np.int32))}
eparams = emb.init(jax.random.key(0), inputs)


@jax.jit
def loss(p):
    h, _ = emb.apply(p, inputs)
    return jnp.sum(h ** 2)


v, g = jax.value_and_grad(loss)(eparams)
assert np.isfinite(float(v))
print("subword loss:", float(v), flush=True)
print("SUBWORD_BERT OK", round(time.time() - t0, 1), "s", flush=True)
print("ALL VARIANT LEGS OK", flush=True)
