"""Composite embeddings: static word/tag, variational wrappers, subword BERT.

Re-designed from the reference embedding stack
(ref: src/model/embedding/): a config-driven list of named embedding
items, each producing ``[B, L, d]`` (or ``[B, 1, d]``, broadcast over the
sequence), concatenated after mutually-compensating IndependentDropout.

Differences forced by JAX purity:
  - The reference's in-place "normalize at begin/epoch/batch" mutation
    (ref: embedding.py:116-119, fastnlp_embedding.py:29-47) becomes a
    pure params->params transform (:func:`normalize_embedding_params`)
    the training loop applies on the configured schedule.
  - Variational adaptors (VAE/IB, ref: fastnlp_embedding.py:49-81)
    thread RNG explicitly and return their KL in an aux dict.
  - The subword (BERT) path keeps tokenization host-side (cached in the
    dataset as subword ids + first-subword indices, mirroring
    ref: transformers_embedding.py:31-53) and runs the frozen encoder
    in-graph so XLA fuses it with the rest of the forward.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as fnn

from .nn import ScalarMix, independent_dropout, multivariate_kl


@dataclasses.dataclass(frozen=True)
class EmbeddingItemCfg:
    """One embedding item (ref: embedding.py:42-50)."""

    name: str
    field: str
    kind: str  # 'static' | 'transformer'
    n_vocab: int = 0
    embedding_dim: int = 100
    mode: str = "basic"  # 'basic' | 'vae' | 'ib' (ref: fastnlp_embedding.py:49)
    out_dim: int = 0  # variational output dim
    normalize_method: str = "mean+std"
    normalize_time: str = "nowhere"  # nowhere | begin | epoch | batch
    # transformer-only
    model: str = ""
    n_layers: int = 1
    n_out: int = 0
    requires_grad: bool = False
    pooling: str = "mean"  # first | last | mean (ref default: 'mean')
    stride: int = 256  # window stride for long inputs (ref: stride=256)
    layer_dropout: float = 0.0  # ScalarMix layer dropout (ref: dropout)
    # char-only (kind == 'char')
    char_dim: int = 50
    kernel_sizes: Tuple[int, ...] = (1, 3, 5)
    filter_nums: Tuple[int, ...] = (20, 30, 40)

    @property
    def embed_size(self) -> int:
        if self.mode != "basic":
            return self.out_dim
        if self.kind == "transformer":
            return self.n_out if self.n_out else self.embedding_dim
        return self.embedding_dim


class StaticItem(fnn.Module):
    """Lookup table, optionally with a variational (VAE/IB) head.

    ``row_map`` remaps lookup ids before the table take: dev/test-only
    (no-create-entry) words without pretrained vectors share the unk row
    so they never train private vectors (fastNLP StaticEmbedding
    semantics; ref: datamodule.py:179-224)."""

    cfg: EmbeddingItemCfg
    pretrained: Optional[np.ndarray] = None
    row_map: Optional[Tuple[int, ...]] = None

    @fnn.compact
    def __call__(self, ids, *, deterministic: bool = True):
        cfg = self.cfg
        if self.pretrained is not None:
            init = lambda *_: jnp.asarray(self.pretrained, jnp.float32)
        else:
            init = fnn.initializers.normal(stddev=1.0)
        table = self.param(
            "embedding", init, (cfg.n_vocab, cfg.embedding_dim)
        )
        if self.row_map is not None:
            ids = jnp.take(
                jnp.asarray(np.asarray(self.row_map, np.int32)), ids, axis=0
            )
        h = jnp.take(table, ids, axis=0)
        if cfg.mode == "basic":
            return h, None
        mean, lvar = jnp.split(
            fnn.Dense(2 * cfg.out_dim, name="enc")(h), 2, axis=-1
        )
        if deterministic:
            z = mean
        else:
            rng = self.make_rng("sample")
            z = mean + jnp.exp(0.5 * lvar) * jax.random.normal(rng, mean.shape)
        if cfg.mode == "ib":
            tm = self.param(
                "target_mean", fnn.initializers.zeros_init(), (1, cfg.out_dim)
            )
            tl = self.param(
                "target_lvar", fnn.initializers.zeros_init(), (1, cfg.out_dim)
            )
            m = mean.reshape(-1, cfg.out_dim)
            l = lvar.reshape(-1, cfg.out_dim)
            kl = multivariate_kl(
                m, jnp.broadcast_to(tm, m.shape), l, jnp.broadcast_to(tl, l.shape)
            )
        else:  # vae
            kl = -0.5 * jnp.sum(lvar - mean ** 2 - jnp.exp(lvar) + 1)
        return z, kl


class CharItem(fnn.Module):
    """Char-CNN word embeddings.

    Counterpart of fastNLP's CNNCharEmbedding as wrapped by the
    reference's char adaptor (ref: fastnlp_embedding.py:84-89): embed
    characters, run parallel 1-D convolutions of several widths along
    the word, ReLU, masked max-pool over characters, project to
    ``embedding_dim``. Char id 0 is padding; all-pad (padding) words
    embed to zero.
    """

    cfg: EmbeddingItemCfg

    @fnn.compact
    def __call__(self, chars, *, deterministic: bool = True):
        cfg = self.cfg
        B, L, W = chars.shape
        table = self.param(
            "char_embedding", fnn.initializers.normal(stddev=1.0),
            (cfg.n_vocab, cfg.char_dim),
        )
        h = jnp.take(table, chars.reshape(B * L, W), axis=0)  # [BL, W, C]
        cmask = (chars > 0).reshape(B * L, W, 1)
        h = jnp.where(cmask, h, 0.0)
        pooled = []
        for k, nf in zip(cfg.kernel_sizes, cfg.filter_nums):
            c = fnn.Conv(nf, (k,), padding="SAME", name=f"conv{k}")(h)
            c = jnp.where(cmask, jax.nn.relu(c), -1e9)
            pooled.append(c.max(axis=1))
        out = fnn.Dense(cfg.embedding_dim, name="proj")(
            jnp.concatenate(pooled, axis=-1)
        )
        out = jnp.where(cmask.any(axis=1), out, 0.0)
        return out.reshape(B, L, cfg.embedding_dim), None


class TransformerItem(fnn.Module):
    """Frozen(-able) BERT-style subword encoder with ScalarMix + pooling.

    Inputs (from the datamodule subword cache):
      - ``subword``:        [B, S] subword ids
      - ``subword_mask``:   [B, S] bool
      - ``subword_first``:  [B, L] index of each word's first subword
      - ``subword_last``:   [B, L] index of each word's last subword
    (ref: transformers_embedding.py:56-168).

    Sequences longer than the encoder's position limit are encoded in
    stride windows exactly like the reference: window 0 contributes all
    ``max_len`` positions, each further window (advanced by ``stride``)
    contributes its last ``stride`` positions
    (ref: transformers_embedding.py:143-150). Pooling over each word's
    subword span supports first/last/mean
    (ref: transformers_embedding.py:157-166).
    """

    cfg: EmbeddingItemCfg
    bert_config: Any = None  # transformers BertConfig

    @fnn.compact
    def __call__(self, subword, subword_mask, subword_first,
                 subword_last=None, *, deterministic: bool = True):
        from transformers.models.bert.modeling_flax_bert import FlaxBertModule

        cfg = self.cfg
        bert = FlaxBertModule(
            config=self.bert_config, add_pooling_layer=False, name="bert"
        )

        def encode(ids, mask):
            out = bert(
                input_ids=ids,
                attention_mask=mask.astype(jnp.int32),
                token_type_ids=jnp.zeros_like(ids),
                position_ids=jnp.broadcast_to(
                    jnp.arange(ids.shape[1])[None], ids.shape
                ),
                head_mask=None,
                deterministic=True,
                output_hidden_states=True,
            )
            return out.hidden_states[-cfg.n_layers:]

        def mix(layers):
            if cfg.n_layers > 1:
                return ScalarMix(
                    n_layers=cfg.n_layers, dropout=cfg.layer_dropout,
                    name="scalar_mix",
                )(list(layers), deterministic=deterministic)
            return layers[-1]

        B, S = subword.shape
        max_len = int(self.bert_config.max_position_embeddings)
        if S <= max_len:
            h = mix(encode(subword, subword_mask))
        else:
            # reference stride-window scheme: window k starts at
            # k*stride; window 0 keeps [0, max_len), window k>0 keeps
            # its last (max_len - (max_len - stride)) = stride
            # positions (static shapes; S and max_len are trace-time)
            stride = min(int(cfg.stride) or max_len // 2, max_len)
            n_win = -(-(S - max_len) // stride) + 1
            pad_to = max_len + (n_win - 1) * stride
            ids = jnp.pad(subword, ((0, 0), (0, pad_to - S)))
            msk = jnp.pad(subword_mask, ((0, 0), (0, pad_to - S)))
            win_ids = jnp.stack(
                [ids[:, k * stride: k * stride + max_len]
                 for k in range(n_win)], 1,
            ).reshape(B * n_win, max_len)
            win_msk = jnp.stack(
                [msk[:, k * stride: k * stride + max_len]
                 for k in range(n_win)], 1,
            ).reshape(B * n_win, max_len)
            hw = mix(encode(win_ids, win_msk)).reshape(B, n_win, max_len, -1)
            parts = [hw[:, 0]]
            for k in range(1, n_win):
                parts.append(hw[:, k, max_len - stride:])
            h = jnp.concatenate(parts, axis=1)[:, :S]
        if not cfg.requires_grad:
            h = jax.lax.stop_gradient(h)

        # pool each word's subword span [first, last] -> word vector
        # (ref: transformers_embedding.py:157-166)
        first = subword_first.astype(jnp.int32)
        last = (first if subword_last is None
                else subword_last.astype(jnp.int32))
        if cfg.pooling == "first":
            h_words = jnp.take_along_axis(h, first[..., None], axis=1)
        elif cfg.pooling == "last":
            h_words = jnp.take_along_axis(h, last[..., None], axis=1)
        elif cfg.pooling == "mean":
            csum = jnp.concatenate(
                [jnp.zeros_like(h[:, :1]), jnp.cumsum(h, axis=1)], axis=1
            )
            tot = (
                jnp.take_along_axis(csum, (last + 1)[..., None], axis=1)
                - jnp.take_along_axis(csum, first[..., None], axis=1)
            )
            n_sub = jnp.maximum(last - first + 1, 1).astype(h.dtype)
            h_words = tot / n_sub[..., None]
        else:
            raise ValueError(f"unknown pooling: {cfg.pooling!r}")
        if cfg.n_out:
            h_words = fnn.Dense(cfg.n_out, name="projection")(h_words)
        return h_words, None


class CompositeEmbedding(fnn.Module):
    """Concatenation of embedding items with IndependentDropout
    (ref: embedding.py:53-126)."""

    items: Tuple[EmbeddingItemCfg, ...]
    dropout: float = 0.0
    pretrained: Dict[str, Any] = dataclasses.field(default_factory=dict)
    row_maps: Dict[str, tuple] = dataclasses.field(default_factory=dict)
    bert_config: Any = None

    def setup(self):
        mods = {}
        for cfg in self.items:
            if cfg.kind == "transformer":
                mods[cfg.name] = TransformerItem(
                    cfg, bert_config=self.bert_config, name=cfg.name
                )
            elif cfg.kind == "char":
                mods[cfg.name] = CharItem(cfg, name=cfg.name)
            else:
                mods[cfg.name] = StaticItem(
                    cfg, pretrained=self.pretrained.get(cfg.name),
                    row_map=self.row_maps.get(cfg.name),
                    name=cfg.name,
                )
        self._mods = mods

    @property
    def embed_size(self) -> int:
        return sum(cfg.embed_size for cfg in self.items)

    def embed_item(self, name: str, ids):
        """Embed raw ids with one item's table (used for token_emb)."""
        for cfg in self.items:
            if cfg.name == name:
                return self._mods[name](ids, deterministic=True)[0]
        raise KeyError(name)

    def __call__(self, inputs: Dict[str, Any], *, deterministic: bool = True):
        embs, aux = [], {}
        for cfg in self.items:
            mod = self._mods[cfg.name]
            if cfg.kind == "transformer":
                h, kl = mod(
                    inputs["subword"], inputs["subword_mask"],
                    inputs["subword_first"],
                    inputs.get("subword_last"),
                    deterministic=deterministic,
                )
            else:
                h, kl = mod(inputs[cfg.field], deterministic=deterministic)
            if kl is not None:
                aux["kl"] = aux.get("kl", 0.0) + kl
            aux[cfg.name] = h
            embs.append(h)
        if self.dropout > 0 and not deterministic:
            rng = self.make_rng("dropout")
            embs = independent_dropout(rng, embs, self.dropout, deterministic)
        seq_len = max(e.shape[1] for e in embs)
        embs = [
            jnp.broadcast_to(e, (e.shape[0], seq_len, e.shape[2]))
            if e.shape[1] == 1 else e
            for e in embs
        ]
        return jnp.concatenate(embs, axis=-1), aux


def load_glove(path, vocab, dim: int, lower: bool = True):
    """Load GloVe-format vectors aligned to ``vocab`` (random for misses).

    Counterpart of fastNLP's StaticEmbedding pretrained loading used by
    the reference (ref: config/model/embedding/en.yaml glove100).

    Returns ``(table, found)`` where ``found`` is the set of vocab words
    found in the vectors file — used to tie no-create-entry words
    (dev/test-only) that lack pretrained vectors to the unk row, so they
    don't get private trainable vectors (fastNLP StaticEmbedding
    semantics, ref: datamodule.py:179-224).
    """
    table = np.random.default_rng(0).normal(
        0, 1, (len(vocab), dim)
    ).astype(np.float32)
    found = set()
    with open(path, encoding="utf-8") as f:
        for line in f:
            parts = line.rstrip().split(" ")
            if len(parts) != dim + 1:
                continue
            w = parts[0].lower() if lower else parts[0]
            if w in vocab:
                table[vocab[w]] = np.asarray(parts[1:], np.float32)
                found.add(w)
    table[vocab.pad_index] = 0.0
    return table, found


def glove_row_map(vocab, found) -> tuple:
    """Index remap tying dev/test-only words without pretrained vectors
    to the unk row (fastNLP ``words_to_words``)."""
    unk = vocab.unk_index
    return tuple(
        unk if (vocab.is_no_create(w) and w not in found) else i
        for i, w in enumerate(vocab.idx2word)
    )


def normalize_embedding_params(params, path: Tuple[str, ...],
                               method: str = "mean+std", counts=None):
    """Pure re-whitening of one embedding table (ref: embedding.py:155-166).

    ``path``: key path to the table inside ``params``. With ``counts``
    (token frequencies aligned to vocab rows), applies the reference's
    count-weighted *scalar* whitening (ref: fastnlp_embedding.py:33-41);
    otherwise per-dimension statistics over rows 1.. (padding row
    excluded, ref: fastnlp_embedding.py:43-47).
    """
    def _get(d, p):
        for k in p:
            d = d[k]
        return d

    table = _get(params, path)
    if counts is not None:
        w = jnp.asarray(np.asarray(counts), jnp.float32)
        w = (w / jnp.maximum(w.sum(), 1.0))[:, None]
        mean = (table * w).sum()
        std = jnp.sqrt((((table - mean) ** 2) * w).sum() + 1e-6)
        data = table
        if method in ("mean", "mean+std"):
            data = data - mean
        if method in ("std", "mean+std"):
            data = data / std
        new_table = data
    else:
        data = table[1:]
        mean = data.mean(0, keepdims=True)
        # torch.std semantics: Bessel-corrected (ddof=1), NO epsilon
        # (ref: embedding.py:160-166) — golden-pinned
        std = data.std(0, keepdims=True, ddof=1)
        if method == "mean":
            data = data - mean
        elif method == "std":
            data = data / std
        elif method == "mean+std":
            data = (data - mean) / std
        else:
            raise ValueError(method)
        new_table = jnp.concatenate([table[:1], data], 0)

    def _set(d, p, v):
        if len(p) == 1:
            return {**d, p[0]: v}
        return {**d, p[0]: _set(d[p[0]], p[1:], v)}

    return _set(params, path, new_table)
