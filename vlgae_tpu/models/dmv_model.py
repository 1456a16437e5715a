"""Classic tabular (generative) DMV with EM training.

Re-designed from the reference (ref: src/model/dmv.py): parameters are
log-prob tables over token types; the E-step's expected counts are the
gradients of the log-partition (grad-of-logZ identity), and the M-step
normalizes accumulated counts -- implemented here as a pure
counts+params -> params transform instead of a torch Optimizer
(ref: dmv.py:146-186).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..struct import DMV1o, DependencyCRF, dmv_merge
from ..struct.dmv import dmv_marginals
from ..struct.semirings import LogSemiring, MaxSemiring
from . import dmv_init


@dataclasses.dataclass(frozen=True)
class DMVConfig:
    """(ref: dmv.py:28-38)"""

    viterbi_training: bool = False
    mbr_decoding: bool = True
    init_method: str = "km"  # km | good | random
    smooth: float = 0.1
    n_token: int = 0


def init_params(cfg: DMVConfig, token_seqs=None, head_seqs=None, seed=0):
    """Build the (root, trans, dec) log tables (ref: dmv.py:57-74)."""
    n = cfg.n_token
    if cfg.init_method == "km":
        d, t, r = dmv_init.km_init(token_seqs, n, cfg.smooth)
    elif cfg.init_method == "good":
        d, t, r = dmv_init.good_init(token_seqs, head_seqs, n, cfg.smooth)
    else:
        rng = np.random.default_rng(seed)
        d = rng.standard_normal((n, 2, 2, 2))
        r = rng.standard_normal((n,))
        t = rng.standard_normal((n, n, 2, 2))
    return {
        "root_param": jnp.asarray(r, jnp.float32),
        "trans_param": jnp.asarray(t, jnp.float32),
        "dec_param": jnp.asarray(d, jnp.float32),
    }


def forward(params: Dict, token: jnp.ndarray):
    """Gather per-sentence merged potentials (ref: dmv.py:82-102).

    token: [B, L] token ids. Returns (merged_dec, merged_attach).
    """
    t = params["trans_param"][token[:, :, None], token[:, None, :]]
    # [B, L, L, 2dir, 2val] -> select dir by position order (ref: dmv.py:90-92)
    L = token.shape[1]
    right = (
        jnp.triu(jnp.ones((L, L), bool))[None, :, :, None]
    )
    t = jnp.where(right, t[:, :, :, 1, :], t[:, :, :, 0, :])
    d = params["dec_param"][token]  # [B, L, 2, 2, 2]
    r = params["root_param"][token]  # [B, L]
    return dmv_merge(d, t, r)


def loss(params, token, lengths, viterbi: bool):
    mdec, mattach = forward(params, token)
    dist = DMV1o((mdec, mattach), lengths)
    ll = dist.max if viterbi else dist.partition
    return -ll.sum(), {"ll": ll.sum()}


def expected_counts(params, token, lengths, viterbi: bool = False):
    """E-step counts = grads of (max-)logZ w.r.t. the tables."""
    def total(p):
        mdec, mattach = forward(p, token)
        sr = MaxSemiring if viterbi else LogSemiring
        from ..struct.dmv import dmv_partition

        return dmv_partition(mdec, mattach, lengths, sr).sum()

    return jax.grad(total)(params)


def decode(params, token, lengths, mbr: bool):
    """Argmax or MBR decode (ref: dmv.py:113-130). Returns heads [B, L]."""
    mdec, mattach = forward(params, token)
    dist = DMV1o((mdec, mattach), lengths)
    if mbr:
        arc = dist.marginals.sum(-1)
        return DependencyCRF(arc, lengths).argmax_heads
    return dist.argmax_heads


class EMAccumulator:
    """M-step count accumulation + apply (ref: dmv.py:146-186).

    ``accumulate`` adds E-step counts (grads of logZ are positive
    expected counts; the reference subtracts the loss-gradient which is
    the negated count -- same thing). ``apply`` swaps in normalized
    log-counts and resets.
    """

    def __init__(self, smooth: float):
        self.smooth = smooth
        self.counts: Optional[Dict] = None
        self.can_apply = False

    def accumulate(self, counts: Dict):
        if self.counts is None:
            self.counts = {k: jnp.zeros_like(v) for k, v in counts.items()}
        self.counts = {
            k: self.counts[k] + counts[k] for k in self.counts
        }
        self.can_apply = True

    def apply(self, params: Dict) -> Dict:
        if not self.can_apply:
            return params
        new = {
            "root_param": jax.nn.log_softmax(
                jnp.log(self.counts["root_param"] + self.smooth), 0
            ),
            "dec_param": jax.nn.log_softmax(
                jnp.log(self.counts["dec_param"] + self.smooth), 3
            ),
            "trans_param": jax.nn.log_softmax(
                jnp.log(self.counts["trans_param"] + self.smooth), 1
            ),
        }
        self.counts = None
        self.can_apply = False
        return new
