"""Generate golden parity fixtures FROM THE REFERENCE implementation.

Runs the reference torch-struct fork (/root/reference/src/model/
torch_struct — imported directly, bypassing the reference's `src`
package which needs Lightning/omegaconf) on fixed random potentials and
freezes partition/marginals/argmax outputs as .npz fixtures under
tests/golden/. tests/test_golden_ref.py then asserts the JAX fills and
the Pallas interpret kernels reproduce them bit-for-bit (fp32
tolerance).

Only the OUTPUT TENSORS are committed; no reference code is copied.

Usage:  python scripts/make_golden_fixtures.py [reference_path]
"""

from __future__ import annotations

import os
import sys

import numpy as np
import torch

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
sys.path.insert(0, os.path.join(REF, "src", "model"))

from torch_struct import DMV1o, DependencyCRF  # noqa: E402
from torch_struct.deptree import deptree_nonproj, deptree_part  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")
os.makedirs(OUT, exist_ok=True)

torch.manual_seed(0)
rng = np.random.default_rng(0)

B, N = 4, 7
lengths = np.array([7, 5, 3, 2], np.int64)

# ---- DMV1o (ref: dmv.py:19-66, distributions.py:245-265) ----------------
dec = rng.standard_normal((B, N, 2, 2, 2)).astype(np.float32)
attach = rng.standard_normal((B, N, N, 2)).astype(np.float32)
root = rng.standard_normal((B, N)).astype(np.float32)

t_dec = torch.tensor(dec, requires_grad=True)
t_attach = torch.tensor(attach, requires_grad=True)
t_root = torch.tensor(root, requires_grad=True)
t_len = torch.tensor(lengths)

merged = DMV1o.merge(t_dec, t_attach, t_root)
merged = (merged[0].detach().requires_grad_(True),
          merged[1].detach().requires_grad_(True))
dist = DMV1o(merged, lengths=t_len)
partition = dist.partition.detach().numpy()
marginals = dist.marginals.detach().numpy()  # attach grads [B, N+1, N+1, 2]
vmax = dist.max.detach().numpy()
argmax = dist.argmax.detach().numpy()

np.savez(
    os.path.join(OUT, "dmv_ref.npz"),
    dec=dec, attach=attach, root=root, lengths=lengths,
    merged_dec=merged[0].detach().numpy(),
    merged_attach=merged[1].detach().numpy(),
    partition=partition, marginals=marginals,
    max=vmax, argmax=argmax,
)
print("dmv_ref.npz:", partition, vmax)

# ---- DependencyCRF / Eisner (ref: deptree.py:25-76) ----------------------
arc = rng.standard_normal((B, N + 1, N + 1)).astype(np.float32)
t_arc = torch.tensor(arc, requires_grad=True)
crf = DependencyCRF(t_arc, lengths=t_len, multiroot=False)
c_partition = crf.partition.detach().numpy()
c_marginals = crf.marginals.detach().numpy()
c_max = crf.max.detach().numpy()
c_argmax = crf.argmax.detach().numpy()

# matrix-tree theorem oracle (non-projective; ref: deptree.py:277-322):
# [B, N, N] with ROOT SCORES ON THE DIAGONAL, full lengths only
arc_mtt = rng.standard_normal((B, 5, 5)).astype(np.float32)
t_mtt = torch.tensor(arc_mtt)
mtt_part = deptree_part(t_mtt).detach().numpy()
mtt_marg = deptree_nonproj(t_mtt).detach().numpy()

np.savez(
    os.path.join(OUT, "deptree_ref.npz"),
    arc=arc, lengths=lengths,
    partition=c_partition, marginals=c_marginals,
    max=c_max, argmax=c_argmax,
    mtt_arc=arc_mtt, mtt_partition=mtt_part, mtt_marginals=mtt_marg,
)
print("deptree_ref.npz:", c_partition, c_max)
print("mtt:", mtt_part)
