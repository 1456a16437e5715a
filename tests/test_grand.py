"""Grandparent-factored second-order inside vs brute force."""

import numpy as np

from vlgae_tpu.struct.alg import eisner2o_grand

import oracles


def score_grand(s_a, s_g, heads):
    """s_a[h, d] arcs; s_g[g, p, c]: each dependent v (parent p)
    contributes factors for its outermost child in each direction, with
    the self-sentinel when childless (matches the chart's c[h,h,h]=0
    seed)."""
    n = len(heads)
    total = 0.0
    children = {h: [] for h in range(n + 1)}
    for d, h in enumerate(heads, 1):
        total += s_a[h, d]
        children.setdefault(h, []).append(d)
    for v, p in enumerate(heads, 1):
        left = [c for c in children.get(v, []) if c < v]
        right = [c for c in children.get(v, []) if c > v]
        olc = min(left) if left else v
        orc = max(right) if right else v
        total += s_g[p, v, olc] + s_g[p, v, orc]
    return total


def test_grand_partition_bruteforce():
    rng = np.random.default_rng(0)
    for n in (2, 3, 4):
        s_arc = rng.standard_normal((1, n + 1, n + 1))  # [b, d, h]
        s_g = rng.standard_normal((1, n + 1, n + 1, n + 1))
        got = eisner2o_grand((s_arc, s_g), np.array([n]))[0]
        scores = [
            score_grand(s_arc[0].T, s_g[0], heads)
            for heads in oracles.all_trees(n)
        ]
        want = oracles.logsumexp(scores)
        np.testing.assert_allclose(got, want, rtol=1e-6)
