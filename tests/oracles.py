"""Brute-force enumeration oracles for chart DP tests.

Enumerate all single-root projective dependency trees for tiny sentences
and score them directly from the potentials, providing an independent
check of the inside algorithms (the same strategy as the reference's
vestigial ``DepTree.enumerate``, ref: deptree.py:213-228).
"""

import itertools

import numpy as np

NOCHILD = 1
HASCHILD = 0
LEFT = 0
RIGHT = 1
GO = 0
STOP = 1


def is_spanning(parse):
    """parse[0] is the root (ignored); parse[m] = head of position m."""
    d = {}
    for m, h in enumerate(parse):
        if m == 0:
            continue
        if m == h:
            return False
        d.setdefault(h, []).append(m)
    stack, seen = [0], set()
    while stack:
        cur = stack.pop()
        if cur in seen:
            return False
        seen.add(cur)
        stack.extend(d.get(cur, []))
    return len(seen) == len(parse)


def is_projective(parse):
    for m, h in enumerate(parse):
        if h is None:
            continue
        for m2, h2 in enumerate(parse):
            if m2 == m or h2 is None:
                continue
            if m < h and (
                m < m2 < h < h2 or m < h2 < h < m2 or m2 < m < h2 < h or h2 < m < m2 < h
            ):
                return False
            if h < m and (
                h < m2 < m < h2 or h < h2 < m < m2 or m2 < h < h2 < m or h2 < h < m2 < m
            ):
                return False
    return True


def all_trees(n, single_root=True):
    """All valid head sequences over positions 1..n (head 0 = root)."""
    for heads in itertools.product(range(n + 1), repeat=n):
        parse = [-1] + list(heads)
        parse[0] = None
        full = [0] + list(heads)
        if not is_spanning(full):
            continue
        if not is_projective(full):
            continue
        if single_root and sum(1 for h in heads if h == 0) != 1:
            continue
        yield list(heads)


def score_deptree(arc, heads):
    """Sum arc scores: arc[h, c] with root row 0, child columns 1-based."""
    return sum(arc[h, c + 1] for c, h in enumerate(heads))


def score_dmv(dec, attach, root, heads):
    """Score a tree under the (unmerged) DMV parameterization.

    Valence convention: the *farthest* child of a head in each direction
    is attached with NOCHILD; nearer children with HASCHILD. STOP uses
    HASCHILD if the head has any child in the direction, else NOCHILD.
    (Derived from the reference chart recursion, ref: dmv.py:47-64, and
    consistent with ref: dmv_helper/good_init_nn.py:36-78.)

    dec: [n, 2(dir), 2(val), 2(dec)]; attach: [n, n, 2(val)]; root: [n].
    heads: 1-based head ids (0 = root). Positions are 0-based words.
    """
    n = len(heads)
    total = 0.0
    root_child = heads.index(0)
    total += root[root_child]
    children = {h: [] for h in range(n)}
    for c, h in enumerate(heads):
        if h > 0:
            children[h - 1].append(c)
    for h in range(n):
        left = sorted([c for c in children[h] if c < h])
        right = sorted([c for c in children[h] if c > h])
        for d, kids in ((LEFT, left), (RIGHT, right)):
            if not kids:
                total += dec[h, d, NOCHILD, STOP]
                continue
            farthest = kids[0] if d == LEFT else kids[-1]
            for c in kids:
                v = NOCHILD if c == farthest else HASCHILD
                total += dec[h, d, v, GO]
                total += attach[h, c, v]
            total += dec[h, d, HASCHILD, STOP]
    return total


def logsumexp(xs):
    xs = np.asarray(xs, dtype=np.float64)
    m = xs.max()
    return m + np.log(np.exp(xs - m).sum())


def brute_dmv(dec, attach, root, n, op=logsumexp):
    """Brute-force semiring total over all trees of length n."""
    return op([score_dmv(dec, attach, root, h) for h in all_trees(n)])


def brute_deptree(arc, n, op=logsumexp):
    return op([score_deptree(arc, h) for h in all_trees(n)])


def brute_dmv_marginals(dec, attach, root, n):
    """Expected attach counts in *merged* layout [n+1, n+1, 2]."""
    trees = list(all_trees(n))
    scores = np.array([score_dmv(dec, attach, root, h) for h in trees])
    logz = logsumexp(scores)
    probs = np.exp(scores - logz)
    marg = np.zeros((n + 1, n + 1, 2))
    for p, heads in zip(probs, trees):
        root_child = heads.index(0)
        marg[0, root_child + 1, NOCHILD] += p
        children = {h: [] for h in range(n)}
        for c, h in enumerate(heads):
            if h > 0:
                children[h - 1].append(c)
        for h in range(n):
            left = sorted([c for c in children[h] if c < h])
            right = sorted([c for c in children[h] if c > h])
            for d, kids in ((LEFT, left), (RIGHT, right)):
                if not kids:
                    continue
                farthest = kids[0] if d == LEFT else kids[-1]
                for c in kids:
                    v = NOCHILD if c == farthest else HASCHILD
                    marg[h + 1, c + 1, v] += p
    return marg, logz


def brute_deptree_marginals(arc, n):
    trees = list(all_trees(n))
    scores = np.array([score_deptree(arc, h) for h in trees])
    logz = logsumexp(scores)
    probs = np.exp(scores - logz)
    marg = np.zeros((n + 1, n + 1))
    for p, heads in zip(probs, trees):
        for c, h in enumerate(heads):
            marg[h, c + 1] += p
    return marg, logz


def brute_entropy(scores):
    scores = np.asarray(scores, dtype=np.float64)
    logz = logsumexp(scores)
    p = np.exp(scores - logz)
    return -(p * (scores - logz)).sum()


def route_one_winner(att, dm, dmv, vis, txt):
    """First-winner (torch .max) cotangent routing for the matching
    maxes, vectorized: the reference gradient oracle shared by
    tests/test_match_pallas.py and scripts/match_kernel_ab.py."""
    Bn, An, Qn, Vn = att.shape
    datt = np.zeros_like(att)
    im = att.argmax(-1)
    b, a, q = np.ogrid[:Bn, :An, :Qn]
    np.add.at(datt, (b, a, q, im), dm)
    iq = att.argmax(-2)
    b, a, v = np.ogrid[:Bn, :An, :Vn]
    np.add.at(datt, (b, a, iq, v), dmv)
    want_dvis = np.einsum("baqv,bqd->avd", datt, np.asarray(txt))
    want_dtxt = np.einsum("baqv,avd->bqd", datt, np.asarray(vis))
    return want_dvis, want_dtxt
