"""Ancestral state reconstruction.

In-process parsimony push-down (Node::reconstruct_parsimony_ancestor,
node.h:1027-1105) and marginal ML ancestors via Felsenstein pruning —
the native replacement for the reference's external BppAncestors
(src/utils/bppancestors.cpp), done as batched array ops instead of a
popen round-trip.
"""
from __future__ import annotations

import numpy as np

from ..graph.sequence_graph import MATCHED, NON_REAL
from ..tree.newick import TreeNode
from ..models.alphabets import Alphabet


def reconstruct_parsimony_ancestors(tree: TreeNode, alphabet: Alphabet):
    """Push resolved parent states down the tree, marking never-matched
    sites non-real (exact transliteration of node.h:1027-1072)."""
    g = tree.graph
    child_parsimony = alphabet.child_parsimony

    def at_site(node: TreeNode, pos: int, parent_state: int,
                is_matched: bool):
        if node.is_leaf:
            return
        sg = node.graph
        pstate = sg.path_state[pos]
        if pstate == MATCHED:
            new_state = int(child_parsimony[parent_state, sg.states[pos]])
            sg.states[pos] = new_state
            is_matched = True
        else:
            sg.states[pos] = parent_state
        if not is_matched:
            sg.site_type[pos] = NON_REAL
        li = sg.child_l[pos]
        ri = sg.child_r[pos]
        if li >= 0:
            at_site(node.left, li, sg.states[pos], is_matched)
        if ri >= 0:
            at_site(node.right, ri, sg.states[pos], is_matched)

    for i in range(1, g.num_sites() - 1):
        at_site(tree, i, g.states[i], False)


# ----------------------------------------------------------------------
def reconstruct_ml_ancestors(tree: TreeNode, model_factory,
                             include_gaps_as_missing: bool = True):
    """Marginal maximum-likelihood ancestral states by Felsenstein
    pruning over the alignment columns (native BppAncestors equivalent:
    uses the same substitution model on canonical states; ambiguity
    characters contribute as uniform partials).

    Mutates internal-node graph states at matched sites to the
    max-marginal-posterior canonical state.
    """
    a = model_factory.alphabet
    nc = a.n_canon

    # per-branch P matrices
    from ..models.eigen import p_matrix
    pmats = {}

    def pm(dist):
        key = round(float(dist), 12)
        if key not in pmats:
            pmats[key] = p_matrix(model_factory.lam, model_factory.u,
                                  model_factory.v, max(dist, 1e-9))
        return pmats[key]

    def partial_for_state(st):
        v = np.zeros(nc)
        if st < 0:
            v[:] = 1.0
            return v
        if st < nc:
            v[st] = 1.0
            return v
        n_units = int(a.n_units[st])
        for k in range(n_units):
            m = int(a.members[st, k])
            if 0 <= m < nc:
                v[m] = 1.0
        if not v.any():
            v[:] = 1.0
        return v

    # upward (postorder) partial likelihoods per site of each graph
    up: dict[int, np.ndarray] = {}

    def upward(node: TreeNode):
        g = node.graph
        n = g.num_sites()
        L = np.ones((n, nc))
        if node.is_leaf:
            for i in range(1, n - 1):
                L[i] = partial_for_state(g.states[i])
            up[id(node)] = L
            return L
        lL = upward(node.left)
        rL = upward(node.right)
        pl = pm(node.left.dist)
        pr = pm(node.right.dist)
        for i in range(1, n - 1):
            li = g.child_l[i]
            ri = g.child_r[i]
            v = np.ones(nc)
            if li >= 0:
                v = v * (pl @ lL[li])
            if ri >= 0:
                v = v * (pr @ rL[ri])
            # per-site rescaling: partials shrink multiplicatively per
            # level and underflow to 0 on deep trees, silently skipping
            # the argmax assignment below; the argmax posteriors are
            # scale-invariant, so normalize here
            m = v.max()
            L[i] = v / m if m > 0 else v
        up[id(node)] = L
        return L

    upward(tree)

    # downward: root prior = pi; assign argmax marginal at internal sites
    pi = model_factory.pi

    def downward(node: TreeNode, down: np.ndarray):
        g = node.graph
        if node.is_leaf:
            return
        L = up[id(node)]
        for i in range(1, g.num_sites() - 1):
            post = down[i] * L[i]
            if post.sum() > 0 and g.states[i] >= 0:
                g.states[i] = int(np.argmax(post))
        # propagate to children
        for child, sib, pc, psib in (
                (node.left, node.right, pm(node.left.dist),
                 pm(node.right.dist)),
                (node.right, node.left, pm(node.right.dist),
                 pm(node.left.dist))):
            if child.is_leaf:
                continue
            cd = np.ones((child.graph.num_sites(), nc))
            for i in range(1, g.num_sites() - 1):
                ci = g.child_l[i] if child is node.left else g.child_r[i]
                si = g.child_r[i] if child is node.left else g.child_l[i]
                if ci < 0:
                    continue
                msg = down[i].copy()
                if si >= 0:
                    msg = msg * (psib @ up[id(sib)][si])
                msg = msg @ pc
                m = msg.max()
                cd[ci] = msg / m if m > 0 else msg
            downward(child, cd)

    root_down = np.tile(pi, (tree.graph.num_sites(), 1))
    downward(tree, root_down)
