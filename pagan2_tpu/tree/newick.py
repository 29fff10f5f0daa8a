"""Newick/NHX guide-tree parsing and the tree node structure.

Equivalent of Newick_reader (src/utils/newick_reader.{h,cpp}) and the
scheduling-relevant parts of Node (src/main/node.h). Multifurcations are
resolved arbitrarily into binary nodes with zero-length extra branches,
as the reference does.
"""
from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class TreeNode:
    name: str = ""
    dist: float = 0.0
    children: list["TreeNode"] = field(default_factory=list)
    nhx_tid: str = ""
    # runtime state
    graph: object = None  # SequenceGraph once assigned/aligned

    @property
    def is_leaf(self) -> bool:
        return not self.children

    @property
    def left(self):
        return self.children[0]

    @property
    def right(self):
        return self.children[1]

    def leaves(self):
        if self.is_leaf:
            yield self
        else:
            for c in self.children:
                yield from c.leaves()

    def nodes_postorder(self):
        for c in self.children:
            yield from c.nodes_postorder()
        yield self

    def nodes_inorder(self):
        """left subtree, node, right subtree — the reference's display
        and column ordering (Node::get_all_nodes)."""
        if self.is_leaf:
            yield self
        else:
            yield from self.left.nodes_inorder()
            yield self
            yield from self.right.nodes_inorder()

    def num_leaves(self):
        return sum(1 for _ in self.leaves())

    def apply_branch_length_rules(self, min_len: float = 0.001,
                                  truncate: float | None = 0.2,
                                  scale: float | None = None,
                                  fixed: float | None = None,
                                  real_branches: bool = False):
        """Node::set_distance_to_parent corrections (node.h:122-159):
        non-positive -> min_len; scale; truncate (default 0.2, on unless
        --real-branches); --fixed-branches overrides. Marks the tree so
        the pipeline defaults do not re-apply over CLI-chosen rules
        (the reference corrects once, in set_distance_to_parent)."""
        self.branch_rules_applied = True
        for n in self.nodes_postorder():
            if n is self:
                continue
            if n.dist <= 0:
                n.dist = min_len
            if not real_branches:
                if scale is not None and scale > 0:
                    n.dist *= scale
                if truncate is not None and truncate > 0 and n.dist > truncate:
                    n.dist = truncate
            if fixed is not None:
                n.dist = fixed

    def binarize(self):
        """Resolve multifurcations arbitrarily (Newick_reader behaviour)."""
        for n in list(self.nodes_postorder()):
            while len(n.children) > 2:
                a = n.children.pop()
                b = n.children.pop()
                merged = TreeNode(name="", dist=0.0, children=[b, a])
                n.children.append(merged)

    def to_newick(self, with_names_for_internal=False) -> str:
        def rec(n):
            if n.is_leaf:
                return f"{n.name}:{n.dist:g}"
            inner = ",".join(rec(c) for c in n.children)
            nm = n.name if with_names_for_internal else ""
            return f"({inner}){nm}:{n.dist:g}"
        if self.is_leaf:
            return f"{self.name};"
        inner = ",".join(rec(c) for c in self.children)
        nm = self.name if with_names_for_internal else ""
        return f"({inner}){nm};"

    def name_internal(self, prefix: str = "#", start: int = 1) -> int:
        """Assign #N# style names to unnamed internal nodes in postorder,
        matching the reference's ancestor naming."""
        count = start
        for n in self.nodes_postorder():
            if not n.is_leaf and not n.name:
                n.name = f"{prefix}{count}{prefix}"
                count += 1
        return count


def parse_newick(text: str) -> TreeNode:
    """Parse one Newick string (with optional NHX comments)."""
    s = text.strip()
    if s.endswith(";"):
        s = s[:-1]
    pos = [0]

    def error(msg):
        raise ValueError(f"newick parse error at {pos[0]}: {msg}")

    def parse_node() -> TreeNode:
        node = TreeNode()
        if peek() == "(":
            advance()
            node.children.append(parse_node())
            while peek() == ",":
                advance()
                node.children.append(parse_node())
            if peek() != ")":
                error("expected )")
            advance()
        # name
        name = []
        while pos[0] < len(s) and s[pos[0]] not in ":,()[];":
            name.append(s[pos[0]])
            pos[0] += 1
        node.name = "".join(name).strip()

        def parse_comment():
            # NHX comment, accepted both before and after the branch
            # length ("(a,b)[&&NHX:TID=1]:0.1" and "(a,b):0.1[...]")
            depth = 0
            start = pos[0]
            while pos[0] < len(s):
                if s[pos[0]] == "[":
                    depth += 1
                elif s[pos[0]] == "]":
                    depth -= 1
                    if depth == 0:
                        pos[0] += 1
                        break
                pos[0] += 1
            comment = s[start:pos[0]]
            if "TID=" in comment:
                tid = comment.split("TID=")[1]
                node.nhx_tid = tid.split(":")[0].split("]")[0]

        if peek() == "[":
            parse_comment()
        # branch length
        if peek() == ":":
            advance()
            num = []
            while pos[0] < len(s) and s[pos[0]] not in ",()[];":
                num.append(s[pos[0]])
                pos[0] += 1
            try:
                node.dist = float("".join(num))
            except ValueError:
                error(f"bad branch length {''.join(num)!r}")
        if peek() == "[":
            parse_comment()
        return node

    def peek():
        return s[pos[0]] if pos[0] < len(s) else ""

    def advance():
        pos[0] += 1

    root = parse_node()
    root.binarize()
    return root


def midpoint_root(tree: TreeNode) -> TreeNode:
    """Midpoint rooting of an unrooted (trifurcating root) tree
    (Tree_node::get_rooted_tree, tree_node.h:36-103): place the root at
    the midpoint of the longest leaf-to-leaf path."""
    if len(tree.children) <= 2:
        return tree

    # collect edges of the unrooted tree; work on a parentized copy
    parent: dict[int, TreeNode] = {}

    def set_parents(n):
        for c in n.children:
            parent[id(c)] = n
            set_parents(c)
    set_parents(tree)

    # depth-first longest path from each leaf (small trees: O(n^2) fine)
    leaves = list(tree.leaves())

    def path_between(a, b):
        # node -> root chains
        ca, cb = [], []
        x = a
        while x is not None:
            ca.append(x)
            x = parent.get(id(x))
        x = b
        while x is not None:
            cb.append(x)
            x = parent.get(id(x))
        sa = {id(x) for x in ca}
        lca = next(x for x in cb if id(x) in sa)
        path = []
        x = a
        while x is not lca:
            path.append((x, x.dist))
            x = parent.get(id(x))
        tail = []
        x = b
        while x is not lca:
            tail.append((x, x.dist))
            x = parent.get(id(x))
        return path, lca, tail[::-1]

    best = None
    for i in range(len(leaves)):
        for j in range(i + 1, len(leaves)):
            pa, lca, pb = path_between(leaves[i], leaves[j])
            d = sum(x[1] for x in pa) + sum(x[1] for x in pb)
            if best is None or d > best[0]:
                best = (d, pa, lca, pb)

    total, pa, lca, pb = best
    half = total / 2.0
    # walk the path from leaf a towards b accumulating distance. Edges
    # on the a-side (pa) are entered from their BOTTOM (node) end;
    # edges past the LCA (pb) from their TOP (parent) end, so the
    # node-side/parent-side split lengths swap there.
    chain = [(node, d, False) for (node, d) in pa] + \
            [(node, d, True) for (node, d) in pb]
    acc = 0.0
    for (node, d, downward) in chain:
        if acc + d >= half:
            # root on this edge: split it
            if downward:
                lower = acc + d - half      # distance from `node`
                upper = half - acc
            else:
                lower = half - acc
                upper = acc + d - half
            return _reroot_on_edge(tree, parent, node, lower, upper)
        acc += d
    return tree


def _reroot_on_edge(tree, parent, node, below_len, above_len):
    """Create a new root in the middle of the edge above `node`."""
    p = parent.get(id(node))
    if p is None:
        return tree
    # detach node from p
    p.children = [c for c in p.children if c is not node]
    # invert the path from p up to the old root
    new_root = TreeNode(name="", dist=0.0)
    node.dist = below_len
    other = _invert_up(p, parent)
    other.dist = above_len
    new_root.children = [node, other]
    new_root.binarize()
    return new_root


def _invert_up(n, parent):
    """Turn n (with its former parent chain) into a subtree hanging down."""
    p = parent.get(id(n))
    if p is not None:
        p.children = [c for c in p.children if c is not n]
        sub = _invert_up(p, parent)
        sub.dist = n.dist
        n.children.append(sub)
    if len(n.children) == 1:
        # collapse unary node
        child = n.children[0]
        child.dist += n.dist
        return child
    return n
