"""Tree-guided progressive alignment driver.

Equivalent of Node::start_alignment / align_sequences_this_node /
get_alignment (src/main/node.cpp:52-345, :537-832). The guide tree is
executed in *generations*: every node whose two children are done is
ready, and one generation's pairwise alignments are independent jobs —
the unit that gets batched into vmapped kernel launches and sharded over
a device mesh (the reference's OpenMP wavefront, node.cpp:227-269,
re-expressed data-parallel).
"""
from __future__ import annotations

from dataclasses import dataclass, field

from ..graph.builders import build_leaf_graph
from ..graph.sequence_graph import NON_REAL, XSKIPPED, YSKIPPED
from ..io.fasta import FastaEntry, clean_sequence
from ..models import ModelFactory, alphabets as alph
from ..align import align_pair, AlignSettings
from ..tree.newick import TreeNode, parse_newick


@dataclass
class ProgressiveResult:
    tree: TreeNode
    alignment: list[FastaEntry]
    node_graphs: dict = field(default_factory=dict)


def match_sequences_to_tree(tree: TreeNode, entries: list[FastaEntry]):
    """Fasta_reader::place_sequences_to_nodes equivalent: leaf names must
    match sequence names (silent prefix matching like the reference's
    relaxed matching is not attempted)."""
    by_name = {e.name: e for e in entries}
    missing = [l.name for l in tree.leaves() if l.name not in by_name]
    if missing:
        raise ValueError(f"sequences missing for tree leaves: {missing}")
    return {l.name: by_name[l.name] for l in tree.leaves()}


def generations(tree: TreeNode):
    """Yield lists of internal nodes whose children are both finished —
    the OpenMP readiness rule (node.cpp:240-264)."""
    done = {id(l) for l in tree.leaves()}
    pending = [n for n in tree.nodes_postorder() if not n.is_leaf]
    while pending:
        ready = [n for n in pending
                 if id(n.left) in done and id(n.right) in done]
        if not ready:
            raise RuntimeError("guide tree scheduling stuck")
        yield ready
        for n in ready:
            done.add(id(n))
        pending = [n for n in pending if id(n) not in done]


def align_progressive(entries: list[FastaEntry], tree: TreeNode | str,
                      data_type: str | None = None,
                      settings: AlignSettings | None = None,
                      model_factory: ModelFactory | None = None,
                      engine: str = "auto",
                      include_internal_nodes: bool = False,
                      mode454: bool = False,
                      homopolymer: bool = False) -> ProgressiveResult:
    if isinstance(tree, str):
        tree = parse_newick(tree)
    tree.apply_branch_length_rules()
    tree.name_internal()

    if data_type is None:
        from ..io.fasta import guess_data_type
        data_type = guess_data_type(entries)

    settings = settings or AlignSettings()
    if model_factory is None:
        if data_type == alph.DNA:
            from ..io.fasta import empirical_dna_frequencies
            pi = empirical_dna_frequencies(entries)
            model_factory = ModelFactory(alph.DNA, dna_pi=pi)
        else:
            model_factory = ModelFactory(data_type)

    seq_map = match_sequences_to_tree(tree, entries)
    for leaf in tree.leaves():
        seq = clean_sequence(seq_map[leaf.name].sequence, data_type)
        leaf.graph = build_leaf_graph(seq, data_type, mode454=mode454,
                                      homopolymer=homopolymer)

    # generation-wise execution; each generation's jobs are independent
    for gen in generations(tree):
        for node in gen:
            dist = node.left.dist + node.right.dist
            model = model_factory.alignment_model(dist)
            anc, _end = align_pair(node.left.graph, node.right.graph, model,
                                   settings,
                                   left_branch_length=node.left.dist,
                                   right_branch_length=node.right.dist,
                                   engine=engine)
            node.graph = anc

    alignment = extract_alignment(tree, include_internal_nodes,
                                  data_type=data_type)
    return ProgressiveResult(tree=tree, alignment=alignment)


# ----------------------------------------------------------------------
def extract_alignment(tree: TreeNode, include_internal_nodes=False,
                      data_type: str = "dna") -> list[FastaEntry]:
    """Node::get_alignment (node.cpp:537-624): walk root columns and
    recursively expand child columns."""
    if include_internal_nodes:
        nodes = list(tree.nodes_inorder())
    else:
        nodes = list(tree.leaves())
    entries = [FastaEntry(name=n.name) for n in nodes]
    rows = [[] for _ in nodes]

    root = tree.graph
    anc_syms = alph.ancestral_symbols(data_type)

    def column_at(node: TreeNode, j: int, out: list):
        g = node.graph
        if node.is_leaf:
            out.append(g.symbols[j])
            return
        lj = g.child_l[j]
        rj = g.child_r[j]
        if lj >= 0:
            column_at(node.left, lj, out)
        else:
            k = (node.left.num_leaves() if not include_internal_nodes
                 else 2 * node.left.num_leaves() - 1)
            out.extend([g.gap_symbol] * k)
        if include_internal_nodes:
            st = g.states[j]
            c = anc_syms[st] if st >= 0 else g.gap_symbol
            if g.path_state[j] in (XSKIPPED, YSKIPPED) or \
                    g.site_type[j] == NON_REAL:
                c = g.gap_symbol
            out.append(c)
        if rj >= 0:
            column_at(node.right, rj, out)
        else:
            k = (node.right.num_leaves() if not include_internal_nodes
                 else 2 * node.right.num_leaves() - 1)
            out.extend([g.gap_symbol] * k)

    # NOTE: non_real (deleted-range) sites still emit columns — deletion
    # only severs graph edges (node.cpp:557-577 iterates all root sites)
    for j in range(1, root.num_sites() - 1):
        col: list[str] = []
        column_at(tree, j, col)
        for r, ch in zip(rows, col):
            r.append(ch)

    for e, r in zip(entries, rows):
        e.sequence = "".join(r)
    return entries
