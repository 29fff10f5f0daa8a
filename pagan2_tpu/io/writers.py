"""HSAML XML alignment writer and .grp graph export/import
(equivalents of Xml_writer, src/utils/xml_writer.cpp, and
Fasta_reader::write_graph / the .grp reader, fasta_reader.cpp:344-440,
:1067-1106). The .grp round-trip doubles as the checkpoint format for a
growing pileup root graph."""
from __future__ import annotations

from xml.sax.saxutils import escape, quoteattr

from ..tree.newick import TreeNode
from ..graph.sequence_graph import SequenceGraph
from ..models import alphabets as alph
from .fasta import FastaEntry


def write_xml(tree: TreeNode, entries: list[FastaEntry],
              path: str | None = None, nhx: bool = False) -> str:
    """HSAML <ms_alignment> with the guide tree and one node per row.
    With nhx=True the tree carries NHX TID tags (--xml-nhx)."""
    out = ["<ms_alignment>"]
    if nhx:
        from ..pipeline.postprocess import print_nhx_tree
        out.append("<newick>" + escape(print_nhx_tree(tree))
                   + "</newick>")
    else:
        out.append("<newick>"
                   + escape(tree.to_newick(with_names_for_internal=True))
                   + "</newick>")
    out.append("<nodes>")
    leaf_ids = {l.name: str(i + 1) for i, l in enumerate(tree.leaves())}
    for e in entries:
        is_internal = e.name.startswith("#") and e.name.endswith("#")
        nm = quoteattr(e.name)
        seq = escape(e.sequence)
        if is_internal:
            out.append(f'<node id={nm} name={nm}>')
            out.append(f"  <sequence>\n    {seq}\n  </sequence>\n</node>")
        else:
            nid = quoteattr(leaf_ids.get(e.name, e.name))
            out.append(f'<leaf id={nid} name={nm}>')
            out.append(f"  <sequence>\n    {seq}\n  </sequence>\n</leaf>")
    out.append("</nodes>")
    out.append("</ms_alignment>")
    text = "\n".join(out) + "\n"
    if path:
        with open(path, "w") as f:
            f.write(text)
    return text


# ----------------------------------------------------------------------
def write_graph_file(g: SequenceGraph, path: str | None = None) -> str:
    """.grp format: '<idx> <char>; <start> <end> <weight>;...' per site
    (fasta_reader.cpp:1067-1106)."""
    a = alph.get_alphabet(g.data_type)
    out = ["# root node"]
    out.append("0 start;")
    n = g.num_sites()
    for i in range(1, n - 1):
        st = g.states[i]
        sym = a.symbols[st] if 0 <= st < len(a.symbols) else "N"
        row = [f"{i} {sym}; "]
        for eid in g.bwd[i]:
            row.append(f"{g.edges.start[eid]} {g.edges.end[eid]} "
                       f"{float(g.edges.weight[eid]):g};")
        out.append("".join(row))
    row = [f"{n - 1} end; "]
    for eid in g.bwd[n - 1]:
        row.append(f"{g.edges.start[eid]} {g.edges.end[eid]} "
                   f"{float(g.edges.weight[eid]):g};")
    out.append("".join(row))
    text = "\n".join(out) + "\n"
    if path:
        with open(path, "w") as f:
            f.write(text)
    return text


def read_graph_file(path_or_text, data_type: str = "dna",
                    is_text=False) -> SequenceGraph:
    """Parse a .grp file back into a SequenceGraph."""
    from ..graph.sequence_graph import (SequenceGraph, START_SITE, STOP_SITE,
                                        REAL_SITE, ENDS_SITE, TERMINAL)
    text = path_or_text if is_text else open(path_or_text).read()
    a = alph.get_alphabet(data_type)
    rows = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        head, _, rest = line.partition(";")
        parts = head.split()
        idx = int(parts[0])
        sym = parts[1] if len(parts) > 1 else "start"
        edges = []
        for tok in rest.split(";"):
            tok = tok.strip()
            if not tok:
                continue
            se = tok.split()
            if len(se) >= 3:
                edges.append((int(se[0]), int(se[1]), float(se[2])))
        rows.append((idx, sym, edges))

    g = SequenceGraph(data_type, gap_symbol=a.gap_symbol)
    n = max(r[0] for r in rows) + 1
    by_idx = {r[0]: r for r in rows}
    g.add_site(-1, symbol="0", site_type=START_SITE, path_state=ENDS_SITE)
    g.add_edge(-1, 0)
    for idx in range(1, n - 1):
        row = by_idx.get(idx)
        sym = row[1] if row else "N"
        # state_of is case-aware: the 51-group aa alphabet's group
        # states print as lowercase letters/digits and must round-trip
        st = a.state_of(sym)
        if st < 0:
            st = (a.n_full - 1 if a.name == alph.DNA
                  else a.state_of("X"))
        g.add_site(st, symbol=sym, site_type=REAL_SITE, path_state=TERMINAL)
    g.add_site(-1, symbol="0", site_type=STOP_SITE, path_state=ENDS_SITE)
    for idx, _sym, edges in rows:
        for (s, e, w) in edges:
            if 0 <= s < n and 0 < e < n:
                g.add_edge(s, e, w)
    return g
