"""Full SequenceGraph serialization (npz) — the framework's mid-run
checkpoint format.

The reference's only checkpoint-adjacent capability is the `.grp` root
graph export (sites + edges, fasta_reader.cpp:1067-1106), which cannot
resume a progressive run: it drops the child column indices the
alignment extraction descends. This npz format captures the complete
graph state (sites incl. child indices, posterior support, pileup
counts; edges incl. usage/branch counters; metadata), so
`align_progressive(checkpoint_dir=...)` can skip finished subtrees on
restart — checkpoint/resume is an intended production capability with
no reference counterpart (SURVEY §5)."""
from __future__ import annotations

import numpy as np

from .sequence_graph import SequenceGraph, _Edges

_SITE_FIELDS_I = ("states", "site_type", "path_state", "child_l",
                  "child_r", "site_bcount_slu", "sumA", "sumC",
                  "sumG", "sumT")
_SITE_FIELDS_F = ("posterior_support", "site_bdist_slu")
_EDGE_FIELDS_I = ("start", "end", "bcount_slu", "bcount_skip")
_EDGE_FIELDS_F = ("weight", "bdist_slu")


def graph_to_npz(g: SequenceGraph, path) -> None:
    n = g.num_sites()
    data = {}
    for f in _SITE_FIELDS_I:
        data[f] = np.asarray(getattr(g, f), np.int64)
    for f in _SITE_FIELDS_F:
        data[f] = np.asarray(getattr(g, f), np.float64)
    data["ambiguous"] = np.asarray(g.ambiguous, bool)
    data["symbols"] = np.asarray(g.symbols, dtype=object)
    for f in _EDGE_FIELDS_I:
        data["e_" + f] = np.asarray(getattr(g.edges, f), np.int64)
    for f in _EDGE_FIELDS_F:
        data["e_" + f] = np.asarray(getattr(g.edges, f), np.float64)
    data["e_used"] = np.asarray(g.edges.used, bool)
    # per-site ordered edge-id lists, flattened with offsets
    for name in ("bwd", "fwd"):
        lists = getattr(g, name)
        flat = np.asarray([e for lst in lists for e in lst], np.int64)
        offs = np.zeros(n + 1, np.int64)
        for i, lst in enumerate(lists):
            offs[i + 1] = offs[i] + len(lst)
        data[name + "_flat"] = flat
        data[name + "_offs"] = offs
    data["meta"] = np.asarray(
        [g.data_type, g.gap_symbol, g.gapped_seq or ""], dtype=object)
    data["flags"] = np.asarray(
        [g.is_read_sequence, g.has_read_descendants,
         g.terminal_sequence], bool)
    data["num_duplicates"] = np.int64(g.num_duplicates)
    np.savez_compressed(path, **data)


def graph_from_npz(path) -> SequenceGraph:
    z = np.load(path, allow_pickle=True)
    data_type, gap_symbol, gapped = (str(x) for x in z["meta"])
    g = SequenceGraph(data_type, gap_symbol=gap_symbol)
    for f in _SITE_FIELDS_I:
        setattr(g, f, [int(v) for v in z[f]])
    for f in _SITE_FIELDS_F:
        setattr(g, f, [float(v) for v in z[f]])
    g.ambiguous = [bool(v) for v in z["ambiguous"]]
    g.symbols = [str(v) for v in z["symbols"]]
    e = _Edges()
    for f in _EDGE_FIELDS_I:
        setattr(e, f, [int(v) for v in z["e_" + f]])
    for f in _EDGE_FIELDS_F:
        setattr(e, f, [float(v) for v in z["e_" + f]])
    e.used = [bool(v) for v in z["e_used"]]
    g.edges = e
    for name in ("bwd", "fwd"):
        flat = z[name + "_flat"]
        offs = z[name + "_offs"]
        setattr(g, name, [[int(v) for v in flat[offs[i]:offs[i + 1]]]
                          for i in range(len(offs) - 1)])
    flags = z["flags"]
    g.is_read_sequence = bool(flags[0])
    g.has_read_descendants = bool(flags[1])
    g.terminal_sequence = bool(flags[2])
    g.num_duplicates = int(z["num_duplicates"])
    g.gapped_seq = gapped or None
    return g
