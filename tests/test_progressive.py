"""Tree-guided progressive alignment end-to-end (milestone B).

Oracles: hand-checkable small families, alignment well-formedness
(equal row lengths, ungapped content preserved), and engine equivalence
(oracle vs jax produce identical MSAs)."""
import numpy as np
import pytest

from pagan2_tpu.io.fasta import FastaEntry, read_fasta, write_fasta
from pagan2_tpu.pipeline import align_progressive
from pagan2_tpu.tree.newick import parse_newick, midpoint_root


def make_entries(d):
    return [FastaEntry(name=k, sequence=v) for k, v in d.items()]


def check_msa(entries, originals):
    lengths = {len(e.sequence) for e in entries}
    assert len(lengths) == 1, "rows must be equal length"
    by_name = {e.name: e for e in entries}
    for name, seq in originals.items():
        assert by_name[name].sequence.replace("-", "") == seq, name


class TestNewick:
    def test_parse_simple(self):
        t = parse_newick("(a:0.1,b:0.2);")
        assert [l.name for l in t.leaves()] == ["a", "b"]
        assert t.left.dist == pytest.approx(0.1)

    def test_parse_nested(self):
        t = parse_newick("((a:0.1,b:0.2):0.05,c:0.3);")
        assert [l.name for l in t.leaves()] == ["a", "b", "c"]
        assert not t.is_leaf and not t.left.is_leaf

    def test_multifurcation_binarized(self):
        t = parse_newick("(a:0.1,b:0.1,c:0.1,d:0.1);")
        for n in t.nodes_postorder():
            assert len(n.children) in (0, 2)
        assert sorted(l.name for l in t.leaves()) == list("abcd")

    def test_branch_length_rules(self):
        t = parse_newick("(a:0.5,b:0);")
        t.apply_branch_length_rules()
        assert t.left.dist == pytest.approx(0.2)   # truncated
        assert t.right.dist == pytest.approx(0.001)  # min length

    def test_roundtrip(self):
        t = parse_newick("((a:0.1,b:0.2):0.05,c:0.3);")
        t2 = parse_newick(t.to_newick())
        assert [l.name for l in t2.leaves()] == ["a", "b", "c"]

    def test_midpoint_root(self):
        t = parse_newick("(a:1.0,b:0.2,c:0.2);")
        r = midpoint_root(t)
        for n in r.nodes_postorder():
            assert len(n.children) in (0, 2)
        assert sorted(l.name for l in r.leaves()) == ["a", "b", "c"]


class TestProgressive:
    def test_three_identical(self):
        seqs = {"a": "ACGTACGT", "b": "ACGTACGT", "c": "ACGTACGT"}
        res = align_progressive(make_entries(seqs),
                                "((a:0.1,b:0.1):0.05,c:0.15);")
        check_msa(res.alignment, seqs)
        for e in res.alignment:
            assert e.sequence == "ACGTACGT"

    def test_three_with_deletion(self):
        seqs = {"a": "ACGTTTACGT", "b": "ACGTTTACGT", "c": "ACGTACGT"}
        res = align_progressive(make_entries(seqs),
                                "((a:0.1,b:0.1):0.05,c:0.15);")
        check_msa(res.alignment, seqs)
        by = {e.name: e.sequence for e in res.alignment}
        assert by["a"] == "ACGTTTACGT"
        assert by["c"].count("-") == 2

    def test_insertion_not_repenalised(self):
        # the phylogeny-aware model: an insertion in one taxon opens a
        # gap once, and deeper joins skip it without re-penalising
        seqs = {"a": "ACGTACGT", "b": "ACGTACGT",
                "c": "ACGTGGGACGT", "d": "ACGTACGT"}
        res = align_progressive(
            make_entries(seqs),
            "(((a:0.1,b:0.1):0.05,c:0.1):0.05,d:0.15);")
        check_msa(res.alignment, seqs)
        by = {e.name: e.sequence for e in res.alignment}
        assert by["c"].replace("-", "") == seqs["c"]
        # a,b,d carry the gap column(s) for c's GGG insertion
        assert by["a"].count("-") == 3
        assert by["d"].count("-") == 3

    def test_internal_nodes_included(self):
        seqs = {"a": "ACGT", "b": "ACGT", "c": "ACGT"}
        res = align_progressive(make_entries(seqs),
                                "((a:0.1,b:0.1):0.05,c:0.15);",
                                include_internal_nodes=True)
        assert len(res.alignment) == 5
        names = [e.name for e in res.alignment]
        assert "#1#" in names and "#2#" in names

    def test_engines_agree(self):
        rng = np.random.default_rng(7)
        base = "".join(rng.choice(list("ACGT"), size=40))

        def mut(s):
            out = []
            for ch in s:
                r = rng.random()
                if r < 0.03:
                    continue
                if r < 0.06:
                    out.append("ACGT"[rng.integers(4)])
                out.append(ch if rng.random() > 0.08 else
                           "ACGT"[rng.integers(4)])
            return "".join(out)

        seqs = {"a": mut(base), "b": mut(base), "c": mut(base),
                "d": mut(base), "e": mut(base)}
        tree = "(((a:0.1,b:0.12):0.04,(c:0.08,d:0.1):0.06):0.03,e:0.2);"
        r1 = align_progressive(make_entries(seqs), tree, engine="oracle")
        r2 = align_progressive(make_entries(seqs), tree, engine="jax")
        for e1, e2 in zip(r1.alignment, r2.alignment):
            assert e1.sequence == e2.sequence, e1.name

    def test_ten_taxa_smoke(self):
        rng = np.random.default_rng(11)
        base = "".join(rng.choice(list("ACGT"), size=60))
        names = [f"t{i}" for i in range(10)]
        seqs = {}
        for n in names:
            s = list(base)
            for _ in range(6):
                p = rng.integers(len(s))
                s[p] = "ACGT"[rng.integers(4)]
            seqs[n] = "".join(s)
        # caterpillar tree
        tree = "t0:0.1"
        for n in names[1:]:
            tree = f"({tree},{n}:0.1):0.05"
        tree += ";"
        res = align_progressive(make_entries(seqs), tree)
        check_msa(res.alignment, seqs)


class TestFastaIO:
    def test_roundtrip(self, tmp_path):
        entries = make_entries({"s1": "ACGT", "s2": "GGTT"})
        p = tmp_path / "x.fas"
        write_fasta(entries, p)
        back = read_fasta(p)
        assert [(e.name, e.sequence) for e in back] == \
            [("s1", "ACGT"), ("s2", "GGTT")]


def test_branch_rules_not_reapplied_over_cli_choices():
    """align_progressive must not clobber branch lengths the caller
    already corrected with --real-branches etc. (the reference corrects
    once, in Node::set_distance_to_parent)."""
    t = parse_newick("(a:0.9,b:0.8);")
    t.apply_branch_length_rules(truncate=None, real_branches=True)
    res = align_progressive(make_entries({"a": "ACGTACGT",
                                          "b": "ACGTACGT"}), t,
                            data_type="dna")
    ds = sorted(n.dist for n in res.tree.nodes_postorder()
                if n is not res.tree)
    assert ds == [0.8, 0.9], ds


def test_midpoint_root_balances_far_side():
    """Edges past the LCA are entered from their parent end; the split
    lengths must not mirror (a:1,b:10 rooted 5.5/5.5, not 4.5/6.5)."""
    from pagan2_tpu.tree.newick import TreeNode
    t = TreeNode(children=[TreeNode(name="a", dist=1.0),
                           TreeNode(name="b", dist=10.0),
                           TreeNode(name="c", dist=1.0)])
    r = midpoint_root(t)
    depth = {}

    def walk(n, d):
        if n.is_leaf:
            depth[n.name] = d
        for c in n.children:
            walk(c, d + c.dist)
    walk(r, 0.0)
    assert abs(depth["a"] - depth["b"]) < 1e-9, depth


def test_checkpoint_resume(tmp_path):
    """Mid-run checkpointing (framework extension, no reference
    counterpart): a restarted run loads finished subtree graphs from
    the checkpoint dir (zero kernel work) and reproduces the alignment;
    a partially-populated dir resumes the remaining generations."""
    from pagan2_tpu.parallel import executor
    import os
    seqs = {f"s{i}": s for i, s in enumerate(
        ["ACGTACGTGGACTTAC", "ACGTACGGACTTAGGT",
         "ACGTATGTGGACTTAC", "ACCTACGTGGATTTAC"])}
    tree = "((s0:0.1,s1:0.1):0.05,(s2:0.1,s3:0.1):0.05);"
    ck = str(tmp_path / "ck")

    res1 = align_progressive(make_entries(seqs), tree,
                             data_type="dna", checkpoint_dir=ck)
    rows1 = {e.name: e.sequence for e in res1.alignment}
    files = sorted(f for f in os.listdir(ck) if f.endswith(".npz"))
    assert len(files) == 3          # three internal nodes

    executor.reset_stats()
    res2 = align_progressive(make_entries(seqs), tree,
                             data_type="dna", checkpoint_dir=ck)
    assert executor.EXEC_STATS["batched_jobs"] == 0
    assert executor.EXEC_STATS["single_jobs"] == 0
    assert {e.name: e.sequence for e in res2.alignment} == rows1

    # partial resume: drop the root checkpoint, only it recomputes
    os.remove(os.path.join(ck, files[-1]))
    executor.reset_stats()
    res3 = align_progressive(make_entries(seqs), tree,
                             data_type="dna", checkpoint_dir=ck)
    total = (executor.EXEC_STATS["batched_jobs"] +
             executor.EXEC_STATS["single_jobs"])
    assert total == 1, executor.EXEC_STATS
    assert {e.name: e.sequence for e in res3.alignment} == rows1

    # a different run must refuse the same directory
    other = {"a": "ACGTACGTGGACTTAC", "b": "ACGTACGGACTTAGGT"}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="different run"):
        align_progressive(make_entries(other), "(a:0.1,b:0.1);",
                          data_type="dna", checkpoint_dir=ck)

    # ... and so must the SAME input under different alignment-relevant
    # configuration (ADVICE r4: settings/model changes must not
    # silently load graphs computed under the old parameters)
    from dataclasses import replace
    from pagan2_tpu.align import AlignSettings
    with _pytest.raises(ValueError, match="different run"):
        align_progressive(
            make_entries(seqs), tree, data_type="dna",
            checkpoint_dir=ck,
            settings=replace(AlignSettings(), branch_skip_probability=0.5))
    with _pytest.raises(ValueError, match="different run"):
        align_progressive(make_entries(seqs), tree, data_type="dna",
                          checkpoint_dir=ck, homopolymer=True)


def test_graph_npz_roundtrip():
    """Full SequenceGraph serialization preserves everything the
    alignment extraction and ancestral machinery read."""
    from pagan2_tpu.graph.serialize import graph_to_npz, graph_from_npz
    from pagan2_tpu.models import ModelFactory
    from pagan2_tpu.align import align_pair, AlignSettings
    from pagan2_tpu.graph import build_leaf_graph
    m = ModelFactory("dna").alignment_model(0.3)
    g1 = build_leaf_graph("ACGTACGTGGAC", "dna")
    g2 = build_leaf_graph("ACGTACGGAC", "dna")
    anc, _ = align_pair(g1, g2, m, AlignSettings())
    import io as _io
    buf = _io.BytesIO()
    graph_to_npz(anc, buf)
    buf.seek(0)
    back = graph_from_npz(buf)
    assert back.num_sites() == anc.num_sites()
    for f in ("states", "site_type", "path_state", "child_l",
              "child_r", "symbols", "bwd", "fwd"):
        assert getattr(back, f) == getattr(anc, f), f
    assert list(back.edges.start) == list(anc.edges.start)
    assert [float(w) for w in back.edges.weight] == \
        [float(w) for w in anc.edges.weight]


def test_mostcommon_fix_ambiguous_states():
    # --mostcommon: after each node's alignment the ambiguity chains
    # are resolved by child-set intersection (fix_ambiguous_states,
    # node.cpp:1610-1690). Here leaves a/b disagree (A vs G) so their
    # ancestor is called R; the sister clade is unanimously A, so the
    # root-level fix pushes A back down into that ancestor.
    from pagan2_tpu.models import ModelFactory, alphabets as alph
    entries = [FastaEntry(name="a", sequence="ATAATGG"),
               FastaEntry(name="b", sequence="ATGATGG"),
               FastaEntry(name="c", sequence="ATAATGG"),
               FastaEntry(name="d", sequence="ATAATGG")]
    nwk = "((a:0.1,b:0.1)e:0.05,(c:0.1,d:0.1)f:0.05);"

    def anc_e(mostcommon):
        mf = ModelFactory(alph.DNA, mostcommon=mostcommon)
        res = align_progressive(entries, parse_newick(nwk),
                                data_type=alph.DNA, model_factory=mf)
        for n in res.tree.nodes_postorder():
            if not n.is_leaf and {c.name for c in n.children} == {"a", "b"}:
                return "".join(s for s in n.graph.symbols if s in "ACGTR")
        raise AssertionError("node e not found")

    assert "R" in anc_e(False)          # wildcard keeps the ambiguity
    fixed = anc_e(True)
    assert "R" not in fixed and fixed == "ATAATGG"
