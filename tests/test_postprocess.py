"""Tests for output post-processing (--events, prune/trim, NHX trees)
and the FASTQ q-score graph builder."""
import os
import subprocess
import sys

import pytest

from pagan2_tpu.io.fasta import FastaEntry
from pagan2_tpu.tree.newick import TreeNode, parse_newick
from pagan2_tpu.pipeline.postprocess import (
    count_events, trim_alignment, prune_extended_alignment,
    remove_gap_only_columns, tagged_topology, print_nhx_tree,
    read_node_names, closest_reference_leaves, maxmin_distant_subset)


def _tree_with_reads():
    # ((A:1,q1:1)#1#:1,(B:1,q2:1)#2#:1)#3#
    t = parse_newick("((A:1,q1:1):1,(B:1,q2:1):1);")
    t.name_internal()

    class G:
        def __init__(self, is_read):
            self.is_read_sequence = is_read

    for leaf in t.leaves():
        leaf.graph = G(leaf.name.startswith("q"))
    return t


def test_tagged_topology_and_nhx():
    t = parse_newick("((A:1,B:2):0.5,C:3);")
    t.name_internal()
    s = tagged_topology(t)
    assert s.startswith("((A,B)#1#,C)") and s.endswith(";")
    t.left.nhx_tid = "007"
    nhx = print_nhx_tree(t)
    assert "[&&NHX:TID=007]" in nhx
    assert nhx.count("(") == 2


def test_count_events_substitution_and_indels(tmp_path):
    t = parse_newick("(A:1,B:1);")
    t.name_internal()
    aln = [FastaEntry(name="A", sequence="ACGT--A"),
           FastaEntry(name="B", sequence="ACTTGGA"),
           FastaEntry(name="#1#", sequence="ACGT--A")]
    out = str(tmp_path / "ev")
    text = count_events(t, aln, out, "dna")
    assert os.path.exists(out + ".events")
    assert "branch B" in text
    assert "3 G -> T" in text           # substitution at site 3
    assert "5..6 insertion" in text     # B has chars where parent gapped
    # deletions: parent real, child gap — none here
    assert "deletion" not in text


def test_count_events_deletion():
    t = parse_newick("(A:1,B:1);")
    t.name_internal()
    aln = [FastaEntry(name="A", sequence="ACGTA"),
           FastaEntry(name="B", sequence="AC--A"),
           FastaEntry(name="#1#", sequence="ACGTA")]
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        text = count_events(t, aln, d + "/x", "dna")
    assert "3..4 deletion" in text


def test_trim_alignment():
    aln = [FastaEntry(name="ref", sequence="AAAAAAAAAA"),
           FastaEntry(name="q1", sequence="---ACGT---")]
    out = trim_alignment(aln, {"q1"}, keep_sites=1)
    # reference semantics: last_site is exclusive (substr(first, last-first)
    # with last = last_nongap + keep_sites), so one extra col before but
    # keep_sites-1 after (input_output_parser.cpp:839-848)
    assert len(out[0].sequence) == 5   # cols 2..6
    assert out[1].sequence == "-ACGT"


def test_remove_gap_only_columns():
    aln = [FastaEntry(name="a", sequence="A-C-"),
           FastaEntry(name="b", sequence="A--G")]
    remove_gap_only_columns(aln)
    assert aln[0].sequence == "AC-"
    assert aln[1].sequence == "A-G"


def test_read_node_names_and_closest():
    t = _tree_with_reads()
    assert read_node_names(t) == {"q1", "q2"}
    closest = closest_reference_leaves(t)
    assert closest == {"A", "B"}


def test_prune_keeps_reads():
    t = _tree_with_reads()
    aln = [FastaEntry(name=n, sequence="ACGT")
           for n in ("A", "q1", "B", "q2")]
    outs = prune_extended_alignment(t, aln)
    assert len(outs) == 1
    suffix, entries, ptree = outs[0]
    assert suffix == ".pruned"
    assert {e.name for e in entries} == {"q1", "q2"}
    assert {l.name for l in ptree.leaves()} == {"q1", "q2"}


def test_prune_keep_closest():
    t = _tree_with_reads()
    aln = [FastaEntry(name=n, sequence="ACGT")
           for n in ("A", "q1", "B", "q2")]
    outs = prune_extended_alignment(t, aln, keep_closest=True)
    suffixes = [o[0] for o in outs]
    assert ".pruned_closest" in suffixes
    ents = dict((o[0], o[1]) for o in outs)[".pruned_closest"]
    assert {e.name for e in ents} == {"A", "B", "q1", "q2"}


def test_maxmin_distant_subset():
    t = parse_newick("((A:1,B:0.1):1,(C:5,D:0.1):1);")
    got = maxmin_distant_subset(t, {"A", "B", "C", "D"}, 2)
    assert len(got) == 2
    assert "C" in got  # deepest leaf always picked


def test_fastq_qscore_masking():
    from pagan2_tpu.graph.builders import build_leaf_graph
    # qscore 'I' = 40 (high), '!' = 0 (low)
    g = build_leaf_graph("ACGT", "dna", quality="I!II", qscore_minimum=10)
    # site 2 (C, q=0) masked to N state, lowercase symbol
    from pagan2_tpu.models import alphabets as alph
    a = alph.get_alphabet("dna")
    assert g.states[2] == a.state_of("N")
    assert g.symbols[2] == "c"
    assert g.states[1] == a.state_of("A")


def test_fastq_454_low_q_weights():
    from pagan2_tpu.graph.builders import build_leaf_graph
    # low-q site then next site: 454 gives 0.6/0.4 split edges
    g = build_leaf_graph("ACGT", "dna", quality="I!II", qscore_minimum=10,
                         mode454=True)
    # edge into site 3 (after low-q site 2): direct weight 0.6 + skip 0.4
    import numpy as np
    ws = sorted(float(g.edges.weight[e]) for e in g.bwd[3])
    assert ws == pytest.approx([0.4, 0.6])


def test_fastq_break_sites():
    from pagan2_tpu.graph.builders import build_leaf_graph
    from pagan2_tpu.graph.sequence_graph import (BREAK_START_SITE,
                                                 BREAK_STOP_SITE)
    g = build_leaf_graph("AC0GT", "dna", quality="II0II")
    assert g.site_type[2] == BREAK_START_SITE
    assert g.site_type[3] == BREAK_STOP_SITE


def test_cli_events_and_nhx(tmp_path):
    seqs = tmp_path / "s.fas"
    seqs.write_text(">A\nACGTTTAC\n>B\nACGTGTAC\n>C\nACGAGTAC\n")
    tree = tmp_path / "t.nh"
    tree.write_text("((A:0.1,B:0.1):0.05,C:0.1);")
    out = tmp_path / "out"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "pagan2_tpu", "-s", str(seqs), "-t",
         str(tree), "-o", str(out), "--events", "--guidetree", "--silent",
         "--check-valid-graphs"],
        capture_output=True, text=True, env=env)
    assert r.returncode == 0, r.stderr
    ev = (str(out) + ".events")
    assert os.path.exists(ev)
    assert "Inferred evolutionary events per branch:" in open(ev).read()
    assert os.path.exists(str(out) + ".nhx_tree")
