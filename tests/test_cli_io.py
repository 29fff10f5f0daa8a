"""CLI end-to-end, writers (xml/.grp), ancestors, guide-tree inference."""
import json
import os

import numpy as np
import pytest

from pagan2_tpu.cli import main as cli_main
from pagan2_tpu.io.fasta import FastaEntry, read_fasta, write_fasta


@pytest.fixture
def family(tmp_path):
    seqs = {"a": "ACGTACGTTGCA", "b": "ACGTACGTTGCA", "c": "ACGTACTTGCA",
            "d": "ACGTACGTTGCA"}
    fas = tmp_path / "in.fas"
    write_fasta([FastaEntry(name=k, sequence=v) for k, v in seqs.items()],
                fas)
    nh = tmp_path / "t.nh"
    nh.write_text("((a:0.1,b:0.1):0.05,(c:0.1,d:0.1):0.05);")
    return tmp_path, fas, nh, seqs


class TestCli:
    def test_basic_alignment(self, family):
        tmp, fas, nh, seqs = family
        out = tmp / "out"
        rc = cli_main(["-s", str(fas), "-t", str(nh), "-o", str(out),
                       "--silent", "--engine", "oracle"])
        assert rc == 0
        got = read_fasta(str(out) + ".fas")
        assert {e.name for e in got} == set(seqs)
        for e in got:
            assert e.sequence.replace("-", "") == seqs[e.name]

    def test_ancestors_and_xml(self, family):
        tmp, fas, nh, seqs = family
        out = tmp / "anc"
        rc = cli_main(["-s", str(fas), "-t", str(nh), "-o", str(out),
                       "--output-ancestors", "--xml", "--silent",
                       "--engine", "oracle"])
        assert rc == 0
        got = read_fasta(str(out) + ".fas")
        assert len(got) == 7  # 4 leaves + 3 ancestors
        xml = open(str(out) + ".xml").read()
        assert "<ms_alignment>" in xml and "<newick>" in xml
        assert os.path.exists(str(out) + ".anctree")

    def test_graph_output_roundtrip(self, family):
        tmp, fas, nh, seqs = family
        out = tmp / "g"
        rc = cli_main(["-s", str(fas), "-t", str(nh), "-o", str(out),
                       "--output-graph", "--silent", "--engine", "oracle"])
        assert rc == 0
        from pagan2_tpu.io.writers import read_graph_file
        g = read_graph_file(str(out) + ".grp")
        assert g.check_valid_graph()
        assert g.num_sites() >= 12

    def test_pileup_cli(self, tmp_path):
        reads = [FastaEntry(name=f"r{i}", sequence="ACGTTGCAACGGTT")
                 for i in range(3)]
        q = tmp_path / "reads.fas"
        write_fasta(reads, q)
        out = tmp_path / "p"
        rc = cli_main(["--pileup", "--homopolymer", "-q", str(q),
                       "-o", str(out), "--silent"])
        assert rc == 0
        got = read_fasta(str(out) + ".fas")
        assert len(got) == 3

    def test_no_tree_infers(self, family):
        tmp, fas, nh, seqs = family
        out = tmp / "inf"
        rc = cli_main(["-s", str(fas), "-o", str(out), "--silent",
                       "--engine", "oracle"])
        assert rc == 0
        got = read_fasta(str(out) + ".fas")
        assert {e.name for e in got} == set(seqs)

    def test_outformats(self, family):
        tmp, fas, nh, seqs = family
        for fmt, ext in [("phylip", ".phy"), ("nexus", ".nex"),
                         ("paml", ".phy")]:
            out = tmp / f"fmt_{fmt}"
            rc = cli_main(["-s", str(fas), "-t", str(nh), "-o", str(out),
                           "--outformat", fmt, "--silent",
                           "--engine", "oracle"])
            assert rc == 0
            assert os.path.exists(str(out) + ext)


class TestTreeInference:
    def test_clusters_related(self):
        from pagan2_tpu.tree.inference import infer_guide_tree
        from pagan2_tpu.tree.newick import parse_newick
        rng = np.random.default_rng(4)
        base1 = "".join(rng.choice(list("ACGT"), size=120))
        base2 = "".join(rng.choice(list("ACGT"), size=120))

        def mut(s, p=0.05):
            return "".join(c if rng.random() > p else "ACGT"[rng.integers(4)]
                           for c in s)
        entries = [FastaEntry(name="a1", sequence=mut(base1)),
                   FastaEntry(name="a2", sequence=mut(base1)),
                   FastaEntry(name="b1", sequence=mut(base2)),
                   FastaEntry(name="b2", sequence=mut(base2))]
        t = parse_newick(infer_guide_tree(entries))
        # the two a's (and two b's) must be cherries
        def partner(name):
            for n in t.nodes_postorder():
                if not n.is_leaf and len(n.children) == 2:
                    names = sorted(c.name for c in n.children if c.is_leaf)
                    if name in names and len(names) == 2:
                        return [x for x in names if x != name][0]
            return None
        assert partner("a1") == "a2"
        assert partner("b1") == "b2"


class TestAncestors:
    def test_parsimony_pushdown(self):
        from pagan2_tpu.pipeline import align_progressive
        from pagan2_tpu.pipeline.ancestors import (
            reconstruct_parsimony_ancestors)
        from pagan2_tpu.models import ModelFactory, alphabets as alph
        seqs = {"a": "ACGT", "b": "ACTT", "c": "ACGT"}
        entries = [FastaEntry(name=k, sequence=v) for k, v in seqs.items()]
        res = align_progressive(entries, "((a:0.1,b:0.1):0.05,c:0.1);",
                                engine="oracle",
                                include_internal_nodes=True)
        mf = ModelFactory(alph.DNA)
        reconstruct_parsimony_ancestors(res.tree, mf.alphabet)
        # root states must now be canonical (resolved by c's evidence)
        g = res.tree.graph
        states = [g.states[j] for j in range(1, g.num_sites() - 1)]
        assert all(0 <= s < 4 for s in states)

    def test_ml_ancestors_smoke(self):
        from pagan2_tpu.pipeline import align_progressive
        from pagan2_tpu.pipeline.ancestors import reconstruct_ml_ancestors
        from pagan2_tpu.models import ModelFactory, alphabets as alph
        seqs = {"a": "ACGTACGT", "b": "ACGTACGT", "c": "ACTTACGT"}
        entries = [FastaEntry(name=k, sequence=v) for k, v in seqs.items()]
        res = align_progressive(entries, "((a:0.1,b:0.1):0.05,c:0.1);",
                                engine="oracle")
        mf = ModelFactory(alph.DNA)
        reconstruct_ml_ancestors(res.tree, mf)
        g = res.tree.graph
        # ML states at matched sites are canonical and match the majority
        syms = "ACGT"
        seq = "".join(syms[g.states[j]] if 0 <= g.states[j] < 4 else "?"
                      for j in range(1, g.num_sites() - 1))
        assert seq == "ACGTACGT"


def test_progressive_with_queryfile_places_queries(tmp_path):
    """-s/-t + -q: the reference aligns queries onto the finished
    progressive alignment's root (main.cpp:206-218) — the CLI must run
    placement after ANY alignment, not only after --ref-seqfile
    (round-5 gap: queries were silently ignored)."""
    seqs = {"a": "ACGTACGTTGCAACGTGGTC", "b": "ACGTACGTTGCAACGTGGTC",
            "c": "ACGTACTTGCAACGTGGTC", "d": "ACGTACGTTGCAACGTGGTC"}
    fas = tmp_path / "in.fas"
    write_fasta([FastaEntry(name=k, sequence=v)
                 for k, v in seqs.items()], fas)
    nh = tmp_path / "t.nh"
    nh.write_text("((a:0.1,b:0.1):0.05,(c:0.1,d:0.1):0.05);")
    q = tmp_path / "q.fas"
    write_fasta([FastaEntry(name="q0",
                            sequence="ACGTACGTTGCAACGTGGTC")], q)
    out = tmp_path / "out"
    rc = cli_main(["-s", str(fas), "-t", str(nh), "-q", str(q),
                   "-o", str(out), "--silent", "--engine", "oracle",
                   "--one-placement-only"])
    assert rc == 0
    got = read_fasta(str(out) + ".fas")
    names = {e.name for e in got}
    assert any(n.startswith("q0") for n in names), names
    by = {e.name: e.sequence for e in got}
    qrow = next(v for k, v in by.items() if k.startswith("q0"))
    assert qrow.replace("-", "") == "ACGTACGTTGCAACGTGGTC"
