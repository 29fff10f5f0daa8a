"""Round-4 flag wiring: every parsed reference flag must have a real
consumer (anti-inertness), plus functional tests for the newly wired
behaviors — --fragments grouped placement, --rank-reads-for-nodes,
--tid-for-subroot, --score-as-dna, --keep-all-edges, --use-aa-groups,
--prune-keep-threshold, and the native --fast-placement preselection."""
import os
import pathlib
import re

import numpy as np
import pytest

from pagan2_tpu.io.fasta import FastaEntry
from pagan2_tpu.models import ModelFactory, alphabets as alph
from pagan2_tpu.pipeline.refread import read_reference_alignment
from pagan2_tpu.pipeline.placement import place_queries, PlacementConfig


# Documented no-op flags. Each entry must carry a reason; anything not
# listed here must have an `args.<dest>` consumer in the package.
ALLOWED_NOOP = {
    # no subprocesses / temp files exist in this framework
    "temp_folder": "no external subprocesses, nothing writes temp files",
    "keep_temp_files": "no external subprocesses",
    "boost": "no subprocess path handling",
    "docker": "no subprocess path handling",
    "no_ncbi": "NCBI BLAST subprocess replaced by native scoring",
    # dead flags in the reference too (no consumer outside settings.cpp)
    "no_read_ordering": "reference defines it but never reads it "
                        "(settings.cpp:139; zero is()-consumers)",
    "recompute_reference_alignment_model": "reference defines it but "
                                           "never reads it "
                                           "(settings.cpp:273)",
    # tool-internal tuning of subprocesses that are replaced natively;
    # the live preselection behavior maps through --fast-placement /
    # --very-fast-placement / --use-exonerate-local instead
    "old_placement": "legacy exonerate code-path switch",
    "use_exonerate_gapped": "second exonerate pass folded into the "
                            "single native preselection",
    "keep_despite_exonerate_fails": "native preselection cannot fail",
    "exonerate_local_keep_above": "score-ratio variant of keep-best",
    "exonerate_gapped_keep_best": "second-pass count",
    "exonerate_gapped_keep_above": "second-pass ratio",
    "exonerate_hit_length": "exonerate-internal tuning",
    "exonerate_hit_score": "exonerate-internal tuning",
    "exonerate_hit_trim": "exonerate-internal tuning",
    "blast_wordsize": "BLAST-internal tuning",
    "blast_word_threshold": "BLAST-internal tuning",
    "blast_match_reward": "BLAST-internal tuning",
    "blast_mismatch_penalty": "BLAST-internal tuning",
    "blast_scoring_matrix": "BLAST-internal tuning",
}


def test_every_parsed_flag_has_a_consumer():
    """The inverse of test_cli_accepts_every_reference_flag: a flag the
    parser accepts must be read somewhere (`args.<dest>`), or be on the
    documented no-op allowlist. Prevents parse-to-nothing flags from
    reappearing."""
    from pagan2_tpu.cli import build_parser
    import pagan2_tpu
    pkg = pathlib.Path(pagan2_tpu.__file__).parent
    src = "".join(p.read_text() for p in pkg.rglob("*.py"))
    parser = build_parser()
    missing = []
    stale_allow = []
    for action in parser._actions:
        dest = action.dest
        if dest in ("help", "full_help"):
            continue
        consumed = f"args.{dest}" in src
        if dest in ALLOWED_NOOP:
            if consumed:
                stale_allow.append(dest)
            continue
        if not consumed:
            missing.append(dest)
    assert missing == [], f"flags parsed but never consumed: {missing}"
    assert stale_allow == [], \
        f"flags on the no-op allowlist that ARE consumed: {stale_allow}"


# ---------------------------------------------------------------- aa groups

def test_aa_groups_parsimony_matches_reference_literal():
    """The derived 51x51 parsimony table must equal the reference's
    hardcoded literal (model_factory.cpp:702-753)."""
    path = "/root/reference/src/utils/model_factory.cpp"
    if not os.path.exists(path):
        pytest.skip("reference not available")
    src = open(path).read()
    i0 = src.index("int table[] = {",
                   src.index("define_protein_alphabet_groups"))
    i1 = src.index("};", i0)
    vals = [int(x) for x in re.findall(r"-?\d+", src[i0 + 15:i1])]
    ref = np.array(vals).reshape(51, 51)
    a = alph.protein_groups_alphabet()
    assert (a.parsimony == ref).all()
    # child parsimony: parent-included-in-child refines, else child
    # stays (model_factory.cpp:757-785)
    G = [set(g) for g in alph.PROTEIN_GROUPS]
    for i, j in [(0, 44), (44, 0), (26, 40), (50, 50), (20, 2)]:
        want = ref[i, j] if G[i] <= G[j] else j
        assert a.child_parsimony[i, j] == want


def test_aa_groups_alphabet_properties():
    a = alph.protein_groups_alphabet()
    assert a.n_full == 51 and a.n_canon == 20
    assert (a.parsimony.T == a.parsimony).all()
    assert (a.parsimony[50, :] == np.arange(51)).all()
    assert list(a.n_units[:20]) == [1] * 20
    assert a.n_units[50] == 20


def test_aa_groups_progressive_alignment():
    """--use-aa-groups: a protein family aligns and ancestral states
    come from the 51-state group alphabet."""
    from pagan2_tpu.pipeline.progressive import align_progressive
    alph.set_protein_groups(True)
    try:
        entries = [FastaEntry("a", "MKLVINSTEW"),
                   FastaEntry("b", "MKLVLNSTEW"),  # I/L -> group 'IML'?
                   FastaEntry("c", "MKLVINSTEW")]
        res = align_progressive(entries, "((a:0.1,b:0.1):0.1,c:0.1);",
                                data_type=alph.PROTEIN)
        rows = {e.name: e.sequence for e in res.alignment}
        assert rows["a"] == "MKLVINSTEW"
        mf = ModelFactory(alph.PROTEIN)
        assert mf.alphabet.n_full == 51
    finally:
        alph.set_protein_groups(False)


def test_aa_groups_model_scores_groups():
    """Group states score as the max over member residues (times the
    ambiguity factor), like DNA IUPAC states."""
    alph.set_protein_groups(True)
    try:
        m = ModelFactory(alph.PROTEIN).alignment_model(0.3)
        a = alph.protein_groups_alphabet()
        gi = alph.PROTEIN_GROUPS.index("ML")
        mm = max(m.score[a.char_to_state["M"], a.char_to_state["M"]],
                 m.score[a.char_to_state["M"], a.char_to_state["L"]])
        assert m.score[a.char_to_state["M"], gi] == pytest.approx(mm)
    finally:
        alph.set_protein_groups(False)


# ----------------------------------------------------------- keep-all-edges

def test_keep_all_edges_applies_reads_settings(monkeypatch):
    """--keep-all-edges widens the skip limits for ordinary alignments
    (viterbi_alignment.cpp:206)."""
    from pagan2_tpu.align import align_pair, AlignSettings
    from pagan2_tpu.graph import build_leaf_graph
    calls = []
    orig = AlignSettings.for_reads

    def spy(self):
        calls.append(True)
        return orig(self)

    monkeypatch.setattr(AlignSettings, "for_reads", spy)
    mf = ModelFactory(alph.DNA)
    model = mf.alignment_model(0.3)
    g1 = build_leaf_graph("ACGTACGT", alph.DNA)
    g2 = build_leaf_graph("ACGTACGT", alph.DNA)
    align_pair(g1, g2, model, AlignSettings(), engine="oracle")
    assert not calls
    g1 = build_leaf_graph("ACGTACGT", alph.DNA)
    g2 = build_leaf_graph("ACGTACGT", alph.DNA)
    align_pair(g1, g2, model, AlignSettings(keep_all_edges=True),
               engine="oracle")
    assert calls


# ------------------------------------------------------ prune-keep-threshold

def test_prune_keep_threshold_drops_close_references():
    """--prune-keep-threshold: of two references closer than the
    threshold, the shorter is dropped; queries always stay
    (bppphysamp threshold deletion, bppphysamp_tree.cpp:161-168)."""
    from pagan2_tpu.pipeline.progressive import align_progressive
    from pagan2_tpu.pipeline.postprocess import prune_extended_alignment
    entries = [FastaEntry("a", "ACGTACGTGGACTTACGT"),
               FastaEntry("b", "ACGTACGGACTTAGGT"),
               FastaEntry("c", "ACGTATGTGGACTTACGA")]
    tree = "((a:0.01,b:0.01):0.3,c:0.3);"
    res = align_progressive(entries, tree, data_type=alph.DNA)
    ref = read_reference_alignment(
        [FastaEntry(e.name, e.sequence) for e in res.alignment],
        tree, data_type=alph.DNA)
    out = place_queries(ref, [FastaEntry("q", "ACGTACGTGGACTTACGT")],
                        alph.DNA, PlacementConfig(one_placement_only=True))
    assert out.placed
    outs = prune_extended_alignment(out.result.tree,
                                    out.result.alignment,
                                    keep_threshold=0.1)
    assert outs, "threshold pruning must produce an output"
    names = {e.name for e in outs[0][1]}
    # a and b are 0.02 apart -> one of them dropped, longer kept
    assert "q" in names
    assert "a" in names and "b" not in names
    assert "c" in names


# ------------------------------------------------------------- --fragments

def _scored_ref():
    entries = [FastaEntry("a", "ACGTACGTGGACTTACGTTGCA"),
               FastaEntry("b", "ACGTACGTGGACTTACGTTGCA")]
    tree = "(a:0.1,b:0.1);"
    return read_reference_alignment(entries, tree, data_type=alph.DNA)


def test_fragments_orders_queries_by_score():
    """--fragments: queries grouped per node are inserted in
    best-score-first order (sort_reads_vector,
    reads_aligner.cpp:443-468), not input order."""
    ref = _scored_ref()
    weak = FastaEntry("weak", "ACGTACGTGGACAAACGTTGCA")   # 3 mismatches
    strong = FastaEntry("strong", "ACGTACGTGGACTTACGTTGCA")  # exact
    cfg = PlacementConfig(fragments=True, one_placement_only=True,
                          min_query_overlap=0.4, min_query_identity=0.4)
    out = place_queries(ref, [weak, strong], alph.DNA, cfg)
    assert set(out.placed) == {"weak", "strong"}
    assert out.placed[0] == "strong", \
        "higher-scoring query must be inserted first"
    # without --fragments, input order rules
    ref2 = _scored_ref()
    out2 = place_queries(
        ref2, [weak, strong], alph.DNA,
        PlacementConfig(one_placement_only=True, min_query_overlap=0.4,
                        min_query_identity=0.4))
    assert out2.placed[0] == "weak"


def test_fragments_chains_queries_on_one_node():
    """Accepted queries on one node stack onto the merged node
    (current_root chaining, reads_aligner.cpp:483-620): all rows stay
    one alignment."""
    ref = _scored_ref()
    qs = [FastaEntry("q1", "ACGTACGTGGACTTACGTTGCA"),
          FastaEntry("q2", "ACGTACGTGGACTTACGTTGCA"),
          FastaEntry("q3", "ACGTACGTGGACTTACGTTGCA")]
    cfg = PlacementConfig(fragments=True, one_placement_only=True,
                          min_query_overlap=0.4, min_query_identity=0.4)
    out = place_queries(ref, qs, alph.DNA, cfg)
    assert len(out.placed) == 3
    rows = {e.name: e.sequence for e in out.result.alignment}
    assert len({len(s) for s in rows.values()}) == 1
    for q in ("q1", "q2", "q3"):
        assert rows[q].replace("-", "") == "ACGTACGTGGACTTACGTTGCA"


# ------------------------------------------------- --rank-reads-for-nodes

def test_rank_reads_for_nodes_scores_single_candidates():
    """With one candidate node, queries are normally assigned without
    scoring; --rank-reads-for-nodes scores them anyway so --fragments
    ordering reflects real node_scores (reads_aligner.cpp:2748)."""
    ref = _scored_ref()
    weak = FastaEntry("weak", "ACGTACGTGGACAAACGTTGCA")
    strong = FastaEntry("strong", "ACGTACGTGGACTTACGTTGCA")
    base = dict(fragments=True, assembly=True, one_placement_only=True,
                min_query_overlap=0.4, min_query_identity=0.4)
    out_plain = place_queries(_scored_ref(), [weak, strong], alph.DNA,
                              PlacementConfig(**base))
    # single candidate (assembly root), unscored -> input order
    assert out_plain.placed[0] == "weak"
    out_rank = place_queries(ref, [weak, strong], alph.DNA,
                             PlacementConfig(rank_reads_for_nodes=True,
                                             **base))
    assert out_rank.placed[0] == "strong"


# ------------------------------------------------------- --tid-for-subroot

def test_tid_for_subroot_moves_tag_up():
    """--tid-for-subroot: the spliced parent inherits the target's NHX
    TID tag (reads_aligner.cpp:858-862)."""
    entries = [FastaEntry(name="a", sequence="ACGTACGTAA"),
               FastaEntry(name="b", sequence="ACGTACGTAA"),
               FastaEntry(name="c", sequence="TTTTGGGGCC")]
    tree = "((a:0.1,b:0.1)[&&NHX:TID=1]:0.1,c:0.2);"
    res = read_reference_alignment(entries, tree, data_type=alph.DNA)
    queries = [FastaEntry(name="q1", sequence="ACGTACGTAA",
                          comment="TID=1")]
    cfg = PlacementConfig(guided=True, tid_for_subroot=True,
                          min_query_overlap=0.4, min_query_identity=0.4,
                          one_placement_only=True)
    out = place_queries(res, queries, alph.DNA, cfg)
    assert out.placed
    tagged = [n for n in out.result.tree.nodes_postorder()
              if n.nhx_tid == "1"]
    assert len(tagged) == 1
    t = tagged[0]
    assert not t.is_leaf and t.name.startswith("#")
    assert t.left.nhx_tid == "" and t.right.nhx_tid == ""


# ------------------------------------------------------- fast placement

def test_preselection_keeps_best_candidates():
    from pagan2_tpu.pipeline.placement import _preselect_candidates
    from pagan2_tpu.pipeline.progressive import align_progressive
    entries = [FastaEntry("a", "ACGTACGTGGACTTACGTACGT"),
               FastaEntry("b", "ACGTACGTGGACTTACGAACGT"),
               FastaEntry("c", "TTGCAGGCCATTGCAGGCCATT"),
               FastaEntry("d", "TTGCAGGCCATTGCAGGCCTTT")]
    tree = "((a:0.1,b:0.1):0.1,(c:0.1,d:0.1):0.1);"
    res = align_progressive(entries, tree, data_type=alph.DNA)
    nodes = {n.name: n for n in res.tree.nodes_postorder()}
    cand = [n for n in nodes if nodes[n].is_leaf]
    q = FastaEntry("q", "ACGTACGTGGACTTACGTACGT")
    kept = _preselect_candidates(q, cand, nodes, 2, k=8)
    assert set(kept) == {"a", "b"}
    # keep_best >= len(cand) is a no-op
    assert _preselect_candidates(q, cand, nodes, 10) == cand


def test_very_fast_placement_end_to_end():
    ref = _scored_ref()
    q = FastaEntry("q", "ACGTACGTGGACTTACGTTGCA")
    cfg = PlacementConfig(one_placement_only=True, preselect_keep_best=1,
                          min_query_overlap=0.4, min_query_identity=0.4)
    out = place_queries(ref, [q], alph.DNA, cfg)
    assert out.placed == ["q"]


# --------------------------------------------------------- --score-as-dna

def test_score_as_dna_places_translated_query():
    """--score-as-dna + --translate: candidate scoring runs on the
    original DNA (reads_aligner.cpp:2930-2942); the placement itself is
    still protein."""
    from pagan2_tpu.io.translate import translate_entries
    dna = {"a": "ATGAAACTGGTGATTAACTCG", "b": "ATGAAACTGGTGATTAACTCG",
           "q": "ATGAAACTGGTGATTAACTCG"}
    entries = [FastaEntry("a", dna["a"]), FastaEntry("b", dna["b"])]
    dna_map = translate_entries(entries)
    queries = [FastaEntry("q", dna["q"])]
    dna_map.update(translate_entries(queries))
    ref = read_reference_alignment(entries, "(a:0.1,b:0.1);",
                                   data_type=alph.PROTEIN)
    cfg = PlacementConfig(score_as_dna=True, terminal_nodes=True,
                          min_query_overlap=0.4, min_query_identity=0.4,
                          one_placement_only=True)
    out = place_queries(ref, queries, alph.PROTEIN, cfg, dna_map=dna_map)
    assert out.placed == ["q"]
    rows = {e.name: e.sequence for e in out.result.alignment}
    assert rows["q"].replace("-", "") == "MKLVINS"


def test_aa_groups_symbols_reingest():
    """Group-state symbols (lowercase letters / digits) written by an
    --use-aa-groups run survive re-ingestion: clean_sequence keeps
    them, build_leaf_graph maps them back to their group states, and
    unknown chars fall back to the real X wildcard (index 50, not the
    'NG' group at n_canon=20)."""
    from pagan2_tpu.io.fasta import clean_sequence
    from pagan2_tpu.graph import build_leaf_graph
    alph.set_protein_groups(True)
    try:
        a = alph.protein_groups_alphabet()
        c = clean_sequence("MKLs1X*", alph.PROTEIN)
        g = build_leaf_graph(c, alph.PROTEIN)
        states = [int(g.states[i]) for i in range(1, g.num_sites() - 1)]
        want = [a.char_to_state[ch] for ch in "MKLs1X"] + [50]
        assert states == want
    finally:
        alph.set_protein_groups(False)
    # plain protein still case-folds lowercase input
    g = build_leaf_graph(clean_sequence("mkl", alph.PROTEIN),
                         alph.PROTEIN)
    assert [int(g.states[i]) for i in range(1, g.num_sites() - 1)] == \
        [12, 11, 10]


def test_grp_roundtrip_preserves_group_states():
    """.grp checkpoint round-trip under --use-aa-groups keeps the
    case-significant group symbols (the old reader uppercased 'b' to
    'B' -> unknown -> wrong fallback state)."""
    from pagan2_tpu.io.writers import write_graph_file, read_graph_file
    from pagan2_tpu.graph import build_leaf_graph
    alph.set_protein_groups(True)
    try:
        g = build_leaf_graph("MKbs1X", alph.PROTEIN)
        text = write_graph_file(g)
        g2 = read_graph_file(text, data_type=alph.PROTEIN, is_text=True)
        assert [int(g.states[i]) for i in range(g.num_sites())] == \
            [int(g2.states[i]) for i in range(g2.num_sites())]
    finally:
        alph.set_protein_groups(False)


def test_xml_escapes_names():
    from pagan2_tpu.io.writers import write_xml
    from pagan2_tpu.tree.newick import parse_newick
    import xml.dom.minidom as minidom
    tree = parse_newick("(a:0.1,b:0.1);")
    entries = [FastaEntry("a", "ACGT"), FastaEntry("b", "ACG-")]
    entries[0].name = "a&<weird>"
    tree.leaves().__iter__()  # no-op; names in tree stay plain
    text = write_xml(tree, entries)
    minidom.parseString(text)   # must be well-formed XML
