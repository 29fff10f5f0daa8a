"""ORF search + translated pileup/placement tests."""
import numpy as np
import pytest

from pagan2_tpu.pipeline.orfs import find_orfs
from pagan2_tpu.io.fasta import FastaEntry


def _orf_dna(prot: str, mt=False) -> str:
    """DNA encoding of a protein (one codon per aa)."""
    from pagan2_tpu.io.translate import _mock_codons
    rep = _mock_codons(mt)
    return "".join(rep[a] for a in prot)


def test_find_orfs_simple():
    prot = "MKLVINGGGHHEELLKKVVMMAA"
    dna = _orf_dna(prot)
    orfs = find_orfs(dna, min_orf_length=10)
    f1 = [o for o in orfs if o.frame == 1]
    assert f1 and f1[0].translation == prot
    assert f1[0].start == 0
    assert f1[0].end == len(dna) - 1


def test_find_orfs_stop_splits():
    protA = "MKLVINGGGHHEELL"
    protB = "KKVVMMAAHHEELLG"
    dna = _orf_dna(protA) + "TAA" + _orf_dna(protB)
    orfs = [o for o in orfs_f1(dna, 10)]
    assert len(orfs) == 2
    assert orfs[0].translation == protA
    assert orfs[1].translation == protB
    # coordinates: second fragment starts after the stop codon
    assert orfs[1].start == len(protA) * 3 + 3


def orfs_f1(dna, minlen):
    return [o for o in find_orfs(dna, min_orf_length=minlen)
            if o.frame == 1]


def test_find_orfs_reverse_strand():
    from pagan2_tpu.graph.builders import revcomp
    prot = "MKLVINGGGHHEELL"
    dna = revcomp(_orf_dna(prot))
    orfs = [o for o in find_orfs(dna, min_orf_length=10) if o.frame < 0]
    assert any(o.translation == prot for o in orfs)
    o = next(o for o in orfs if o.translation == prot)
    assert o.frame == -1
    assert o.start == 0 and o.end == len(dna) - 1


def test_find_orfs_min_length():
    dna = _orf_dna("MKLVI")
    assert find_orfs(dna, min_orf_length=10) == []


def test_find_orfs_min_coverage():
    prot = "MKLVINGGGHHEELLKKVV"
    dna = _orf_dna(prot)
    # coverage 1.0 -> needs the full length
    orfs = find_orfs(dna, min_orf_coverage=0.9)
    assert any(o.translation == prot for o in orfs)


def test_translated_pileup():
    from pagan2_tpu.pipeline.pileup import (translated_pileup_align,
                                            PileupConfig)
    core = "MKLVINGGGHHEELLKKVVMMAAWWQQRRDDEE"
    reads = [
        FastaEntry(name="r1", sequence=_orf_dna(core)),
        FastaEntry(name="r2", sequence=_orf_dna(core[5:25])),
        FastaEntry(name="r3", sequence="TTTTTTTTTTTT"),  # no ORF >= min
    ]
    cfg = PileupConfig(min_query_overlap=0.3, min_query_identity=0.3)
    res = translated_pileup_align(reads, cfg, min_orf_length=10)
    names = [e.name for e in res.alignment]
    assert "r1" in names
    assert "r2_orf1" in names
    assert "r3" in res.discarded
    # alignment is protein
    row = dict((e.name, e.sequence) for e in res.alignment)["r1"]
    assert set(row) <= set("ARNDCQEGHILKMFPSTWYVX-")


def test_translated_placement():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from pagan2_tpu.pipeline.refread import read_reference_alignment
    from pagan2_tpu.pipeline.placement import place_queries, PlacementConfig
    from pagan2_tpu.models import ModelFactory, alphabets as alph

    protA = "MKLVINGGGHHEELLKKVV"
    protB = "MKLVINGGGHHEELLKKIV"
    entries = [FastaEntry(name="A", sequence=protA),
               FastaEntry(name="B", sequence=protB)]
    res = read_reference_alignment(entries, "(A:0.1,B:0.1);",
                                   data_type=alph.PROTEIN)
    q = FastaEntry(name="q1", sequence=_orf_dna(protA[2:15]))
    cfg = PlacementConfig(find_orfs=True, min_orf_length=10,
                          min_query_overlap=0.2, min_query_identity=0.2,
                          all_nodes=True, one_placement_only=True)
    out = place_queries(res, [q], alph.PROTEIN, cfg,
                        model_factory=ModelFactory(alph.PROTEIN))
    assert out.placed == ["q1_orf1"]
    names = [e.name for e in out.result.alignment]
    assert "q1_orf1" in names


def test_translated_placement_fragments():
    """--fragments + --find-orfs: translated_query_placement_all
    (reads_aligner.cpp:1353-1436) — queries grouped per node, each
    placed via its best ORF's translation."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from pagan2_tpu.pipeline.refread import read_reference_alignment
    from pagan2_tpu.pipeline.placement import (place_queries,
                                               PlacementConfig)
    from pagan2_tpu.models import ModelFactory, alphabets as alph

    protA = "MKLVINGGGHHEELLKKVV"
    protB = "MKLVINGGGHHEELLKKIV"
    entries = [FastaEntry(name="A", sequence=protA),
               FastaEntry(name="B", sequence=protB)]
    res = read_reference_alignment(entries, "(A:0.1,B:0.1);",
                                   data_type=alph.PROTEIN)
    qs = [FastaEntry(name="q1", sequence=_orf_dna(protA[2:15])),
          FastaEntry(name="q2", sequence=_orf_dna(protA[1:16]))]
    cfg = PlacementConfig(find_orfs=True, fragments=True,
                          min_orf_length=10,
                          min_query_overlap=0.2, min_query_identity=0.2,
                          all_nodes=True, one_placement_only=True)
    out = place_queries(res, qs, alph.PROTEIN, cfg,
                        model_factory=ModelFactory(alph.PROTEIN))
    assert sorted(out.placed) == ["q1_orf1", "q2_orf1"]
    rows = {e.name: e.sequence for e in out.result.alignment}
    assert len({len(s) for s in rows.values()}) == 1
