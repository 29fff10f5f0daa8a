"""--translate: DNA->protein on read, protein alignment, back-translated
.codon output (fasta_reader.cpp:239-263, 761-840, 1425-1470)."""
import os

import pytest

from pagan2_tpu.io.fasta import FastaEntry, read_fasta
from pagan2_tpu.io.translate import (dna_to_protein, protein_to_dna,
                                     translate_entries,
                                     backtranslate_entries)
from pagan2_tpu.cli import main as cli_main


def test_dna_to_protein_standard():
    prot, dna = dna_to_protein("ATGGCTTTTAAA")
    assert prot == "MAFK"
    assert dna == "ATGGCTTTTAAA"


def test_stop_and_unknown_codons():
    # TAA stop -> X (kept in DNA); ambiguous NNA -> X with DNA fixed to NNN
    prot, dna = dna_to_protein("ATGTAANNAGGG")
    assert prot == "MXXG"
    assert dna == "ATGTAANNNGGG"


def test_mt_differences():
    # ATA: Ile -> Met, TGA: stop -> Trp, AGA: Arg -> stop(X) in mito
    assert dna_to_protein("ATATGAAGA")[0] == "IXR"
    assert dna_to_protein("ATATGAAGA", mt=True)[0] == "MWX"


def test_trailing_partial_codon_dropped():
    prot, dna = dna_to_protein("ATGGC")
    assert prot == "M"
    assert dna == "ATG"


def test_backtranslate_roundtrip():
    entries = [FastaEntry(name="a", sequence="ATGGCTTTT"),
               FastaEntry(name="b", sequence="ATGTTT")]
    dna_map = translate_entries(entries)
    assert entries[0].sequence == "MAF"
    # simulate an alignment with a gap in b
    aligned = [FastaEntry(name="a", sequence="MAF"),
               FastaEntry(name="b", sequence="M-F")]
    out = backtranslate_entries(aligned, dna_map)
    assert out[0].sequence == "ATGGCTTTT"
    assert out[1].sequence == "ATG---TTT"


def test_protein_to_dna_gap_handling():
    assert protein_to_dna("AAATTT", "K-F") == "AAA---TTT"


def test_cli_translate_end_to_end(tmp_path):
    # two CDSs differing by one synonymous + one non-syn substitution
    d1 = "ATGGCTAAATTTGGGCATCCGTTA"
    d2 = "ATGGCGAAATTTGGGTATCCGTTA"
    seqs = tmp_path / "cds.fas"
    seqs.write_text(">s1\n%s\n>s2\n%s\n" % (d1, d2))
    tree = tmp_path / "t.nh"
    tree.write_text("(s1:0.1,s2:0.1);\n")
    out = tmp_path / "out"
    rc = cli_main(["-s", str(seqs), "-t", str(tree), "-o", str(out),
                   "--translate", "--silent"])
    assert rc == 0
    prot = {e.name: e.sequence for e in read_fasta(str(out) + ".fas")}
    assert prot["s1"] == "MAKFGHPL"
    assert prot["s2"] == "MAKFGYPL"
    codon = {e.name: e.sequence
             for e in read_fasta(str(out) + ".codon.fas")}
    assert codon["s1"] == d1
    assert codon["s2"] == d2


def test_cli_translate_rejects_protein(tmp_path):
    seqs = tmp_path / "prot.fas"
    seqs.write_text(">p1\nMAKF\n>p2\nMAKY\n")
    tree = tmp_path / "t.nh"
    tree.write_text("(p1:0.1,p2:0.1);\n")
    with pytest.raises(SystemExit):
        cli_main(["-s", str(seqs), "-t", str(tree), "--translate",
                  "-o", str(tmp_path / "o"), "--silent"])


def test_config_file_replay(tmp_path):
    """--config-file ini replay + --config-log-file round-trip
    (settings.cpp:304-331, 446-510)."""
    seqs = tmp_path / "p.fas"
    seqs.write_text(">s1\nACGTACGTAAGG\n>s2\nACGTACGAAAGG\n")
    tree = tmp_path / "t.nh"
    tree.write_text("(s1:0.1,s2:0.1);\n")
    cfg = tmp_path / "run.cfg"
    cfg.write_text("seqfile = %s\ntreefile = %s\n"
                   "outfile = %s\nsilent = 1\n"
                   % (seqs, tree, tmp_path / "o1"))
    rc = cli_main([str(cfg), "--config-log-file",
                   str(tmp_path / "log.cfg")])
    assert rc == 0
    assert (tmp_path / "o1.fas").exists()
    # command line must win over the config file
    rc = cli_main([str(cfg), "-o", str(tmp_path / "o2")])
    assert rc == 0
    assert (tmp_path / "o2.fas").exists()
    # the log must be replayable
    rc = cli_main(["--config-file", str(tmp_path / "log.cfg"),
                   "-o", str(tmp_path / "o3")])
    assert rc == 0
    assert (tmp_path / "o3.fas").exists()
    assert (tmp_path / "o3.fas").read_text() == \
        (tmp_path / "o1.fas").read_text()
