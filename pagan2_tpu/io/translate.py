"""DNA <-> protein translation for `--translate` / `--mt-translate`.

The reference translates DNA input to protein on read when any of
--translate/--mt-translate/--find-orfs is set (fasta_reader.cpp:239-263),
aligns at the protein level, and back-translates the aligned rows to a
`.codon` output using each sequence's original ungapped DNA
(fasta_reader.cpp:761-840 backtranslate_dna, :1425-1470 protein_to_DNA).
Unknown/ambiguous codons become X in the protein and NNN in the stored
DNA. Ancestor rows (no source DNA) get a mock codon per residue.
"""
from __future__ import annotations

from .fasta import FastaEntry

_BASES = "TCAG"
# standard genetic code, codon index = 16*t1 + 4*t2 + t3 over TCAG order
_STANDARD = (
    "FFLLSSSSYY**CC*W"
    "LLLLPPPPHHQQRRRR"
    "IIIMTTTTNNKKSSRR"
    "VVVVAAAADDEEGGGG")
# vertebrate mitochondrial code: AGA/AGG Arg->stop, ATA Ile->Met,
# TGA stop->Trp
_MITO = (
    "FFLLSSSSYY**CCWW"
    "LLLLPPPPHHQQRRRR"
    "IIMMTTTTNNKKSS**"
    "VVVVAAAADDEEGGGG")


def _code_table(mt: bool) -> dict:
    table = {}
    code = _MITO if mt else _STANDARD
    i = 0
    for b1 in _BASES:
        for b2 in _BASES:
            for b3 in _BASES:
                table[b1 + b2 + b3] = code[i]
                i += 1
    return table


def _mock_codons(mt: bool) -> dict:
    """One representative codon per amino acid (first in TCAG codon
    order), used for ancestor rows in back-translated output."""
    rep = {}
    for codon, aa in _code_table(mt).items():
        rep.setdefault(aa, codon)
    rep["X"] = "NNN"
    rep["-"] = "---"
    return rep


def codon_to_amino(codon: str, mt: bool = False) -> str:
    """Single-codon translation (Codon_translation::codon_to_amino);
    unknown/ambiguous codons give 'X'."""
    return _code_table(mt).get(rna_to_dna(codon), "X")


def rna_to_dna(seq: str) -> str:
    return seq.upper().replace("U", "T")


def dna_to_protein(seq: str, mt: bool = False) -> tuple[str, str]:
    """Translate a DNA sequence. Returns (protein, dna) where dna has
    unknown codons replaced by NNN (fasta_reader.cpp:1394-1412).
    A full gap codon '---' translates to '-' like the reference's table
    entry (fasta_reader.cpp:1361,1369) so gapped reference-alignment
    rows keep their gap structure. A trailing partial codon is
    dropped."""
    table = _code_table(mt)
    dna = rna_to_dna(seq)
    prot = []
    fixed = []
    for j in range(0, len(dna) - len(dna) % 3, 3):
        codon = dna[j:j + 3]
        if codon == "---":
            # gap codon: translate to '-' but keep the stored DNA
            # ungapped (protein_to_dna consumes one codon per residue
            # and emits '---' for every protein gap itself)
            prot.append("-")
            continue
        aa = table.get(codon)
        if aa is None or aa == "*":
            # stop codons translate to X like unknowns: the reference's
            # table maps them to "X" (fasta_reader.cpp:1340-1368)
            prot.append("X")
            fixed.append(codon if aa == "*" else "NNN")
        else:
            prot.append(aa)
            fixed.append(codon)
    return "".join(prot), "".join(fixed)


def translate_entries(entries: list[FastaEntry], mt: bool = False
                      ) -> dict[str, str]:
    """In-place translate DNA entries to protein; returns a map
    name -> original (codon-fixed, ungapped) DNA for back-translation."""
    dna_map = {}
    for e in entries:
        prot, dna = dna_to_protein(e.sequence, mt)
        e.sequence = prot
        dna_map[e.name] = dna
    return dna_map


def protein_to_dna(dna: str, prot: str) -> str:
    """Back-translate one aligned protein row using its ungapped DNA:
    each residue consumes the next codon, gaps emit '---'."""
    out = []
    pos = 0
    for aa in prot:
        if aa == "-":
            out.append("---")
        else:
            out.append(dna[pos:pos + 3])
            pos += 3
    return "".join(out)


def backtranslate_entries(aligned: list[FastaEntry], dna_map: dict,
                          include_mock_ancestors: bool = False,
                          mt: bool = False) -> list[FastaEntry]:
    """backtranslate_dna (fasta_reader.cpp:761-840): map every aligned
    protein row back to codons; rows without source DNA (ancestors) get
    mock codons when requested, otherwise abort with an empty list."""
    mock = _mock_codons(mt)
    out = []
    for e in aligned:
        dna = dna_map.get(e.name)
        if dna is None:
            if not include_mock_ancestors:
                from ..utils import log_out
                log_out("No matching DNA sequence for %s. "
                        "Back-translation failed.\n" % e.name, 1)
                return []
            seq = "".join(mock.get(aa, "NNN") for aa in e.sequence)
        else:
            seq = protein_to_dna(dna, e.sequence)
        out.append(FastaEntry(name=e.name, comment=e.comment, sequence=seq))
    return out
