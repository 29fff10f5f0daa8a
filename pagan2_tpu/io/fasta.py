"""Sequence I/O: FASTA / FASTQ readers and FASTA / phylip / nexus / paml
/ raxml writers (equivalent of Fasta_reader, src/utils/fasta_reader.cpp).
"""
from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class FastaEntry:
    name: str
    sequence: str = ""
    comment: str = ""
    quality: str = ""
    num_duplicates: int = 1
    dna_sequence: str = ""
    edges: list = field(default_factory=list)  # .grp graph rows


def read_fasta(path_or_text, is_text=False) -> list[FastaEntry]:
    text = path_or_text if is_text else open(path_or_text).read()
    entries: list[FastaEntry] = []
    cur = None
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        if line.startswith(">"):
            head = line[1:].strip()
            parts = head.split(None, 1)
            cur = FastaEntry(name=parts[0],
                             comment=parts[1] if len(parts) > 1 else "")
            entries.append(cur)
        elif cur is not None:
            cur.sequence += line.replace(" ", "")
    return entries


def read_fastq(path_or_text, is_text=False) -> list[FastaEntry]:
    text = path_or_text if is_text else open(path_or_text).read()
    lines = [l.strip() for l in text.splitlines() if l.strip()]
    entries = []
    i = 0
    while i + 3 < len(lines) or (i + 1 < len(lines) and lines[i].startswith("@")):
        if not lines[i].startswith("@"):
            i += 1
            continue
        head = lines[i][1:].split(None, 1)
        seq = lines[i + 1]
        qual = lines[i + 3] if i + 3 < len(lines) else ""
        entries.append(FastaEntry(name=head[0],
                                  comment=head[1] if len(head) > 1 else "",
                                  sequence=seq, quality=qual))
        i += 4
    return entries


def read_sequences(path) -> list[FastaEntry]:
    """Sniff fasta vs fastq by first character."""
    with open(path) as f:
        first = f.read(1)
    if first == "@":
        return read_fastq(path)
    return read_fasta(path)


def guess_data_type(entries: list[FastaEntry]) -> str:
    """>90%% ACGTUN- -> dna (fasta_reader.cpp:1303-1335)."""
    dna_chars = set("ACGTUN-acgtun.")
    total = 0
    dna = 0
    for e in entries:
        for ch in e.sequence:
            total += 1
            if ch in dna_chars:
                dna += 1
    if total == 0 or dna / total > 0.9:
        return "dna"
    return "protein"


def empirical_dna_frequencies(entries: list[FastaEntry]):
    """Empirical base frequencies (+1 pseudocount behaviour kept simple)."""
    import numpy as np
    counts = np.ones(4, dtype=np.float64)
    idx = {"A": 0, "C": 1, "G": 2, "T": 3, "U": 3}
    for e in entries:
        for ch in e.sequence.upper():
            if ch in idx:
                counts[idx[ch]] += 1
    return counts / counts.sum()


def clean_sequence(seq: str, data_type: str) -> str:
    """Map unsupported characters to N/X and uppercase
    (Fasta_reader alphabet cleanup)."""
    seq = seq.replace("-", "").replace(".", "")
    if data_type in ("dna", "codon"):
        # codon input is DNA text: same cleanup (U->T, IUPAC kept)
        seq = seq.upper()
        # '0' is the pair-end read joint marker: the graph builders skip
        # it (sequence.cpp:173,390), so it must survive cleanup
        ok = set("ACGTRYMKWSBDHVN0")
        return "".join(ch if ch in ok else ("T" if ch == "U" else "N")
                       for ch in seq)
    ok = set("ARNDCQEGHILKMFPSTWYVX")
    if data_type == "protein":
        from ..models import alphabets as _alph
        if _alph.protein_groups_active():
            # --use-aa-groups: the 31 group states print as lowercase
            # letters/digits (model_factory.cpp:673); keep them intact
            # on re-ingestion instead of uppercasing to X
            grp = set(_alph.PROTEIN_GROUP_CHARS)
            return "".join(
                ch if ch in grp else
                (ch.upper() if ch.upper() in ok else "X")
                for ch in seq)
    seq = seq.upper()
    return "".join(ch if ch in ok else "X" for ch in seq)


# ---------------------------------------------------------------------
def write_fasta(entries, path=None, width: int = 60) -> str:
    out = []
    for e in entries:
        head = f">{e.name}"
        if e.comment:
            head += f" {e.comment}"
        out.append(head)
        for i in range(0, len(e.sequence), width):
            out.append(e.sequence[i:i + width])
    text = "\n".join(out) + "\n"
    if path:
        with open(path, "w") as f:
            f.write(text)
    return text


def write_phylip(entries, path=None, interleaved: bool = False) -> str:
    n = len(entries)
    l = len(entries[0].sequence) if entries else 0
    out = [f" {n} {l}"]
    if interleaved:
        width = 60
        names_done = False
        for start in range(0, l, width):
            for e in entries:
                prefix = (e.name[:9].ljust(10) if not names_done else "")
                out.append(prefix + e.sequence[start:start + width])
            names_done = True
            out.append("")
    else:
        for e in entries:
            out.append(e.name[:9].ljust(10) + e.sequence)
    text = "\n".join(out) + "\n"
    if path:
        with open(path, "w") as f:
            f.write(text)
    return text


def write_nexus(entries, path=None, data_type: str = "dna") -> str:
    n = len(entries)
    l = len(entries[0].sequence) if entries else 0
    dt = "dna" if data_type == "dna" else "protein"
    out = ["#NEXUS", "begin data;",
           f"dimensions ntax={n} nchar={l};",
           f"format datatype={dt} interleave=no gap=-;",
           "matrix"]
    for e in entries:
        out.append(f"{e.name}  {e.sequence}")
    out += [";", "end;"]
    text = "\n".join(out) + "\n"
    if path:
        with open(path, "w") as f:
            f.write(text)
    return text


def write_raxml(entries, path=None) -> str:
    return write_phylip(entries, path, interleaved=False)


def write_paml(entries, path=None) -> str:
    n = len(entries)
    l = len(entries[0].sequence) if entries else 0
    out = [f" {n} {l}"]
    for e in entries:
        out.append(e.name)
        out.append(e.sequence)
    text = "\n".join(out) + "\n"
    if path:
        with open(path, "w") as f:
            f.write(text)
    return text
