from .fasta import (FastaEntry, read_fasta, read_fastq, read_sequences,
                    write_fasta, write_phylip, write_nexus, write_paml,
                    guess_data_type, clean_sequence)
