from debwt_tpu.io.fasta import read_fasta, NPolicy
from debwt_tpu.io.writer import write_bwt, read_bwt

__all__ = ["read_fasta", "NPolicy", "write_bwt", "read_bwt"]
