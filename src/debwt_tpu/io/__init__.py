from debwt_tpu.io.fasta import read_fasta, read_collection, NPolicy
from debwt_tpu.io.writer import write_bwt, read_bwt

__all__ = ["read_fasta", "read_collection", "NPolicy",
           "write_bwt", "read_bwt"]
