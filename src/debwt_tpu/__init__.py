"""debwt_tpu — a TPU-native BWT construction engine.

A from-scratch reimplementation of the capabilities of deBWT (Liu, Zhu et
al., Bioinformatics 2016; reference C implementation at
github.com/DixianZhu/deBWT): construction of the Burrows-Wheeler
Transform of a large DNA sequence collection using the de Bruijn
branch-encode decomposition — re-architected for TPUs on top of
JAX/XLA/Pallas instead of pthreads + out-of-core temp files.

Semantics (proven equivalent to the reference binary's output, see
tests/oracle): the output is the BWT of the text

    r_0 # r_1 # ... # r_{n-1} $

under plain lexicographic suffix order over the 6-letter alphabet
A < C < G < T < # < $, where all '#' compare equal (comparison continues
across read boundaries) and '$' is the unique maximum. Separators are
emitted as 'T' dimers in the packed output, with sidecar files `<obj>.#`
and `<obj>.$` recording their BWT positions (reference:
src/insertCase3.c:84-131).

Pipeline layers (each maps a reference stage to a TPU-native design):

  io.fasta     FASTA/FASTQ ingest + N-policy     (collect#$.c pass 1/2, transferN.c)
  pack         2-bit packing, window key extraction
  count        on-device (k+1)-mer counting API   (kmercounting.sh + mySort.c)
  special      separator-window module (host)     (collect#$.c seeKMER/divideKmer)
  engine       fused one-sort classification + SP + blue + merge
               (getKmer.c + INandOut.c mergeKmer + generateSP.c +
                sortBlue.c + insertCase3.c, collapsed into two programs)
  grouped      device-resident grouped tier, bounded HBM at any N < 2^31.8
  bluesort     SP suffix ranks via prefix-tripling (sortBlue.c cmpSP/myQsort)
  verify       LF-mapping invertibility check     (LFsearch.c)
  parallel     multi-chip sharding (mesh/pjit/shard_map) — no reference analogue
  oocore       out-of-core chunked tier (host/disk spill + resume)
"""

from debwt_tpu.types import PipelineConfig, SequenceCollection

__version__ = "0.1.0"

__all__ = [
    "PipelineConfig",
    "SequenceCollection",
    "build",
    "build_bwt",
    "BwtResult",
    "count_kmers",
    "read_kmer_dump",
    "__version__",
]


def __getattr__(name):
    # build/build_bwt/BwtResult import jax (and may touch the XLA
    # backend); keep the package import side-effect free so that
    # multi-host launchers can run jax.distributed.initialize first.
    if name in ("build_bwt", "BwtResult"):
        from debwt_tpu import pipeline

        return getattr(pipeline, name)
    if name == "build":
        from debwt_tpu import api

        return api.build
    if name in ("count_kmers", "read_kmer_dump"):
        from debwt_tpu import count

        return getattr(count, name)
    raise AttributeError(name)
