"""priblast_tpu — a TPU-native engine for comprehensive lncRNA-RNA
interaction prediction.

A from-scratch reimplementation of the capabilities of pRIblast (UDC-GAC,
itself a parallel re-engineering of RIblast) designed for TPU hardware:
the accessibility partition-function DP and the extension DPs run as batched
JAX/Pallas computations, the suffix-array index and seed search run as
vectorized host code, and multi-chip scaling uses jax.sharding meshes
instead of MPI.

Two pipelines, mirroring the reference CLI (reference: src/main.cpp:148-175):

- ``db``  — build a database from a FASTA transcriptome: per-sequence
  accessibility (McCaskill-style inside/outside DP restricted to span W),
  suffix-array index + k-mer hash, paginated into chunks.
- ``ris`` — search query lncRNAs against the database: seed search,
  ungapped extension, gapped extension, redundancy removal, CSV output.

The on-disk database format is byte-compatible with the reference's
``.bas/.seq/.ind/.acc/.nam`` files.
"""

__version__ = "0.1.0"
