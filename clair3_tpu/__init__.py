"""clair3_tpu — a TPU-native germline small-variant caller.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of HKU-BAL/Clair3
(reference layout surveyed in SURVEY.md).  Two-stage cascade:

  1. pileup network  (BiLSTM over [33, 18] summarized-alignment tensors)
  2. full-alignment network (ResNet over [depth, 33, 8|9] per-read tensors)

The compute path is jit-compiled JAX sharded over a `jax.sharding.Mesh`;
feature extraction runs on the TPU-VM host (numpy reference implementation in
`clair3_tpu.pileup` / `clair3_tpu.fullalign`, C++ fast path in
`clair3_tpu/native`).
"""

__version__ = "0.3.0"
