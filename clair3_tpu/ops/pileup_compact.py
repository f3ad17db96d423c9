"""Compact host->device transfer form for pileup count tensors.

The pileup tensor [N, 33, 18] is strand-split base/indel COUNTS
(reference layout: src/clair3_pileup.c:142-476) with exactly one quirk:
the two reference-base channels per column are overwritten with the
NEGATED strand sums (clair3_pileup.c:370-371).  Counts are bounded by
1.5x max_depth (the engine rescales anything higher,
pipeline/engine.py:rescale_high_coverage_pileup), i.e. <= 216 for the
default max_depth 144 — so the whole tensor is losslessly

* ``mags``   uint8 [N, 33, 18] — absolute values,
* ``negidx`` int8  [N, 33]     — base index (0..3) whose fwd/rev channel
  pair (j, j+9) is negated, or _NO_NEG where the column has no negative
  entry (uncovered, or zero strand sums),

halving the shipped bytes vs the int16 wire form (1188 -> 627 B/cand).
``pack_pileup`` VERIFIES by rebuilding and comparing, returning None on
any mismatch (values > 255, unexpected negative pattern) so the engine
falls back to the full tensor and the fast path can never change results;
``unpack_pileup_jax`` rebuilds the exact int16 tensor inside jit.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

_NO_NEG = 18  # out-of-range channel: matches nothing during reconstruction


def pack_pileup(matrix: np.ndarray) -> Optional[Dict[str, np.ndarray]]:
    """Decompose [N, 33, 18] integer counts; None if values exceed uint8
    or the negation pattern is not the ref-channel-pair structure.  A
    single-pass native C packer (clair3t_pack.cc) serves production; this
    numpy body is its differential oracle (tests/test_native_pack.py)."""
    if matrix.ndim != 3 or matrix.shape[2] != 18:
        return None
    import os

    if (matrix.shape[1] == 33 and matrix.dtype in (np.int16, np.int32)
            and matrix.flags.c_contiguous
            and not os.environ.get("CLAIR3T_VERIFY_PACK")):
        from clair3_tpu.native import pack_native_available, pileup_pack_native

        if pack_native_available():
            # rc != 0 <=> the rebuild-and-compare below would fail too
            return pileup_pack_native(matrix)
    m = matrix
    a = np.abs(m)
    if m.size and int(a.max()) > 255:
        return None
    neg = m < 0
    has = neg.any(axis=2)
    negidx = np.where(has, neg.argmax(axis=2) % 9, _NO_NEG).astype(np.int8)
    mags = a.astype(np.uint8)
    packed = {"mags": mags, "negidx": negidx}
    if not (unpack_pileup_numpy(packed) == m).all():
        return None
    return packed


def _unpack(xp, mags, negidx):
    """Shared numpy/jax reconstruction: returns [N, 33, 18] int16."""
    ch = xp.arange(18, dtype=xp.int8)[None, None, :]
    idx = negidx[..., None]
    neg = (ch == idx) | (ch == idx + 9)
    vals = mags.astype(xp.int16)
    return xp.where(neg, -vals, vals)


def unpack_pileup_numpy(packed: Dict[str, np.ndarray]) -> np.ndarray:
    return _unpack(np, packed["mags"], packed["negidx"])


def unpack_pileup_jax(mags, negidx):
    """Reconstruction inside jit; all integer ops, bit-exact."""
    import jax.numpy as jnp

    return _unpack(jnp, mags, negidx)
