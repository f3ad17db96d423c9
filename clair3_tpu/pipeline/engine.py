"""Batched, mesh-sharded inference engine.

Replaces the reference's CallVariantsFromCffi / CallVariantsFromCffiGPU
split (process fan-out + file-sharded multi-GPU scheduling + shared-memory
decode) with a single jit-compiled forward pass:

* candidate tensors stream in from the host extractors,
* batches are padded to a small set of static bucket sizes (so XLA compiles
  a handful of programs, not one per batch shape),
* each batch is sharded over the mesh data axis and run under jit,
* probabilities return to host for the CPU decode pool.

The pileup high-coverage rescale (tensor // (depth/max_depth) when depth >
1.5x max_depth, integer-truncated like the reference's in-place numpy
assignment, CallVariantsFromCffi.py:278-285) happens here on the host.
"""

from __future__ import annotations

import os
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from clair3_tpu.parallel.mesh import batch_sharding, get_mesh, replicated_sharding

_DEFAULT_BUCKETS = (256, 1024, 2048, 4096)


def _pad_to_bucket(packed: dict, m: int, bucket: int) -> dict:
    """Zero-pad every plane of a packed wire-form dict from m to bucket
    rows (static batch shapes for jit)."""
    if m >= bucket:
        return packed
    return {k: np.concatenate(
        [v, np.zeros((bucket - m,) + v.shape[1:], v.dtype)])
        for k, v in packed.items()}


class InferenceEngine:
    """Jit-compiled, data-sharded batch forward for one model.

    ``transfer_dtype`` narrows the host->device copy: pileup count tensors
    are int32 on the host but bounded by ~1.5x max_depth after the
    high-coverage rescale, so shipping them as int16 halves the DMA/PCIe
    bytes; the jit program widens to the model's compute dtype on device.
    """

    def __init__(
        self,
        model,
        variables,
        mesh=None,
        buckets: Sequence[int] = _DEFAULT_BUCKETS,
        transfer_dtype=None,
        depth_crop: bool = False,
        fa_compact: bool = False,
        pileup_compact: bool = False,
    ):
        self.model = model
        self.mesh = mesh if mesh is not None else get_mesh()
        self.transfer_dtype = transfer_dtype
        # fa_compact ships full-alignment batches as their lossless
        # decomposition (per-cell channels + coverage bitmask + per-read
        # scalars + ref column, ops/fa_compact.py) — ~2.4x fewer bytes on
        # the wire; the jit program rebuilds the exact int8 tensor before
        # the forward.  pack_fa verifies exactness and falls back to the
        # full tensor on any violation.
        self.fa_compact = fa_compact
        # pileup_compact is the pileup-tensor analogue (ops/pileup_compact):
        # abs counts as uint8 + the negated ref-channel index per column —
        # halves the int16 wire form; rebuilt bit-exact inside jit, with
        # the same verify-or-fallback contract.
        self.pileup_compact = pileup_compact
        # Full-alignment tensors are CENTER-padded along the depth axis
        # (reference: sort_read_name_by_haplotype center-pad,
        # clair3_full_alignment_dwell.c:117-156), so at 30x coverage with
        # matrix_depth 89 most depth rows are zeros.  depth_crop ships only
        # the centered band and zero-pads back INSIDE the jit program —
        # bit-exact reconstruction, ~2x fewer host->device bytes.
        self.depth_crop = depth_crop
        # observability: actual bytes handed to device_put (post pack/pad),
        # accumulated on the submitter thread; bench.py reports it
        self.bytes_shipped = 0
        n_dev = self.mesh.devices.size
        # bucket sizes must divide evenly across the mesh
        self.buckets = tuple(sorted(max(b, n_dev) - (max(b, n_dev) % n_dev) or n_dev
                                    for b in buckets))
        self._in_sharding = batch_sharding(self.mesh)
        self._rep = replicated_sharding(self.mesh)
        self.variables = jax.device_put(variables, self._rep)

        @partial(jax.jit, out_shardings=self._in_sharding, static_argnums=(2,))
        def _forward(variables, x, full_depth=None):
            if full_depth is not None and x.shape[1] < full_depth:
                top = (full_depth - x.shape[1]) // 2
                x = jnp.pad(x, ((0, 0), (top, full_depth - x.shape[1] - top),
                                (0, 0), (0, 0)))
            return self.model.apply(variables, x, train=False)

        self._forward = _forward

        if fa_compact:
            from clair3_tpu.ops.fa_compact import unpack_fa_jax

            @partial(jax.jit, out_shardings=self._in_sharding,
                     static_argnums=(5,))
            def _forward_compact(variables, cells, bitmask, scalars, refcol,
                                 full_depth=None):
                x = unpack_fa_jax(cells, bitmask, scalars, refcol)
                if full_depth is not None and x.shape[1] < full_depth:
                    top = (full_depth - x.shape[1]) // 2
                    x = jnp.pad(
                        x, ((0, 0), (top, full_depth - x.shape[1] - top),
                            (0, 0), (0, 0)))
                return self.model.apply(variables, x, train=False)

            self._forward_compact = _forward_compact

            from clair3_tpu.ops.fa_compact import unpack_fa_sparse_jax

            @partial(jax.jit, out_shardings=self._in_sharding,
                     static_argnums=(2,))
            def _forward_sparse(variables, packed, full_depth=None):
                x = unpack_fa_sparse_jax(packed)
                if full_depth is not None and x.shape[1] < full_depth:
                    top = (full_depth - x.shape[1]) // 2
                    x = jnp.pad(
                        x, ((0, 0), (top, full_depth - x.shape[1] - top),
                            (0, 0), (0, 0)))
                return self.model.apply(variables, x, train=False)

            self._forward_sparse = _forward_sparse

        if pileup_compact:
            from clair3_tpu.ops.pileup_compact import unpack_pileup_jax

            @partial(jax.jit, out_shardings=self._in_sharding)
            def _forward_pileup_compact(variables, mags, negidx):
                return self.model.apply(
                    variables, unpack_pileup_jax(mags, negidx), train=False)

            self._forward_pileup_compact = _forward_pileup_compact

    @staticmethod
    def _depth_buckets(full_depth: int):
        """(cropped, full): one reduced band covering typical coverage plus
        the full depth; two compiles per batch bucket."""
        crop = min(full_depth, ((int(full_depth * 0.55) + 7) // 8) * 8)
        return (crop, full_depth) if crop < full_depth else (full_depth,)

    def _crop_depth(self, chunk: np.ndarray):
        """Crop the centered depth band; returns (cropped, full_depth) or
        (chunk, None) when cropping is off/ineligible."""
        if not self.depth_crop or chunk.ndim != 4:
            return chunk, None
        D = chunk.shape[1]
        nz = np.flatnonzero(chunk.any(axis=(0, 2, 3)))
        lo, hi = (int(nz[0]), int(nz[-1]) + 1) if len(nz) else (D // 2, D // 2)
        for db in self._depth_buckets(D):
            top = (D - db) // 2
            if top <= lo and hi <= top + db:
                if db == D:
                    return chunk, None
                return np.ascontiguousarray(chunk[:, top: top + db]), D
        return chunk, None

    def warmup(self, input_shape, dtype) -> None:
        """Compile the forward program for every bucket size (and depth
        band, when cropping); call on a background thread so compilation
        overlaps host-side extraction."""
        if self.transfer_dtype is not None:
            dtype = self.transfer_dtype
        depths = ((None,) if not self.depth_crop or len(input_shape) != 3
                  else self._depth_buckets(input_shape[0]))
        for b in self.buckets:
            for db in depths:
                shape = tuple(input_shape)
                full = None
                if db is not None and db != shape[0]:
                    full = shape[0]
                    shape = (db,) + shape[1:]
                x = np.zeros((b,) + shape, dtype)
                dev = jax.device_put(x, self._in_sharding)
                self._forward(self.variables, dev, full)
                if self.fa_compact and len(shape) == 3:
                    from clair3_tpu.ops.fa_compact import (K_BUCKETS,
                                                           pack_fa_sparse)

                    # production hits the sparse program on the cropped
                    # band; plant >K0 alt entries to warm the larger K too
                    # (the v1/full fallbacks compile lazily if ever hit)
                    for kb in K_BUCKETS:
                        w = x.copy()
                        if kb > K_BUCKETS[0]:
                            # > K0 nonzero alt cells per row forces this K
                            w[:, : K_BUCKETS[0] // 33 + 1, :, 1] = 1
                        packed = pack_fa_sparse(w)
                        if packed is None or packed["sidx"].shape[1] != kb:
                            continue
                        pdev = jax.device_put(packed, self._in_sharding)
                        self._forward_sparse(self.variables, pdev, full)
                if self.pileup_compact and len(shape) == 2:
                    from clair3_tpu.ops.pileup_compact import pack_pileup

                    packed = pack_pileup(x)
                    pdev = {k: jax.device_put(v, self._in_sharding)
                            for k, v in packed.items()}
                    self._forward_pileup_compact(
                        self.variables, pdev["mags"], pdev["negidx"])

    def warmup_async(self, input_shape, dtype):
        import threading

        t = threading.Thread(target=self.warmup, args=(input_shape, dtype),
                             daemon=True)
        t.start()
        self._warmup_thread = t
        return t

    def wait_warmup(self) -> None:
        """Join an in-flight warmup_async thread.  Callers must invoke this
        before process exit: a daemon thread killed mid-XLA-compile brings
        the C++ runtime down with SIGABRT ("exception not rethrown")."""
        t = getattr(self, "_warmup_thread", None)
        if t is not None:
            t.join()
            self._warmup_thread = None

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        # round up to a multiple of the largest bucket
        top = self.buckets[-1]
        return ((n + top - 1) // top) * top

    def _submitter_pool(self):
        """One dedicated dispatch thread: host->device copies and forward
        dispatches run off the caller's thread, so the caller can decode
        batch i-1 while batch i is still CROSSING the link (device_put
        blocks its calling thread for the copy duration)."""
        if getattr(self, "_submitter", None) is None:
            from concurrent.futures import ThreadPoolExecutor

            self._submitter = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="engine-submit")
        return self._submitter

    def _sparse_fast_path(self, chunk: np.ndarray, bucket: int):
        """Band-scan + offset-pack straight from the full-depth tensor (no
        numpy crop scan, no crop copy — both native single passes); None
        when ineligible, then the caller runs the materializing path."""
        if (chunk.dtype != np.int8 or not chunk.flags.c_contiguous
                or os.environ.get("CLAIR3T_VERIFY_PACK")):
            return None
        from clair3_tpu.native import (fa_band_native, fa_pack_sparse_native,
                                       pack_native_available)
        from clair3_tpu.ops.fa_compact import K_BUCKETS

        if not pack_native_available():
            return None
        D = chunk.shape[1]
        band = fa_band_native(chunk)
        if band is None:
            return None
        lo, hi = band
        top, db = 0, D
        if self.depth_crop:
            for b in self._depth_buckets(D):
                t = (D - b) // 2
                if t <= lo and hi <= t + b:
                    top, db = t, b
                    break
        sp = fa_pack_sparse_native(chunk, K_BUCKETS, row_off=top, rows=db)
        if sp is None:
            return None
        sp = _pad_to_bucket(sp, chunk.shape[0], bucket)
        self.bytes_shipped += sum(v.nbytes for v in sp.values())
        dev = jax.device_put(sp, self._in_sharding)
        return self._forward_sparse(self.variables, dev,
                                    D if db < D else None)

    def _put_and_forward(self, chunk: np.ndarray, bucket: int):
        if self.transfer_dtype is not None and chunk.dtype != self.transfer_dtype:
            chunk = chunk.astype(self.transfer_dtype)
        if self.fa_compact and chunk.ndim == 4:
            out = self._sparse_fast_path(chunk, bucket)
            if out is not None:
                return out
        chunk, full_depth = self._crop_depth(chunk)
        m = chunk.shape[0]
        if self.fa_compact and chunk.ndim == 4:
            from clair3_tpu.ops.fa_compact import pack_fa_sparse

            sp = pack_fa_sparse(chunk)
            if sp is not None:
                sp = _pad_to_bucket(sp, m, bucket)
                self.bytes_shipped += sum(v.nbytes for v in sp.values())
                dev = jax.device_put(sp, self._in_sharding)
                return self._forward_sparse(self.variables, dev, full_depth)
        packed = None
        if self.fa_compact and chunk.ndim == 4:
            from clair3_tpu.ops.fa_compact import pack_fa

            packed = pack_fa(chunk)
        if packed is not None:
            packed = _pad_to_bucket(packed, m, bucket)
            self.bytes_shipped += sum(v.nbytes for v in packed.values())
            dev = {k: jax.device_put(v, self._in_sharding)
                   for k, v in packed.items()}
            return self._forward_compact(
                self.variables, dev["cells"], dev["bitmask"],
                dev["scalars"], dev["refcol"], full_depth)
        if self.pileup_compact and chunk.ndim == 3:
            from clair3_tpu.ops.pileup_compact import pack_pileup

            ppacked = pack_pileup(chunk)
            if ppacked is not None:
                ppacked = _pad_to_bucket(ppacked, m, bucket)
                self.bytes_shipped += sum(v.nbytes for v in ppacked.values())
                dev = {k: jax.device_put(v, self._in_sharding)
                       for k, v in ppacked.items()}
                return self._forward_pileup_compact(
                    self.variables, dev["mags"], dev["negidx"])
        if m < bucket:
            pad = np.zeros((bucket - m,) + chunk.shape[1:], chunk.dtype)
            chunk = np.concatenate([chunk, pad], axis=0)
        self.bytes_shipped += chunk.nbytes
        dev = jax.device_put(chunk, self._in_sharding)
        return self._forward(self.variables, dev, full_depth)

    def predict_async(self, x: np.ndarray) -> List:
        """Enqueue a host batch; returns handles (no host sync, no copy on
        the caller's thread).  Lets the caller overlap its CPU decode of
        batch i-1 with batch i's transfer AND the device computing it
        (replacing the reference's shared-memory GPU-predict/CPU-decode
        split, CallVariantsFromCffi.py:299-353)."""
        n = x.shape[0]
        pool = self._submitter_pool()
        handles: List = []
        top = self.buckets[-1]
        for lo in range(0, n, top):
            chunk = x[lo: lo + top]
            m = chunk.shape[0]
            b = self._bucket_for(m)
            handles.append((pool.submit(self._put_and_forward, chunk, b), m))
        return handles

    @staticmethod
    def gather(handles: List) -> np.ndarray:
        """Fetch async handles to host probabilities [N, 24|90]."""
        if not handles:
            return np.zeros((0, 90), np.float32)
        out = []
        for y, m in handles:
            if hasattr(y, "result"):
                y = y.result()
            out.append(np.asarray(y)[:m])
        return np.concatenate(out, axis=0)

    def predict(self, x: np.ndarray) -> np.ndarray:
        """Forward a host batch; returns probabilities [N, 24|90] float32."""
        if x.shape[0] == 0:
            return np.zeros((0, 90), np.float32)
        return self.gather(self.predict_async(x))


def rescale_high_coverage_pileup(
    tensors: np.ndarray, alt_infos: Sequence[str], max_depth: int = 144
) -> np.ndarray:
    """Integer-truncated rescale of extreme-coverage pileup tensors
    (reference: CallVariantsFromCffi.py:278-285)."""
    for i, alt_info in enumerate(alt_infos):
        depth = int(str(alt_info).split("-", maxsplit=1)[0])
        if depth > 0 and depth > max_depth * 1.5:
            scale = depth / max_depth
            tensors[i] = (tensors[i] / scale).astype(tensors.dtype)
    return tensors
