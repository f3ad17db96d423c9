"""Shared base-encoding tables and logging helpers
(reference semantics: shared/utils.py:27-61)."""

from __future__ import annotations

# IUPAC ambiguity codes resolve to a deterministic ACGT base.
IUPAC_TO_ACGT = dict(zip(
    "ACGTURYSWKMBDHVN",
    ("A", "C", "G", "T", "T", "A", "C", "C", "A", "G", "A", "C", "A", "A", "A", "A"),
))

IUPAC_TO_NUM = dict(zip(
    "ACGTURYSWKMBDHVN",
    (0, 1, 2, 3, 3, 0, 1, 1, 0, 2, 0, 1, 0, 0, 0, 0),
))

BASIC_BASES = set("ACGTU")

_WARNING = "\033[93m"
_ERROR = "\033[91m"
_ENDC = "\033[0m"


def log_error(msg: str) -> str:
    return _ERROR + msg + _ENDC


def log_warning(msg: str) -> str:
    return _WARNING + msg + _ENDC


def convert_iupac_to_n(string: str) -> str:
    """Replace non-ACGTN characters with N (kept verbatim for '.')."""
    if string == ".":
        return string
    out = []
    changed = False
    for s in string:
        if s.upper() not in "ACGTN,.":
            changed = True
            out.append("N")
        else:
            out.append(s)
    return "".join(out) if changed else string


def enable_compilation_cache() -> str | None:
    """Point JAX at a persistent on-disk compilation cache so repeated CLI
    invocations skip the XLA compile (20-40s/program through the remote TPU
    backend; verified to round-trip through axon).  The reference pays an
    analogous cost per process in torch CUDA context + cudnn autotune warmup
    (reference: clair3/CallVariantsFromCffi.py model-load path).

    Cache dir: $CLAIR3T_COMPILE_CACHE, else ~/.cache/clair3_tpu/xla.
    CLAIR3T_COMPILE_CACHE=0 disables.  Returns the dir in use (or None).
    Safe to call more than once and after jax is initialized (the config
    only gates compile-result lookups, not backend creation).
    """
    import os

    choice = os.environ.get("CLAIR3T_COMPILE_CACHE", "")
    if choice == "0":
        return None
    cache_dir = choice or os.path.join(
        os.path.expanduser("~"), ".cache", "clair3_tpu", "xla")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every program: the pipeline's jit programs are few and the
        # per-process win is the whole point (default min sizes skip them)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        # jax memoizes the cache object on first use; drop it so a dir
        # change after an earlier compile actually takes effect
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()
    except Exception:  # pragma: no cover - cache is best-effort
        return None
    return cache_dir
