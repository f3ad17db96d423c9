"""Differential tests: native (C++) gVCF block builder vs the Python
NonVariantBlockWriter oracle (itself row-identical to the reference's
variantInfoCalculator, tests/test_reference_differential.py)."""

import numpy as np
import pytest

from clair3_tpu.gvcf import NonVariantBlockWriter

native = pytest.importorskip("clair3_tpu.native")
if not native.native_available():
    pytest.skip("g++ toolchain unavailable", allow_module_level=True)


def _stream(seed, n=3000, with_n_patches=True):
    rng = np.random.default_rng(seed)
    ref = "".join(np.array(list("ACGT"))[rng.integers(0, 4, n)])
    if with_n_patches:
        ref = ref[:500] + "N" * 25 + ref[525:]
    depth = 20
    n_tot, n_ref = [], []
    for i in range(n):
        depth = max(0, depth + int(rng.integers(-3, 4)))
        t = depth
        if 1200 <= i < 1210:
            t = 0
        r = max(0, t - int(rng.integers(0, 4)))
        n_tot.append(t)
        n_ref.append(r)
    return ref, np.array(n_ref, np.int64), np.array(n_tot, np.int64)


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("bp_resolution", [False, True])
def test_native_gvcf_matches_python(seed, bp_resolution):
    ref, n_ref, n_tot = _stream(seed)
    lengths = {"chr1": len(ref) + 1000}
    py = NonVariantBlockWriter(bp_resolution=bp_resolution,
                               contig_lengths=lengths)
    for i in range(len(ref)):
        py.add_site("chr1", i + 1, ref[i], int(n_ref[i]), int(n_tot[i]))
    expected = py.finish()

    nat = native.NativeGvcfWriter(bp_resolution=bp_resolution,
                                  contig_lengths=lengths)
    nat.feed("chr1", 1, ref, n_ref, n_tot)
    got = nat.finish()
    nat.close()
    assert got == expected


def test_native_gvcf_chunked_feed_spans_blocks():
    """Blocks spanning feed-call boundaries must merge exactly as one
    continuous stream (the pipeline feeds per 500kb chunk)."""
    ref, n_ref, n_tot = _stream(7, n=5000)
    lengths = {"chr1": len(ref)}
    py = NonVariantBlockWriter(contig_lengths=lengths)
    for i in range(len(ref)):
        py.add_site("chr1", i + 1, ref[i], int(n_ref[i]), int(n_tot[i]))
    expected = py.finish()

    nat = native.NativeGvcfWriter(contig_lengths=lengths)
    for lo in range(0, len(ref), 777):
        hi = min(len(ref), lo + 777)
        nat.feed("chr1", lo + 1, ref[lo:hi], n_ref[lo:hi], n_tot[lo:hi])
    got = nat.finish()
    nat.close()
    assert got == expected


def test_native_gvcf_multi_contig_and_end_adjust():
    """Contig changes break blocks; END at contig_length-1 is promoted to
    contig_length (telomere rule)."""
    lengths = {"c1": 101, "c2": 50}
    py = NonVariantBlockWriter(contig_lengths=lengths)
    nat = native.NativeGvcfWriter(contig_lengths=lengths)
    for ctg, n in (("c1", 100), ("c2", 30)):
        ref = "A" * n
        counts = np.full(n, 20, np.int64)
        for i in range(n):
            py.add_site(ctg, i + 1, "A", 20, 20)
        nat.feed(ctg, 1, ref, counts, counts)
    expected = py.finish()
    got = nat.finish()
    nat.close()
    assert got == expected
    assert any("END=101" in r for r in got)  # 100 == length-1 -> promoted


def test_native_gvcf_reference_oracle(tmp_path):
    """Chain the parity: native == Python == the reference's own
    variantInfoCalculator on one stream."""
    import contextlib
    import io
    import os
    import sys

    REF = "/root/reference"
    if not os.path.isdir(os.path.join(REF, "preprocess")):
        pytest.skip("no reference tree")
    sys.path.insert(0, REF)
    try:
        from preprocess.utils import variantInfoCalculator
    finally:
        sys.path.remove(REF)

    fasta = tmp_path / "r.fa"
    fasta.write_text(">chr1\n" + "ACGT" * 800 + "\n")
    (tmp_path / "r.fa.fai").write_text("chr1\t3200\t6\t3200\t3201\n")
    with contextlib.redirect_stdout(io.StringIO()):
        calc = variantInfoCalculator(
            gvcfWritePath="PIPE", ref_path=str(fasta), p_err=0.001,
            gq_bin_size=5, ctgName="chr1", sample_name="S", mode="L")
    out = io.StringIO()
    calc.vcf_writer = out

    ref, n_ref, n_tot = _stream(11, n=3000)
    nat = native.NativeGvcfWriter(
        contig_lengths=dict(calc.contig_length_dict))
    for i in range(len(ref)):
        calc.make_gvcf_online({"chr": "chr1", "pos": i + 1, "ref": ref[i],
                               "n_total": int(n_tot[i]), "n_ref": int(n_ref[i])})
    calc.make_gvcf_online({}, push_current=True)
    nat.feed("chr1", 1, ref, n_ref, n_tot)
    got = list(nat.finish())
    nat.close()
    expected = [l for l in out.getvalue().splitlines() if l]
    assert got == expected
