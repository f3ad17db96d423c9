import random

import pytest

from clair3_tpu.io.tabix import TabixReader, write_tabix_index
from clair3_tpu.io.vcf import VcfWriter


def _write_vcf(path, rows):
    header = "##fileformat=VCFv4.2\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS"
    with VcfWriter(path, header) as w:
        for r in rows:
            w.write(r)


def test_tabix_roundtrip_small(tmp_path):
    path = str(tmp_path / "x.vcf.gz")
    rows = [
        f"chr1\t{p}\t.\tA\tT\t30\tPASS\t.\tGT\t0/1" for p in (100, 5000, 20000, 100000)
    ] + [
        f"chr2\t{p}\t.\tAGG\tA\t30\tPASS\t.\tGT\t0/1" for p in (50, 70000)
    ]
    _write_vcf(path, rows)
    tbi = write_tabix_index(path)
    rd = TabixReader(path, tbi)
    assert rd.names == ["chr1", "chr2"]

    got = list(rd.fetch("chr1", 0, 200))
    assert len(got) == 1 and "\t100\t" in got[0]
    got = list(rd.fetch("chr1", 4000, 25000))
    assert [g.split("\t")[1] for g in got] == ["5000", "20000"]
    got = list(rd.fetch("chr2", 49, 52))
    assert len(got) == 1
    # the deletion spans [49, 52): a query inside its span must hit it
    got = list(rd.fetch("chr2", 51, 52))
    assert len(got) == 1
    assert list(rd.fetch("chr2", 200, 300)) == []
    assert list(rd.fetch("chrX", 0, 100)) == []


def test_tabix_many_rows_spanning_blocks(tmp_path):
    """Enough rows to fill multiple 64KB BGZF blocks."""
    rng = random.Random(0)
    path = str(tmp_path / "big.vcf.gz")
    positions = sorted(rng.sample(range(1, 5_000_000), 4000))
    rows = [
        f"chr1\t{p}\t.\tA\tT\t30.00\tPASS\tP\tGT:GQ:DP:AD:AF\t0/1:30:30:15,15:0.5000"
        for p in positions
    ]
    _write_vcf(path, rows)
    write_tabix_index(path)
    rd = TabixReader(path)
    # spot-check several windows against brute force
    for lo, hi in ((0, 10_000), (1_000_000, 1_200_000), (4_900_000, 5_000_000),
                   (2_345_678, 2_400_000)):
        expected = [p for p in positions if lo <= p - 1 < hi]
        got = [int(r.split("\t")[1]) for r in rd.fetch("chr1", lo, hi)]
        assert got == expected, (lo, hi, len(got), len(expected))


def test_pipeline_outputs_are_indexed(tmp_path):
    from clair3_tpu.config import CallConfig
    from clair3_tpu.pipeline.call import VariantCaller
    from clair3_tpu.testing import PileupOracleEngine, SimVariant, random_reference, write_test_case
    import os

    ref = random_reference(1500, seed=91)
    v = SimVariant(700, ref[700], "C" if ref[700] != "C" else "G", (1, 1))
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=1500, variants=[v], coverage=20,
        read_length=500, seed=91)
    cfg = CallConfig(platform="ont", bam_fn=bam, ref_fn=fasta,
                     output_dir=str(tmp_path / "out"), pileup_only=True)
    outputs = VariantCaller(cfg, pileup_engine=PileupOracleEngine()).run()
    assert os.path.exists(outputs["merge_output"] + ".tbi")
    rd = TabixReader(outputs["merge_output"])
    got = list(rd.fetch("chr1", 690, 710))
    assert len(got) == 1 and "\t701\t" in got[0]
