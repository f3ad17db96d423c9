import numpy as np
import pytest

from clair3_tpu.config import CallConfig
from clair3_tpu.io.bed import BedIntervals, read_bed
from clair3_tpu.io.vcf import VcfReader, VcfRecord, VcfWriter, get_header, parse_vcf_line
from clair3_tpu.pipeline.call import VariantCaller
from clair3_tpu.postprocess import (
    add_back_missing_variants,
    parse_happy_vcf,
    sv_deletion_intervals_from_vcf,
    switch_zygosity_based_on_sv_calls,
    variant_metrics,
)
from clair3_tpu.testing import (
    PileupOracleEngine,
    SimVariant,
    random_reference,
    write_test_case,
)


def test_bed_intervals():
    b = BedIntervals()
    b.add("chr1", 10, 20)
    b.add("chr1", 15, 30)  # merges
    b.add("chr1", 50, 60)
    assert b.contains("chr1", 10)
    assert b.contains("chr1", 29)
    assert not b.contains("chr1", 30)
    assert not b.contains("chr1", 40)
    assert b.overlaps("chr1", 25, 55)
    assert not b.overlaps("chr2", 0, 100)
    assert b.span("chr1") == (10, 60)


def test_read_bed(tmp_path):
    p = tmp_path / "r.bed"
    p.write_text("chr1\t100\t200\nchr2\t0\t50\n#comment\n")
    tree = read_bed(str(p))
    assert tree.contains("chr1", 150)
    assert tree.contains("chr2", 49)
    assert not tree.contains("chr1", 250)


def test_add_back_missing():
    candidates = [
        VcfRecord("chr1", 100, "A", "T", 30, "PASS", ".", "GT", "0/1"),
        VcfRecord("chr1", 200, "CG", "C", 30, "PASS", ".", "GT", "1/1"),
    ]
    called = ["chr1\t100\t.\tA\tT\t25.00\tPASS\tP\tGT:GQ:DP:AD:AF\t0/1:25:30:15,15:0.5000\n"]
    rows = add_back_missing_variants(candidates, called)
    assert len(rows) == 2
    assert rows[0].startswith("chr1\t100") and "0/1" in rows[0]
    cols = rows[1].rstrip().split("\t")
    assert cols[:5] == ["chr1", "200", ".", "C", "."]
    assert cols[9] == "./."


def test_variant_metrics():
    truth = [
        VcfRecord("chr1", 10, "A", "T", 30, "PASS", ".", "GT", "0/1"),
        VcfRecord("chr1", 20, "C", "G", 30, "PASS", ".", "GT", "1/1"),
        VcfRecord("chr1", 30, "A", "ATT", 30, "PASS", ".", "GT", "0/1"),
    ]
    query = [
        VcfRecord("chr1", 10, "A", "T", 30, "PASS", "P", "GT", "0/1"),   # TP
        VcfRecord("chr1", 20, "C", "G", 30, "PASS", "P", "GT", "0/1"),   # wrong GT
        VcfRecord("chr1", 40, "G", "C", 30, "PASS", "P", "GT", "0/1"),   # FP
    ]
    m = variant_metrics(truth, query)
    assert m["SNP"].truth_tp == 1
    assert m["SNP"].query_fp == 2
    assert m["SNP"].truth_fn == 1
    assert m["INDEL"].truth_fn == 1
    m2 = variant_metrics(truth, query, genotype_match=False)
    assert m2["SNP"].truth_tp == 2


def test_parse_happy_vcf(tmp_path):
    path = str(tmp_path / "happy.vcf")
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tTRUTH\tQUERY\n")
        f.write("chr1\t10\t.\tA\tT\t30\tPASS\t.\tGT:BD:BVT\t0/1:TP:SNP\t0/1:TP:SNP\n")
        f.write("chr1\t20\t.\tC\tG\t30\tPASS\t.\tGT:BD:BVT\t0/1:FN:SNP\t.:.:NOCALL\n")
        f.write("chr1\t30\t.\tA\tAT\t30\tPASS\t.\tGT:BD:BVT\t.:.:NOCALL\t0/1:FP:INDEL\n")
    m = parse_happy_vcf(path)
    assert m["SNP"].truth_tp == 1 and m["SNP"].truth_fn == 1
    assert m["INDEL"].query_fp == 1
    assert m["SNP"].recall == 0.5


def test_switch_zygosity(tmp_path):
    # hemizygous-like region: half the reads carry a long deletion spanning
    # the SNP neighborhood, remaining reads all show the alt -> caller says
    # 1/1 but the SV evidence says 0/1
    ref = random_reference(2000, seed=61)
    alt = "T" if ref[1000] != "T" else "A"
    variants = [
        SimVariant(900, ref[900:1200], ref[900], (1, 0)),   # 299bp del on hap0
        SimVariant(1000, ref[1000], alt, (0, 1)),           # SNP on hap1
    ]
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=2000, variants=variants, coverage=24,
        read_length=900, seed=61)

    clair3_rows = [
        f"chr1\t1001\t.\t{ref[1000]}\t{alt}\t30.00\tPASS\tP\tGT:GQ:DP:AD:AF\t1/1:30:24:0,12:0.5000\n",
    ]
    sv_tree = BedIntervals()
    sv_tree.add("chr1", 900, 1200)
    rows, n = switch_zygosity_based_on_sv_calls(
        bam, clair3_rows, sv_tree, min_del_proportion=0.3)
    assert n == 1
    assert "0/1" in rows[0]
    assert "SVBASEDHET" in rows[0]
    assert "ORG_CLAIR3_SCORE=30.00" in rows[0]

    # without SV overlap: untouched
    rows, n = switch_zygosity_based_on_sv_calls(
        bam, clair3_rows, BedIntervals())
    assert n == 0 and "1/1" in rows[0]


def test_sv_intervals_from_vcf(tmp_path):
    path = str(tmp_path / "sv.vcf")
    with open(path, "w") as f:
        f.write("##fileformat=VCFv4.2\n")
        f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n")
        f.write("chr1\t500\t.\tN\t<DEL>\t30\tPASS\tSVTYPE=DEL;SVLEN=-300;END=800\tGT\t0/1\n")
        f.write("chr1\t2000\t.\tN\t<INS>\t30\tPASS\tSVTYPE=INS;SVLEN=200\tGT\t0/1\n")
        f.write("chr1\t3000\t.\tN\t<DEL>\t30\tLowQual\tSVTYPE=DEL;END=3500\tGT\t0/1\n")
    tree = sv_deletion_intervals_from_vcf(path)
    assert tree.contains("chr1", 600)
    assert not tree.contains("chr1", 2100)  # INS ignored
    assert not tree.contains("chr1", 3200)  # LowQual filtered


def test_pipeline_bed_filtering(tmp_path):
    ref = random_reference(2000, seed=62)
    variants = [
        SimVariant(500, ref[500], "C" if ref[500] != "C" else "G", (1, 1)),
        SimVariant(1500, ref[1500], "T" if ref[1500] != "T" else "A", (1, 1)),
    ]
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=2000, variants=variants, coverage=25,
        read_length=600, seed=62)
    bed = tmp_path / "r.bed"
    bed.write_text("chr1\t400\t600\n")  # only covers the first variant
    cfg = CallConfig(
        platform="ont", bam_fn=bam, ref_fn=fasta, bed_fn=str(bed),
        output_dir=str(tmp_path / "out"), pileup_only=True,
    )
    outputs = VariantCaller(cfg, pileup_engine=PileupOracleEngine()).run()
    recs = list(VcfReader(outputs["merge_output"]))
    assert [r.pos for r in recs] == [501]


def test_pipeline_genotyping_mode(tmp_path):
    ref = random_reference(2000, seed=63)
    v = SimVariant(800, ref[800], "G" if ref[800] != "G" else "C", (0, 1))
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=2000, variants=[v], coverage=25,
        read_length=600, seed=63)
    # known sites: the real variant + one absent site
    known = tmp_path / "known.vcf"
    header = get_header(reference_file_path=fasta, sample_name="K")
    with VcfWriter(str(known), header) as w:
        w.write(f"chr1\t801\t.\t{v.ref}\t{v.alt}\t60\tPASS\t.\tGT\t0/1")
        w.write(f"chr1\t1201\t.\t{ref[1200]}\tA\t60\tPASS\t.\tGT\t0/1")
    cfg = CallConfig(
        platform="ont", bam_fn=bam, ref_fn=fasta, vcf_fn=str(known),
        output_dir=str(tmp_path / "out"), pileup_only=True,
    )
    outputs = VariantCaller(cfg, pileup_engine=PileupOracleEngine()).run()
    recs = list(VcfReader(outputs["merge_output"]))
    by_pos = {r.pos: r for r in recs}
    assert set(by_pos) == {801, 1201}
    assert by_pos[801].alt == v.alt
    assert by_pos[1201].sample == "./."


def test_genotyping_mode_zeroes_af_thresholds():
    """--vcf_fn forces snp/indel min AF to 0 so every known site is
    tensorized and model-genotyped (run_clair3.py:393-395)."""
    cfg = CallConfig(platform="ont", bam_fn="x.bam", ref_fn="x.fa",
                     output_dir="o", vcf_fn="known.vcf").resolved()
    assert cfg.snp_min_af == 0.0
    assert cfg.indel_min_af == 0.0
    # without vcf_fn the platform presets apply
    cfg2 = CallConfig(platform="ont", bam_fn="x.bam", ref_fn="x.fa",
                      output_dir="o").resolved()
    assert cfg2.snp_min_af == 0.08


def test_genotyping_mode_low_af_known_site_is_genotyped(tmp_path):
    """A known site whose AF is below the platform gate (0.05 < 0.08) must
    still be tensorized and decoded by the model — not silently dropped and
    re-added as a blind ./. row (reference issue #261)."""
    from clair3_tpu.io.bam import BamRead, write_bam

    ref = random_reference(400, seed=77)
    pos0 = 200
    alt = "T" if ref[pos0] != "T" else "A"
    reads = []
    for i in range(20):
        seq = list(ref[50:350])
        if i == 0:  # exactly 1/20 reads carry the alt: AF 0.05
            seq[pos0 - 50] = alt
        reads.append(BamRead(
            f"r{i}", 0 if i % 2 == 0 else 16, 0, 50, 60, [(0, 300)],
            "".join(seq), np.full(300, 30, np.uint8)))
    bam = str(tmp_path / "lowaf.bam")
    write_bam(bam, ["chr1"], [400], reads)
    fasta = str(tmp_path / "ref.fa")
    with open(fasta, "w") as f:
        f.write(">chr1\n" + ref + "\n")

    known = tmp_path / "known.vcf"
    header = get_header(reference_file_path=fasta, sample_name="K")
    with VcfWriter(str(known), header) as w:
        w.write(f"chr1\t{pos0 + 1}\t.\t{ref[pos0]}\t{alt}\t60\tPASS\t.\tGT\t0/1")

    cfg = CallConfig(
        platform="ont", bam_fn=bam, ref_fn=fasta, vcf_fn=str(known),
        output_dir=str(tmp_path / "out"), pileup_only=True,
    )
    # oracle het threshold below 0.05 so the model-decoded genotype is 0/1
    engine = PileupOracleEngine(het_threshold=0.03)
    outputs = VariantCaller(cfg, pileup_engine=engine).run()
    recs = list(VcfReader(outputs["merge_output"]))
    assert len(recs) == 1
    rec = recs[0]
    assert rec.pos == pos0 + 1
    assert rec.alt == alt            # decoded from read evidence
    assert rec.genotype == (0, 1)    # model call, not a ./. add-back


def test_add_pairend_allele_depth(tmp_path):
    from clair3_tpu.io.bam import BamRead, write_bam
    from clair3_tpu.postprocess import add_pairend_allele_depth
    import numpy as np

    ref = random_reference(300, seed=64)
    alt = "T" if ref[100] != "T" else "A"
    alt_seq = ref[50:100] + alt + ref[101:150]
    reads = []
    # 3 fragments; one has BOTH mates covering the SNP (same qname)
    for i, qname in enumerate(("f1", "f1", "f2", "f3")):
        reads.append(BamRead(
            qname, 0 if i % 2 == 0 else 16, 0, 50, 60, [(0, 100)], alt_seq,
            np.full(100, 30, np.uint8)))
    # one ref-carrying read
    reads.append(BamRead("r1", 0, 0, 50, 60, [(0, 100)], ref[50:150],
                         np.full(100, 30, np.uint8)))
    reads.sort(key=lambda r: r.pos)
    bam = str(tmp_path / "p.bam")
    write_bam(bam, ["chr1"], [300], reads)

    row = (f"chr1\t101\t.\t{ref[100]}\t{alt}\t30.00\tPASS\tP\t"
           f"GT:GQ:DP:AD:AF\t0/1:30:5:1,4:0.8000\n")
    out = add_pairend_allele_depth(bam, [row])
    cols = out[0].rstrip().split("\t")
    assert cols[8].endswith(":PEAD")
    # 4 alt reads but only 3 unique fragment names
    assert cols[9].endswith(":3")


def test_genotyping_mode_filters_before_tensorization(tmp_path):
    """With AF gates at 0 every covered position is a candidate; the
    known-sites filter must apply BEFORE window slicing so tensors are
    only materialized for known sites (GBs per chunk otherwise)."""
    from clair3_tpu.pileup.extractor import create_pileup_tensors

    ref = random_reference(3000, seed=91)
    v = SimVariant(1500, ref[1500], "G" if ref[1500] != "G" else "C", (0, 1))
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=3000, variants=[v], coverage=25,
        read_length=800, seed=91, error_rate=0.02)

    known = {1501, 2001}
    tensors, pos_infos, _, _ = create_pileup_tensors(
        bam, fasta, "chr1", 1, 3000, min_snp_af=0.0, min_indel_af=0.0,
        positions_filter=lambda pos0: pos0 + 1 in known)
    assert tensors.shape[0] <= len(known)
    got = {int(p.split(":")[-2]) for p in pos_infos}
    assert got <= known and 1501 in got

    # sanity: without the filter, AF=0 candidates cover ~every position
    all_t, _, _, _ = create_pileup_tensors(
        bam, fasta, "chr1", 1, 3000, min_snp_af=0.0, min_indel_af=0.0)
    assert all_t.shape[0] > 1000
