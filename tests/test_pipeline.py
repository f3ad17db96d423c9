import numpy as np
import pytest

from clair3_tpu.config import CallConfig
from clair3_tpu.io.vcf import VcfReader
from clair3_tpu.pipeline.call import VariantCaller, plan_chunks
from clair3_tpu.pipeline.merge_sort import merge_pileup_and_full_alignment, sort_rows
from clair3_tpu.pipeline.select import (
    select_candidates,
    select_het_snps,
    select_phase_qual,
    select_qual,
)
from clair3_tpu.io.vcf import parse_vcf_line
from clair3_tpu.testing import (
    FullAlignmentOracleEngine,
    PileupOracleEngine,
    SimVariant,
    random_reference,
    write_test_case,
)


def _truth_variants(ref):
    return [
        SimVariant(500, ref[500], "C" if ref[500] != "C" else "G", (1, 1)),   # hom SNP
        SimVariant(800, ref[800], "T" if ref[800] != "T" else "A", (0, 1)),   # het SNP
        SimVariant(1100, ref[1100], ref[1100] + "AG", (1, 1)),               # hom ins
        SimVariant(1400, ref[1400:1403], ref[1400], (0, 1)),                 # het del
    ]


@pytest.fixture(scope="module")
def case(tmp_path_factory):
    d = tmp_path_factory.mktemp("case")
    ref = random_reference(2000, seed=11)
    variants = _truth_variants(ref)
    fasta, bam, _, _ = write_test_case(
        str(d), ref_length=2000, variants=variants, coverage=30,
        read_length=600, seed=11, error_rate=0.02)
    return {"dir": str(d), "fasta": fasta, "bam": bam, "ref": ref,
            "variants": variants}


def _records(path):
    return list(VcfReader(path))


def test_plan_chunks():
    tasks = plan_chunks([("chr1", 12_000_000), ("chr2", 3_000_000)], 5_000_000)
    assert [(t.contig, t.start, t.end) for t in tasks] == [
        ("chr1", 1, 5_000_000), ("chr1", 5_000_001, 10_000_000),
        ("chr1", 10_000_001, 12_000_000), ("chr2", 1, 3_000_000),
    ]


def test_pileup_only_pipeline(case, tmp_path):
    cfg = CallConfig(
        platform="ont", bam_fn=case["bam"], ref_fn=case["fasta"],
        output_dir=str(tmp_path / "out"), pileup_only=True, threads=2,
    )
    caller = VariantCaller(cfg, pileup_engine=PileupOracleEngine())
    outputs = caller.run()
    recs = _records(outputs["merge_output"])
    by_pos = {r.pos: r for r in recs}

    truth = case["variants"]
    # hom SNP
    assert by_pos[501].alt == truth[0].alt and by_pos[501].genotype == (1, 1)
    # het SNP
    assert by_pos[801].alt == truth[1].alt and by_pos[801].genotype == (0, 1)
    # hom ins
    assert by_pos[1101].alt == truth[2].alt and by_pos[1101].genotype == (1, 1)
    # het del: REF = full deleted allele
    assert by_pos[1401].ref == truth[3].ref and by_pos[1401].alt == truth[3].alt
    assert by_pos[1401].genotype == (0, 1)
    # no spurious extra calls
    assert len(recs) <= 6
    # pileup VCF exists, has RefCall rows suppressed in merge_output
    pileup_recs = _records(outputs["pileup"])
    assert len(pileup_recs) >= len(recs)


def test_full_cascade_pipeline(case, tmp_path):
    cfg = CallConfig(
        platform="ont", bam_fn=case["bam"], ref_fn=case["fasta"],
        output_dir=str(tmp_path / "out2"), threads=2,
        no_phasing_for_fa=True,
        # route everything through full-alignment
        var_pct_full=1.0, ref_pct_full=1.0,
    )
    caller = VariantCaller(
        cfg,
        pileup_engine=PileupOracleEngine(),
        fa_engine=FullAlignmentOracleEngine(),
    )
    outputs = caller.run()
    assert set(outputs) == {"pileup", "full_alignment", "merge_output"}
    recs = _records(outputs["merge_output"])
    by_pos = {r.pos: r for r in recs}
    truth = case["variants"]
    assert by_pos[501].alt == truth[0].alt and by_pos[501].genotype == (1, 1)
    assert by_pos[801].alt == truth[1].alt and by_pos[801].genotype == (0, 1)
    assert by_pos[1101].alt == truth[2].alt and by_pos[1101].genotype == (1, 1)
    assert by_pos[1401].ref == truth[3].ref and by_pos[1401].genotype == (0, 1)
    # full-alignment results win: INFO tag F at recalled positions
    fa_recs = _records(outputs["full_alignment"])
    assert len(fa_recs) > 0, "cascade routed nothing to full-alignment"
    fa_positions = {r.pos for r in fa_recs}
    for rec in recs:
        if rec.pos in fa_positions:
            assert rec.info == "F"


def test_select_qual_and_candidates():
    rows = [
        parse_vcf_line(f"chr1\t{100 + i}\t.\tA\t.\t{q:.2f}\tRefCall\tP\tGT:GQ:DP:AD:AF\t0/0:{int(q)}:30:30:0.0")
        for i, q in enumerate([1.0, 5.0, 9.0, 30.0])
    ] + [
        parse_vcf_line(f"chr1\t{200 + i}\t.\tA\tT\t{q:.2f}\tPASS\tP\tGT:GQ:DP:AD:AF\t0/1:{int(q)}:30:15,15:0.5")
        for i, q in enumerate([2.0, 8.0, 20.0, 25.0])
    ]
    var_qual, ref_qual = select_qual(rows, var_pct_full=0.5, ref_pct_full=0.5)
    assert var_qual == 8.0
    assert ref_qual == 5.0
    batches = select_candidates(rows, "chr1", var_qual, ref_qual)
    assert len(batches) == 1
    # below-cutoff positions only: ref 100 (1.0 < 5.0), var 200 (2.0 < 8.0)
    assert batches[0].positions == [100, 200]


def test_select_phase_qual_and_het_snps():
    rows = [
        parse_vcf_line(f"chr1\t{i}\t.\tA\tT\t{q:.2f}\tPASS\tP\tGT:GQ\t0/1:{int(q)}")
        for i, q in enumerate([4.0, 10.0, 16.0, 22.0], start=1)
    ]
    cutoff = select_phase_qual(rows, var_pct_phasing=0.75)
    assert cutoff == 4.0
    kept = select_het_snps(rows, cutoff, "chr1")
    assert len(kept) == 4  # cutoff is inclusive (>=)


def test_merge_prefers_full_alignment():
    p = ["chr1\t10\t.\tA\tT\t20.00\tPASS\tP\tGT:GQ:DP:AD:AF\t0/1:20:30:15,15:0.5\n",
         "chr1\t20\t.\tC\tG\t5.00\tPASS\tP\tGT:GQ:DP:AD:AF\t0/1:5:30:15,15:0.5\n"]
    f = ["chr1\t20\t.\tC\t.\t25.00\tRefCall\tF\tGT:GQ:DP:AD:AF\t0/0:25:30:30:0.0\n"]
    merged = merge_pileup_and_full_alignment(p, f, contig="chr1")
    # FA said position 20 is reference -> dropped; pileup pos 10 kept
    assert len(merged) == 1
    assert merged[0].startswith("chr1\t10")


def test_sort_rows_dedup_and_order():
    rows = [
        "chr2\t5\t.\tA\tT\t1\tPASS\tP\tGT\t0/1\n",
        "chr1\t9\t.\tA\tT\t1\tPASS\tP\tGT\t0/1\n",
        "chr1\t2\t.\tA\tT\t1\tPASS\tP\tGT\t0/1\n",
        "chr1\t9\t.\tA\tG\t2\tPASS\tP\tGT\t0/1\n",  # dup position, last wins
    ]
    out = sort_rows(rows)
    assert [r.split("\t")[0:2] for r in out] == [
        ["chr1", "2"], ["chr1", "9"], ["chr2", "5"]]
    assert "A\tG" in out[1]


def test_cascade_with_dwell_time(case, tmp_path):
    """--enable_dwell_time: 9-channel FA tensors from mv-tagged reads."""
    import numpy as np
    from clair3_tpu.fullalign.extractor import create_fa_tensors
    from clair3_tpu.testing import write_test_case as _wtc

    ref = random_reference(2000, seed=12)
    variants = _truth_variants(ref)[:2]
    fasta, bam, _, _ = _wtc(
        str(tmp_path), ref_length=2000, variants=variants, coverage=25,
        read_length=600, seed=12, error_rate=0.01, with_mv_tags=True)

    # extractor level: dwell channel populated
    tensors, _, _ = create_fa_tensors(
        bam, fasta, "chr1", [variants[0].pos + 1], matrix_depth=30,
        no_phasing=True, enable_dwell=True)
    assert tensors.shape[-1] == 9
    center_dwell = tensors[0, :, 16, 8]
    covered = tensors[0, :, 16, 0] != 0
    assert (center_dwell[covered] >= 1).all()
    assert len(np.unique(center_dwell[covered])) > 1  # 1-3 block variation

    # pipeline level with a dwell-aware oracle
    cfg = CallConfig(
        platform="ont", bam_fn=bam, ref_fn=fasta,
        output_dir=str(tmp_path / "out"), threads=2,
        no_phasing_for_fa=True, enable_dwell_time=True,
        var_pct_full=1.0, ref_pct_full=1.0,
    )
    caller = VariantCaller(
        cfg, pileup_engine=PileupOracleEngine(),
        fa_engine=FullAlignmentOracleEngine())
    outputs = caller.run()
    recs = list(VcfReader(outputs["merge_output"]))
    by_pos = {r.pos: r for r in recs}
    assert by_pos[501].alt == variants[0].alt
    assert by_pos[801].alt == variants[1].alt
    fa_recs = list(VcfReader(outputs["full_alignment"]))
    assert len(fa_recs) > 0


def test_multi_contig_pipeline(tmp_path):
    """Two contigs through the cascade + gVCF: per-contig ordering, headers,
    and block/variant interleaving."""
    from clair3_tpu.io.bam import write_bam
    from clair3_tpu.io.fasta import write_fasta
    from clair3_tpu.testing import simulate_reads

    refs = {
        "chr1": random_reference(1500, seed=41),
        "chr2": random_reference(1200, seed=42),
    }
    all_reads = []
    truth = {}
    for tid, (name, ref) in enumerate(refs.items()):
        pos = 600 + tid * 100
        v = SimVariant(pos, ref[pos], "A" if ref[pos] != "A" else "G", (1, 1))
        truth[name] = v
        reads = simulate_reads(ref, [v], coverage=20, read_length=500,
                               seed=41 + tid, contig=name)
        for r in reads:
            r.tid = tid
        all_reads.extend(reads)
    all_reads.sort(key=lambda r: (r.tid, r.pos))
    fasta = str(tmp_path / "ref.fa")
    write_fasta(fasta, refs)
    bam = str(tmp_path / "r.bam")
    write_bam(bam, list(refs), [len(refs[n]) for n in refs], all_reads)

    cfg = CallConfig(platform="ont", bam_fn=bam, ref_fn=fasta,
                     output_dir=str(tmp_path / "out"), pileup_only=True,
                     gvcf=True)
    outputs = VariantCaller(cfg, pileup_engine=PileupOracleEngine()).run()
    recs = _records(outputs["merge_output"])
    by_key = {(r.chrom, r.pos): r for r in recs}
    for name, v in truth.items():
        assert (name, v.pos + 1) in by_key
        assert by_key[(name, v.pos + 1)].alt == v.alt
    # contig-ordered output
    chroms = [r.chrom for r in recs]
    assert chroms == sorted(chroms, key=lambda c: list(refs).index(c))

    # gVCF: per-contig interleaving, positions monotone within contig
    from clair3_tpu.io.bgzf import decompress
    body = [l for l in decompress(outputs["merge_output_gvcf"]).decode().splitlines()
            if l and not l.startswith("#")]
    seen = {}
    order = []
    for line in body:
        c, p = line.split("\t")[:2]
        if c not in seen:
            seen[c] = []
            order.append(c)
        seen[c].append(int(p))
    assert order == list(refs)
    for c, ps in seen.items():
        assert ps == sorted(ps), f"unsorted gVCF rows in {c}"
    # both variants present in the gVCF
    assert sum(1 for l in body if ",<NON_REF>" in l.split("\t")[4]) == 2


def test_haploid_precise_pipeline(case, tmp_path):
    """--haploid_precise drops het calls end to end."""
    cfg = CallConfig(
        platform="ont", bam_fn=case["bam"], ref_fn=case["fasta"],
        output_dir=str(tmp_path / "out"), pileup_only=True,
        haploid_precise=True,
    )
    outputs = VariantCaller(cfg, pileup_engine=PileupOracleEngine()).run()
    recs = _records(outputs["merge_output"])
    gts = {r.sample.split(":")[0] for r in recs}
    assert gts <= {"1"}  # hom calls rewritten to haploid; hets dropped
    by_pos = {r.pos: r for r in recs}
    assert 501 in by_pos and 1101 in by_pos      # hom SNP + hom ins kept
    assert 801 not in by_pos and 1401 not in by_pos  # het calls dropped


def test_long_indel_pipeline(tmp_path):
    """--enable_long_indel calls a 60bp deletion (beyond the 50bp default)."""
    ref = random_reference(2000, seed=13)
    dlen = 60
    v = SimVariant(800, ref[800:800 + dlen + 1], ref[800], (1, 1))
    fasta, bam, _, _ = write_test_case(
        str(tmp_path), ref_length=2000, variants=[v], coverage=25,
        read_length=700, seed=13)
    base = dict(platform="ont", bam_fn=bam, ref_fn=fasta, pileup_only=True)
    # without the flag the deletion allele cannot be materialized
    cfg0 = CallConfig(output_dir=str(tmp_path / "o0"), **base)
    out0 = VariantCaller(cfg0, pileup_engine=PileupOracleEngine()).run()
    assert all(len(r.ref) <= 51 for r in _records(out0["merge_output"]))
    # with it, the 60bp deletion comes out
    cfg1 = CallConfig(output_dir=str(tmp_path / "o1"), enable_long_indel=True, **base)
    out1 = VariantCaller(cfg1, pileup_engine=PileupOracleEngine()).run()
    by_pos = {r.pos: r for r in _records(out1["merge_output"])}
    assert 801 in by_pos
    assert by_pos[801].ref == v.ref and by_pos[801].alt == v.alt


def test_bounded_map_order_and_window():
    """_bounded_map must yield results in submission order while never
    holding more than `window` futures in flight."""
    import threading
    import time as _t
    from concurrent.futures import ThreadPoolExecutor

    from clair3_tpu.pipeline.call import VariantCaller

    in_flight = 0
    peak = 0
    lock = threading.Lock()

    def work(x):
        nonlocal in_flight, peak
        with lock:
            in_flight += 1
            peak = max(peak, in_flight)
        _t.sleep(0.01 * ((x % 3) + 1))  # jitter completion order
        with lock:
            in_flight -= 1
        return x * x

    items = list(range(20))
    with ThreadPoolExecutor(max_workers=4) as pool:
        got = list(VariantCaller._bounded_map(pool, work, items, window=5))
    assert [i for i, _ in got] == items
    assert [r for _, r in got] == [i * i for i in items]
    assert peak <= 5


def test_sequence_entropy_scoring():
    from clair3_tpu.pipeline.select import sequence_entropy

    homopolymer = "A" * 33
    repeat = "AT" * 16 + "A"
    complex_seq = "ACGTTGCAGGCTAACGTAGCTTAGCAACGGTCA"
    assert sequence_entropy(homopolymer) == 0.0
    assert sequence_entropy(repeat) < 0.3
    assert sequence_entropy(complex_seq) > 0.8
    assert sequence_entropy("ACG") == 0.0  # shorter than one k-mer pair


def test_select_candidates_low_entropy_routing():
    """--call_low_seq_entropy must add the lowest-entropy candidate windows
    to the FA set even when their QUAL clears the cutoffs
    (reference: SelectCandidates.py:222-233)."""
    from clair3_tpu.pipeline.select import select_candidates

    # high-qual variants (above cutoff -> not routed by qual) at positions
    # with contrasting window complexity; the homopolymer is slightly
    # lower-qual so it lands in the entropy-scoring pool
    import random as _r

    rng = _r.Random(4)
    windows = {300: "A" * 33}
    quals = {300: 29.0}
    for p in range(400, 1000, 100):
        windows[p] = "".join(rng.choice("ACGT") for _ in range(33))
        quals[p] = 30.0
    rows = [
        parse_vcf_line(f"chr1\t{p}\t.\tA\tT\t{quals[p]:.2f}\tPASS\tP\tGT:GQ:DP:AD:AF\t0/1:30:30:15,15:0.5")
        for p in windows
    ]
    batches = select_candidates(
        rows, "chr1", var_qual_cutoff=5.0, ref_qual_cutoff=5.0,
        call_low_seq_entropy=True, seq_entropy_pro=0.34, var_pct_full=0.3,
        fetch_window=lambda p: windows[p])
    assert len(batches) == 1
    assert batches[0].positions == [300]  # only the homopolymer window
    # off: nothing routed (all quals above cutoff)
    assert select_candidates(rows, "chr1", 5.0, 5.0) == []


def test_stats_select_path_matches_record_path():
    """The WGS-scale array-based routing (collect_pileup_stats +
    select_*_from_stats) must produce identical cutoffs, het-SNP sets and
    candidate batches to the VcfRecord-based functions."""
    import random

    from clair3_tpu.io.vcf import parse_vcf_line
    from clair3_tpu.pipeline.select import (
        collect_pileup_stats, select_candidates, select_candidates_from_stats,
        select_het_snps, select_het_snps_from_stats, select_phase_qual,
        select_phase_qual_from_stats, select_qual, select_qual_from_stats)

    rng = random.Random(17)
    rows = []
    for ctg in ("chr1", "chr2"):
        pos = 50
        for _ in range(400):
            pos += rng.randint(5, 60)
            r = rng.random()
            if r < 0.35:
                ref, alt, gt = "A", ".", "0/0"
            elif r < 0.65:
                ref, alt, gt = "C", "T", rng.choice(["0/1", "1/0", "0|1"])
            elif r < 0.8:
                ref, alt, gt = "G", "A", "1/1"
            else:
                ref, alt, gt = "A", "ATT", "0/1"
            q = round(rng.uniform(0.2, 28), 4)
            rows.append(f"{ctg}\t{pos}\t.\t{ref}\t{alt}\t{q}\t.\t.\t"
                        f"GT:GQ:DP:AF:PS\t{gt}:{int(q)}:20:0.4:{pos}")
    records = [parse_vcf_line(r) for r in rows]
    stats = collect_pileup_stats(rows)

    assert select_qual_from_stats(stats, 0.3, 0.1) == \
        select_qual(records, 0.3, 0.1)
    assert select_phase_qual_from_stats(stats, 0.7) == \
        select_phase_qual(records, 0.7)

    pq = select_phase_qual(records, 0.7)
    for ctg in ("chr1", "chr2"):
        a = select_het_snps(records, pq, ctg)
        b = select_het_snps_from_stats(rows, stats, pq, ctg)
        assert [(r.pos, r.qual) for r in a] == [(r.pos, r.qual) for r in b]

    vq, rq = select_qual(records, 0.3, 0.1)
    phased = select_het_snps(records, pq, "chr1")
    for ctg in ("chr1", "chr2"):
        a = select_candidates(records, ctg, vq, rq, phased_rows=phased,
                              split_bed_size=37)
        b = select_candidates_from_stats(stats, ctg, vq, rq,
                                         phased_rows=phased,
                                         split_bed_size=37)
        assert [(x.contig, x.positions, x.phased_snps) for x in a] == \
            [(x.contig, x.positions, x.phased_snps) for x in b]


def test_rowpack_cutoffs_match_stats_path():
    """The multi-host rowpack quantiles (stats_rowpack + cutoffs_from_rowpack,
    used after gather_rowpack in dist mode) must equal the single-process
    cutoffs, including when the pack carries duplicated chunk-boundary rows
    (deduped by (ctg, pos))."""
    import random

    import numpy as np

    from clair3_tpu.pipeline.select import (
        collect_pileup_stats, cutoffs_from_rowpack, select_phase_qual_from_stats,
        select_qual_from_stats, stats_rowpack)

    rng = random.Random(23)
    rows = []
    for ctg in ("chr1", "chr2"):
        pos = 50
        for _ in range(300):
            pos += rng.randint(5, 60)
            r = rng.random()
            if r < 0.35:
                ref, alt, gt = "A", ".", "0/0"
            elif r < 0.7:
                ref, alt, gt = "C", "T", rng.choice(["0/1", "1/0"])
            else:
                ref, alt, gt = "G", "A", "1/1"
            q = round(rng.uniform(0.2, 28), 4)
            rows.append(f"{ctg}\t{pos}\t.\t{ref}\t{alt}\t{q}\t.\t.\t"
                        f"GT:GQ\t{gt}:{int(q)}")
    stats = collect_pileup_stats(rows)
    pack = stats_rowpack(stats, ["chr1", "chr2"])

    want_v, want_r = select_qual_from_stats(stats, 0.3, 0.1)
    want_p = select_phase_qual_from_stats(stats, 0.7)
    got = cutoffs_from_rowpack(*pack, 0.3, 0.1, 0.7)
    assert got == (want_v, want_r, want_p)

    # duplicate a slice (chunk-boundary rows arrive from both owners)
    dup = tuple(np.concatenate([a, a[100:140]]) for a in pack)
    assert cutoffs_from_rowpack(*dup, 0.3, 0.1, 0.7) == got


def test_rowpack_cutoffs_reject_divergent_duplicates():
    """A duplicate (ctg, pos) whose qual/flags DISAGREE across processes
    (chunk-boundary extraction divergence) must raise, not silently pick
    whichever owner's row np.unique saw first."""
    import numpy as np
    import pytest

    from clair3_tpu.pipeline.select import cutoffs_from_rowpack

    ctg = np.array([0, 0, 0], np.uint32)
    pos = np.array([100, 200, 200], np.uint32)
    qual = np.array([5.0, 9.0, 9.5], np.float64)  # pos 200 disagrees
    flags = np.array([0, 1, 1], np.uint32)
    with pytest.raises(ValueError, match="duplicate rows disagree"):
        cutoffs_from_rowpack(ctg, pos, qual, flags, 0.3, 0.1, 0.7)
    # flags-only divergence must also raise
    qual2 = np.array([5.0, 9.0, 9.0], np.float64)
    flags2 = np.array([0, 1, 0], np.uint32)
    with pytest.raises(ValueError, match="duplicate rows disagree"):
        cutoffs_from_rowpack(ctg, pos, qual2, flags2, 0.3, 0.1, 0.7)
