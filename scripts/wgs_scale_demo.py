#!/usr/bin/env python
"""WGS-scale soak: multi-contig, 30x, gVCF-on end-to-end run with peak-RSS
and per-stage wall-clock accounting.

The reference's operating point is 3 Gb x 30-70x (docs/v0.1_r11_speedup.md);
this script proves the single-process pipeline holds up at tens of Mbases
on one host: bounded memory (the bounded extraction prefetch), stage
timings, and contig-ordered indexed outputs.

    python scripts/wgs_scale_demo.py --mbases 50 --contigs 3 --coverage 30

Simulation streams per 2 Mb segment through a generator into the BAM
writer, so building the 50 Mb x 30x input itself stays in bounded memory.
"""

import argparse
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from clair3_tpu.config import CallConfig  # noqa: E402
from clair3_tpu.io.vcf import VcfReader  # noqa: E402
from clair3_tpu.testing import (  # noqa: E402
    FullAlignmentOracleEngine,
    PileupOracleEngine,
    SimVariant,
    random_reference,
    simulate_reads,
)

SEG = 2_000_000  # simulation segment (bounds sim memory)


def peak_rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def build_input(out_dir: str, mbases: float, contigs: int, coverage: int,
                read_length: int, error_rate: float, seed: int):
    """Multi-contig FASTA + coordinate-sorted indexed BAM + truth list,
    streamed segment by segment."""
    from clair3_tpu.io.bam import write_bam

    per_ctg = int(mbases * 1e6 / contigs)
    names = [f"chr{i + 1}" for i in range(contigs)]
    lengths = [per_ctg] * contigs
    fasta = os.path.join(out_dir, "ref.fa")
    truth = []
    refs = {}
    with open(fasta, "w") as f:
        for ci, name in enumerate(names):
            seq = random_reference(per_ctg, seed=seed + ci)
            refs[name] = seq
            f.write(f">{name}\n")
            for off in range(0, per_ctg, 80):
                f.write(seq[off: off + 80] + "\n")

    def variants_for(name, seq, ci):
        out = []
        for p in range(500, per_ctg - 500, 1500):
            # NOT p % 3: the 1500 step is 0 mod 3, which made every
            # variant the same kind (pre-r03 the soak was all-deletions)
            kind = (p // 1500) % 3
            if kind == 0:
                out.append(SimVariant(p, seq[p], "G" if seq[p] != "G" else "T",
                                      (0, 1) if p % 2 else (1, 1)))
            elif kind == 1:
                out.append(SimVariant(p, seq[p], seq[p] + "AC", (0, 1)))
            else:
                out.append(SimVariant(p, seq[p:p + 3], seq[p], (1, 1)))
        return out

    all_variants = {}
    for ci, name in enumerate(names):
        vs = variants_for(name, refs[name], ci)
        all_variants[name] = vs
        truth.extend((name, v) for v in vs)

    def read_stream():
        for ci, name in enumerate(names):
            seq = refs[name]
            vs = all_variants[name]
            for lo in range(0, per_ctg, SEG):
                hi = min(per_ctg, lo + SEG)
                # margin so segment-boundary reads exist exactly once
                seg_vs = [SimVariant(v.pos - lo, v.ref, v.alt, v.genotype)
                          for v in vs if lo <= v.pos < hi]
                reads = simulate_reads(
                    seq[lo:hi], seg_vs, coverage=coverage,
                    read_length=read_length, seed=seed + ci * 1000 + lo,
                    error_rate=error_rate, contig=name)
                for r in reads:
                    r = type(r)(r.qname + f".{ci}.{lo}", r.flag, ci,
                                r.pos + lo, r.mapq, r.cigar, r.seq, r.qual,
                                r.tags)
                    yield r

    bam = os.path.join(out_dir, "reads.bam")
    write_bam(bam, names, lengths, read_stream())
    return fasta, bam, names, truth


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbases", type=float, default=50.0)
    ap.add_argument("--contigs", type=int, default=3)
    ap.add_argument("--coverage", type=int, default=30)
    ap.add_argument("--read_length", type=int, default=5000)
    ap.add_argument("--error_rate", type=float, default=0.02)
    ap.add_argument("--output", default="wgs_soak_out")
    ap.add_argument("--threads", type=int, default=2)
    ap.add_argument("--max_rss_gb", type=float, default=8.0,
                    help="fail if peak RSS exceeds this")
    args = ap.parse_args()

    os.makedirs(args.output, exist_ok=True)
    t0 = time.time()
    print(f"[soak] simulating {args.mbases} Mb x {args.coverage}x over "
          f"{args.contigs} contigs ...", flush=True)
    fasta, bam, names, truth = build_input(
        args.output, args.mbases, args.contigs, args.coverage,
        args.read_length, args.error_rate, seed=7)
    t_sim = time.time() - t0
    print(f"[soak] simulation: {t_sim:.0f}s, BAM "
          f"{os.path.getsize(bam) / 1e6:.0f} MB, RSS {peak_rss_gb():.2f} GB",
          flush=True)

    cfg = CallConfig(
        platform="ont", bam_fn=bam, ref_fn=fasta,
        output_dir=os.path.join(args.output, "call"),
        gvcf=True, no_phasing_for_fa=True, threads=args.threads,
        var_pct_full=0.3, ref_pct_full=0.1,
    )
    from clair3_tpu.pipeline.call import VariantCaller

    caller = VariantCaller(cfg, pileup_engine=PileupOracleEngine(),
                           fa_engine=FullAlignmentOracleEngine())
    t1 = time.time()
    outputs = caller.run()
    t_call = time.time() - t1
    rss = peak_rss_gb()
    print(f"[soak] calling: {t_call:.0f}s "
          f"({args.mbases / max(t_call, 1e-9) * 60:.1f} Mb/min), "
          f"peak RSS {rss:.2f} GB", flush=True)
    print(f"[soak] stage times: "
          f"{ {k: round(v, 1) for k, v in caller.stage_times.items()} }",
          flush=True)

    # --- verification ---
    recs = list(VcfReader(outputs["merge_output"]))
    # contig-ordered output
    order = {n: i for i, n in enumerate(names)}
    keys = [(order[r.chrom], r.pos) for r in recs]
    assert keys == sorted(keys), "output not contig-ordered"
    # indexed
    assert os.path.exists(outputs["merge_output"] + ".tbi"), "missing .tbi"
    assert "merge_output_gvcf" in outputs, "gVCF missing"
    # recall of simulated variants
    called = {(r.chrom, r.pos) for r in recs}
    hits = sum(1 for ctg, v in truth if (ctg, v.pos + 1) in called)
    recall = hits / max(len(truth), 1)
    print(f"[soak] truth sites: {len(truth)}, called rows: {len(recs)}, "
          f"site recall: {recall:.4f}", flush=True)
    # precision / recall / F1, genotype-exact, per variant class
    from clair3_tpu.io.vcf import VcfRecord
    from clair3_tpu.postprocess import variant_metrics

    truth_recs = [
        VcfRecord(ctg, v.pos + 1, v.ref, v.alt, 60, "PASS", ".", "GT",
                  "1/1" if tuple(sorted(v.genotype)) == (1, 1) else "0/1")
        for ctg, v in truth
    ]
    m = variant_metrics(truth_recs, recs)
    header = ["VariantType", "FP", "FN", "TP", "Precision", "Recall", "F1-score"]
    print("".join(h.ljust(13) for h in header))
    for vt in ("SNP", "INDEL"):
        r = m[vt]
        print("".join(str(x).ljust(13) for x in (
            vt, r.query_fp, r.truth_fn, r.truth_tp, r.precision, r.recall,
            r.f1)), flush=True)
    assert recall >= 0.95, f"recall {recall:.3f} too low"
    assert m["SNP"].f1 >= 0.95, f"SNP F1 {m['SNP'].f1} too low"
    assert m["INDEL"].f1 >= 0.90, f"INDEL F1 {m['INDEL'].f1} too low"
    assert rss <= args.max_rss_gb, f"peak RSS {rss:.2f} GB > {args.max_rss_gb}"
    print(f"[soak] OK — total {time.time() - t0:.0f}s, peak RSS {rss:.2f} GB")


if __name__ == "__main__":
    main()
