"""Command-line interface.

``python -m clair3_tpu call ...`` mirrors the reference's run_clair3.py arg
surface (reference: run_clair3.py:24-92); submodule-style entry points for
training workflows hang off the same parser (like clair3.py's dispatcher).
"""

from __future__ import annotations

import argparse
import logging
import sys


def _add_call_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--bam_fn", required=True, help="Sorted BAM input")
    p.add_argument("--ref_fn", required=True, help="Reference FASTA input")
    p.add_argument("--output", "--output_dir", dest="output_dir", required=True)
    p.add_argument("--platform", default="ont", choices=("ont", "hifi", "ilmn"))
    p.add_argument("--model_path", default=None,
                   help="Directory containing pileup.{npz,pt} and full_alignment.{npz,pt}")
    p.add_argument("--pileup_model", default=None)
    p.add_argument("--full_alignment_model", default=None)
    p.add_argument("--sample_name", default="SAMPLE")
    p.add_argument("--ctg_name", default=None)
    p.add_argument("--bed_fn", default=None)
    p.add_argument("--vcf_fn", default=None)
    p.add_argument("--threads", type=int, default=4)
    p.add_argument("--qual", type=int, default=None)
    p.add_argument("--snp_min_af", type=float, default=None)
    p.add_argument("--indel_min_af", type=float, default=None)
    p.add_argument("--var_pct_full", type=float, default=None)
    p.add_argument("--ref_pct_full", type=float, default=None)
    p.add_argument("--var_pct_phasing", type=float, default=None)
    p.add_argument("--chunk_size", type=int, default=5_000_000)
    p.add_argument("--pileup_only", action="store_true")
    p.add_argument("--print_ref_calls", action="store_true")
    p.add_argument("--gvcf", action="store_true")
    p.add_argument("--haploid_precise", action="store_true")
    p.add_argument("--haploid_sensitive", action="store_true")
    p.add_argument("--enable_long_indel", action="store_true")
    p.add_argument("--enable_dwell_time", action="store_true")
    p.add_argument("--call_snp_only", action="store_true")
    p.add_argument("--no_phasing_for_fa", action="store_true")
    p.add_argument("--keep_iupac_bases", action="store_true")
    p.add_argument("--enable_variant_calling_at_sequence_head_and_tail",
                   action="store_true")
    p.add_argument("--use_oracle_engines", action="store_true",
                   help="TESTING: use tensor-sniffing oracle predictors instead of models")


def _load_engine(path: str, kind: str, platform: str):
    import jax.numpy as jnp

    from clair3_tpu.config import PLATFORMS
    from clair3_tpu.models import FullAlignmentNet, PileupNet
    from clair3_tpu.models.convert import convert_checkpoint
    from clair3_tpu.models.params_io import load_variables
    from clair3_tpu.pipeline.engine import InferenceEngine

    if path.endswith(".pt"):
        variables = convert_checkpoint(path, kind)
    else:
        variables = load_variables(path)
    params = variables["params"]
    if kind == "pileup":
        add_indel = "L5_3" in params
        model = PileupNet(add_indel_length=add_indel)
    else:
        in_ch = params["conv1"]["conv"]["kernel"].shape[2]
        model = FullAlignmentNet(add_indel_length=True, input_channels=in_ch)
    return InferenceEngine(model, variables)


def cmd_call(args: argparse.Namespace) -> int:
    import os

    from clair3_tpu.config import CallConfig
    from clair3_tpu.pipeline.call import VariantCaller

    cfg = CallConfig(
        platform=args.platform,
        bam_fn=args.bam_fn,
        ref_fn=args.ref_fn,
        output_dir=args.output_dir,
        sample_name=args.sample_name,
        ctg_name=args.ctg_name,
        bed_fn=args.bed_fn,
        vcf_fn=args.vcf_fn,
        threads=args.threads,
        qual=args.qual,
        snp_min_af=args.snp_min_af,
        indel_min_af=args.indel_min_af,
        var_pct_full=args.var_pct_full,
        ref_pct_full=args.ref_pct_full,
        var_pct_phasing=args.var_pct_phasing,
        chunk_size=args.chunk_size,
        pileup_only=args.pileup_only,
        print_ref_calls=args.print_ref_calls,
        gvcf=args.gvcf,
        haploid_precise=args.haploid_precise,
        haploid_sensitive=args.haploid_sensitive,
        enable_long_indel=args.enable_long_indel,
        enable_dwell_time=args.enable_dwell_time,
        call_snp_only=args.call_snp_only,
        no_phasing_for_fa=args.no_phasing_for_fa,
        keep_iupac_bases=args.keep_iupac_bases,
        enable_variant_calling_at_sequence_head_and_tail=(
            args.enable_variant_calling_at_sequence_head_and_tail),
    )

    if args.use_oracle_engines:
        from clair3_tpu.testing import FullAlignmentOracleEngine, PileupOracleEngine

        pileup_engine = PileupOracleEngine()
        fa_engine = None if args.pileup_only else FullAlignmentOracleEngine()
    else:
        pileup_path = args.pileup_model
        fa_path = args.full_alignment_model
        if args.model_path:
            for ext in (".npz", ".pt"):
                cand = os.path.join(args.model_path, "pileup" + ext)
                if pileup_path is None and os.path.exists(cand):
                    pileup_path = cand
                cand = os.path.join(args.model_path, "full_alignment" + ext)
                if fa_path is None and os.path.exists(cand):
                    fa_path = cand
        if pileup_path is None:
            print("[ERROR] no pileup model given (--pileup_model / --model_path)",
                  file=sys.stderr)
            return 1
        pileup_engine = _load_engine(pileup_path, "pileup", args.platform)
        fa_engine = None
        if not args.pileup_only:
            if fa_path is None:
                print("[ERROR] no full-alignment model given "
                      "(--full_alignment_model / --model_path)", file=sys.stderr)
                return 1
            fa_engine = _load_engine(fa_path, "full_alignment", args.platform)

    caller = VariantCaller(cfg, pileup_engine=pileup_engine, fa_engine=fa_engine)
    outputs = caller.run()
    for name, path in outputs.items():
        print(f"[INFO] {name}: {path}")
    return 0


def main(argv=None) -> int:
    logging.basicConfig(format="%(message)s", level=logging.INFO)
    parser = argparse.ArgumentParser(
        prog="clair3_tpu",
        description="TPU-native germline small-variant caller",
    )
    sub = parser.add_subparsers(dest="command", required=True)
    call_p = sub.add_parser("call", help="Run the two-stage calling cascade")
    _add_call_args(call_p)
    call_p.set_defaults(func=cmd_call)

    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    raise SystemExit(main())
