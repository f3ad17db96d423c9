"""Command-line interface.

``python -m clair3_tpu call ...`` mirrors the reference's run_clair3.py arg
surface (reference: run_clair3.py:24-92); submodule-style entry points for
training workflows hang off the same parser (like clair3.py's dispatcher).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from typing import Optional


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
    p.add_argument("--qual", type=int, default=2,
                   help="mark variants with QUAL<=N as LowQual (reference default 2)")
    p.add_argument("--snp_min_af", type=float, default=None)
    p.add_argument("--indel_min_af", type=float, default=None)
    p.add_argument("--var_pct_full", type=float, default=None)
    p.add_argument("--ref_pct_full", type=float, default=None)
    p.add_argument("--var_pct_phasing", type=float, default=None)
    p.add_argument("--chunk_size", type=int, default=5_000_000)
    p.add_argument("--chunk_num", type=int, default=None,
                   help="override: split each contig into N chunks "
                        "(<=0 = one chunk per contig)")
    p.add_argument("--min_mq", type=int, default=5)
    p.add_argument("--min_coverage", type=int, default=2)
    p.add_argument("--min_contig_size", type=int, default=0)
    p.add_argument("--base_err", type=float, default=0.001)
    p.add_argument("--gq_bin_size", type=int, default=5)
    p.add_argument("--pileup_model_prefix", default="pileup")
    p.add_argument("--fa_model_prefix", default="full_alignment")
    p.add_argument("--pileup_only", action="store_true")
    p.add_argument("--print_ref_calls", action="store_true")
    p.add_argument("--gvcf", action="store_true")
    p.add_argument("--haploid_precise", action="store_true")
    p.add_argument("--haploid_sensitive", action="store_true")
    p.add_argument("--enable_long_indel", action="store_true")
    p.add_argument("--enable_dwell_time", action="store_true")
    p.add_argument("--call_snp_only", action="store_true")
    p.add_argument("--fast_mode", action="store_true",
                   help="ONT: skip variants with <=0.15 AF or <4x coverage "
                        "(reference: CreateTensorPileupFromCffi.py:276-278)")
    p.add_argument("--include_all_ctgs", action="store_true",
                   help="call on all contigs, not just chr{1..22,X,Y} and "
                        "{1..22,X,Y} (reference: CheckEnvs.py:288-292)")
    p.add_argument("--remove_intermediate_dir", action="store_true",
                   help="remove intermediate files (tmp/) after a "
                        "successful run")
    p.add_argument("--output_all_contigs_in_gvcf_header", action="store_true",
                   help="gVCF header lists every reference contig instead "
                        "of only the called ones")
    p.add_argument("--disable_c_impl", action="store_true",
                   help="use the pure-Python extractors/decoders instead of "
                        "the native C++ fast paths (differential debugging)")
    p.add_argument("--call_low_seq_entropy", action="store_true",
                   help="also route the lowest-entropy (repetitive) windows "
                        "to full-alignment re-calling")
    p.add_argument("--seq_entropy_pro", type=float, default=0.05)
    p.add_argument("--no_phasing_for_fa", action="store_true")
    p.add_argument("--keep_iupac_bases", action="store_true")
    p.add_argument("--enable_variant_calling_at_sequence_head_and_tail",
                   action="store_true")
    p.add_argument("--use_oracle_engines", action="store_true",
                   help="TESTING: use tensor-sniffing oracle predictors instead of models")
    p.add_argument("--remote_engines", default=None, metavar="URL",
                   help="run forward passes on a `clair3_tpu serve` engine "
                        "server (e.g. http://tpu-host:8618); no local "
                        "models needed")
    p.add_argument("--use_phasing_for_final_output", action="store_true",
                   help="phase the final merged VCF (internal phaser)")
    # external-phaser interop (reference run_clair3.py:116-117,148-150):
    # internal read-backed phasing is the default; these route the
    # intermediate phasing stage through a whatshap/longphase subprocess
    p.add_argument("--use_whatshap_for_intermediate_phasing",
                   action="store_true",
                   help="phase intermediate het SNPs with an external "
                        "whatshap subprocess instead of the internal phaser")
    p.add_argument("--use_longphase_for_intermediate_phasing",
                   action="store_true",
                   help="phase intermediate het SNPs with an external "
                        "longphase subprocess instead of the internal phaser")
    p.add_argument("--whatshap", default="whatshap",
                   help="path to the whatshap binary")
    p.add_argument("--longphase", default="longphase",
                   help="path to the longphase binary")
    p.add_argument("--use_haplotagging_for_final_output", action="store_true",
                   help="also write an HP/PS-tagged BAM (phased_output.bam)")
    p.add_argument("--compute_dtype", default="auto",
                   choices=("auto", "fp32", "bf16"),
                   help="inference compute dtype; auto = bf16 on TPU "
                        "(benchmarked production config), fp32 elsewhere")
    p.add_argument("--output_probabilities_fn", default=None,
                   help="DEBUG: dump raw head probabilities per candidate")
    p.add_argument("--debug", action="store_true",
                   help="DEBUG: print raw head probabilities per candidate "
                        "to stdout instead of emitting VCF rows "
                        "(reference CallVariants --debug)")
    p.add_argument("--profile_dir", default=None,
                   help="write a jax.profiler trace of the run to this directory")
    # multi-host (pod slice) execution: every process runs this same
    # command; chunks are strided across processes and each writes
    # {output}/proc{i}; merge the per-process VCFs with `sort_vcf`
    p.add_argument("--dist_coordinator", default=None,
                   help="coordinator address host:port of process 0 "
                        "(omit on TPU pod slices with runtime bootstrap)")
    p.add_argument("--dist_num_processes", type=int, default=None)
    p.add_argument("--dist_process_id", type=int, default=None)


def resolve_compute_dtype(choice: str = "auto"):
    """Production compute dtype: bf16 on TPU (the benchmarked configuration;
    parity vs f32 is asserted by tests/test_bf16_parity.py), f32 elsewhere.
    Override with --compute_dtype or CLAIR3T_COMPUTE_DTYPE."""
    import os

    import jax
    import jax.numpy as jnp

    choice = (choice or "auto").lower()
    if choice == "auto":  # env override applies only when the flag is auto:
        # an explicit --compute_dtype must win over a leftover export
        choice = os.environ.get("CLAIR3T_COMPUTE_DTYPE", "auto").lower()
    if choice in ("fp32", "f32", "float32"):
        return jnp.float32
    if choice in ("bf16", "bfloat16"):
        return jnp.bfloat16
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def _use_pallas_lstm(compute_dtype) -> bool:
    """The Pallas recurrence kernel ships only where it is compiled-tested:
    real TPU + bf16 (the Mosaic pipeline rejects the f32 variant).
    CLAIR3T_DISABLE_PALLAS=1 routes back to the lax.scan path."""
    import os

    import jax
    import jax.numpy as jnp

    if os.environ.get("CLAIR3T_DISABLE_PALLAS"):
        return False
    return (jax.default_backend() == "tpu"
            and compute_dtype == jnp.bfloat16)


def _use_pallas_fa_conv1(compute_dtype) -> bool:
    """The FA banded-matmul conv1 kernel (ops/pallas_fa.py) is an opt-in
    EXPERIMENT (CLAIR3T_ENABLE_FA_CONV1=1), not the default.

    Measured on the real v5e (scripts/bench_fa_conv1.py, staged-batch
    full-output-sum loop): XLA's own conv1 is 0.52 us/sample — 14% of the
    3.58 us/sample net, NOT the 38% a round-4 profile claimed under a
    dead-code-prone measurement loop — and the banded-matmul kernel runs
    1.49 us/sample (~3x slower; the band spends 792 reduction rows where
    the conv needs 72 MACs, an 11x FLOP premium XLA's native conv never
    pays).  The full FA net already sustains ~64% MFU under plain XLA
    (0.45 GFLOP/sample at 279k samples/s vs the 197 TFLOP/s bf16 peak), so
    conv1 is not a lever.  The kernel compiles and is numerically exact on
    all four geometries (tests/test_pallas_fa.py, on-chip compile check),
    and is retained as a documented negative result."""
    import os

    import jax
    import jax.numpy as jnp

    if os.environ.get("CLAIR3T_DISABLE_PALLAS"):
        return False
    return (os.environ.get("CLAIR3T_ENABLE_FA_CONV1") == "1"
            and jax.default_backend() == "tpu"
            and compute_dtype == jnp.bfloat16)


def _reconcile_dwell(fa_engine, cfg) -> None:
    """Match the extractor's dwell channel to the model's input width
    (reference auto-detects dwell from '*_with_mv' model names,
    run_clair3.py:414-430; we read the served/loaded conv1 width)."""
    fa_in = getattr(fa_engine, "fa_input_channels", None)
    if fa_in is not None and fa_in != cfg.fa_channels:
        want_dwell = fa_in == 9
        print(f"[INFO] full-alignment model expects {fa_in} input "
              f"channels; {'enabling' if want_dwell else 'disabling'} "
              "the dwell channel to match", file=sys.stderr)
        cfg.enable_dwell_time = want_dwell


def resolve_model_file(model_path: str, prefix: str) -> Optional[str]:
    """First existing {model_path}/{prefix}.{npz,pt}; shared by `call` and
    `serve` so both resolve the same checkpoint for the same directory."""
    for ext in (".npz", ".pt"):
        cand = os.path.join(model_path, prefix + ext)
        if os.path.exists(cand):
            return cand
    return None


def _load_engine(path: str, kind: str, platform: str,
                 compute_dtype: str = "auto"):
    import numpy as np

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
    dt = resolve_compute_dtype(compute_dtype)
    if kind == "pileup":
        add_indel = "L5_3" in params
        model = PileupNet(add_indel_length=add_indel, compute_dtype=dt,
                          use_pallas_lstm=_use_pallas_lstm(dt))
        # int16 halves the host->device copy (counts are bounded by
        # ~1.5x max_depth after the high-coverage rescale); pileup_compact
        # halves it again (uint8 magnitudes + negated-ref-channel index,
        # ops/pileup_compact.py; structure-validated per batch, dense
        # fallback on violation)
        engine = InferenceEngine(model, variables, transfer_dtype=np.int16,
                                 pileup_compact=True)
    else:
        in_ch = params["conv1"]["conv"]["kernel"].shape[2]
        model = FullAlignmentNet(add_indel_length=True, input_channels=in_ch,
                                 compute_dtype=dt,
                                 use_pallas_conv1=_use_pallas_fa_conv1(dt))
        # depth_crop: ship only the centered nonzero depth band (FA tensors
        # are center-padded; ~2x fewer host->device bytes at 30x coverage);
        # fa_compact: lossless sparse decomposition, ~3.7x fewer bytes on
        # top (ops/fa_compact.py; structure-validated per batch, dense
        # fallback on violation)
        engine = InferenceEngine(model, variables, depth_crop=True,
                                 fa_compact=True)
        engine.fa_input_channels = in_ch
    return engine


def _validate_call_inputs(args) -> Optional[str]:
    """Input validation (reference: preprocess/CheckEnvs.py:180-388);
    returns an error string or None."""
    import os

    if not os.path.exists(args.bam_fn):
        return f"BAM/CRAM file not found: {args.bam_fn}"
    if not os.path.exists(args.ref_fn):
        return f"reference FASTA not found: {args.ref_fn}"
    is_cram = args.bam_fn.lower().endswith(".cram")
    with open(args.bam_fn, "rb") as fh:
        magic = fh.read(4)
        if is_cram:
            if magic != b"CRAM":
                return f"{args.bam_fn} is not a CRAM file"
        elif magic[:2] != b"\x1f\x8b":
            return f"{args.bam_fn} is not a BGZF/BAM file"
    if args.bed_fn and not os.path.exists(args.bed_fn):
        return f"BED file not found: {args.bed_fn}"
    if args.vcf_fn and not os.path.exists(args.vcf_fn):
        return f"known-sites VCF not found: {args.vcf_fn}"
    if args.threads < 1:
        return "--threads must be >= 1"
    try:
        from clair3_tpu.io.bam import BamReader
        from clair3_tpu.io.fasta import FastaFile

        fa = FastaFile(args.ref_fn)
        if is_cram:
            from clair3_tpu.io.cram import CramReader

            bam = CramReader(args.bam_fn, ref_fn=args.ref_fn)
        else:
            bam = BamReader(args.bam_fn)
        shared = set(fa.references) & set(bam.references)
        fa.close()
        if args.ctg_name:
            missing = [c for c in args.ctg_name.split(",") if c not in shared]
            if missing:
                return (f"contig(s) {','.join(missing)} absent from BAM+FASTA "
                        f"intersection (have: {sorted(shared)[:5]}...)")
        if not shared:
            return "no contigs shared between the BAM and the reference"
    except Exception as e:  # malformed inputs
        return f"failed to open inputs: {e}"
    return None


def cmd_call(args: argparse.Namespace) -> int:
    import os

    from clair3_tpu.config import CallConfig
    from clair3_tpu.pipeline.call import VariantCaller

    # before validation: --disable_c_impl must also govern the readers
    # the validators open (the flag exists to route around native code)
    if args.disable_c_impl:
        os.environ["CLAIR3T_DISABLE_NATIVE"] = "1"

    from clair3_tpu.utils.common import enable_compilation_cache

    enable_compilation_cache()

    # registry-known model names are validated before any input is opened
    # (fail-early, reference issue #437 spirit; run_clair3.py:323-326 for
    # the model-keyed var_pct_phasing default)
    if args.enable_dwell_time and args.platform != "ont":
        # reference run_clair3.py:433-437: dwell time is ONT-only
        print("[ERROR] --enable_dwell_time is not supported for non-ONT "
              "platforms", file=sys.stderr)
        return 1
    dwell_expected = args.enable_dwell_time
    if args.model_path:
        from clair3_tpu.models.zoo import (lookup_model, name_implies_dwell,
                                           validate_model_choice)

        zoo_info = lookup_model(args.model_path)
        if zoo_info is not None:
            err = validate_model_choice(zoo_info, args.platform)
            if err:
                print(f"[ERROR] {err}", file=sys.stderr)
                return 1
        model_dwell = (zoo_info.dwell if zoo_info is not None
                       else name_implies_dwell(args.model_path))
        if model_dwell and args.platform != "ont":
            # move-table models are ONT-only (reference run_clair3.py:419-425)
            name = os.path.basename(os.path.normpath(args.model_path))
            print(f"[ERROR] model '{name}' is a move-table (signal-aware) "
                  f"model and is ONT-only, but --platform is "
                  f"'{args.platform}'. Use --platform ont with ONT data, or "
                  "choose a non move-table model for this platform.",
                  file=sys.stderr)
            return 1
        if zoo_info is not None and (args.var_pct_phasing is None
                                     and zoo_info.var_pct_phasing is not None):
            args.var_pct_phasing = zoo_info.var_pct_phasing
        if model_dwell and not args.enable_dwell_time:
            name = os.path.basename(os.path.normpath(args.model_path))
            print(f"[INFO] '{name}' is a signal-aware "
                  "(*_with_mv) model: the dwell-time channel will be "
                  "enabled to match its 9-channel input (the reference "
                  "requires --enable_dwell_time here, issue #437); the "
                  "BAM must carry mv/ts basecaller tags",
                  file=sys.stderr)
        dwell_expected = dwell_expected or model_dwell

    err = _validate_call_inputs(args)
    if err:
        print(f"[ERROR] {err}", file=sys.stderr)
        return 1

    if dwell_expected and not args.bam_fn.endswith(".cram"):
        # the reference verifies the first 50 alignments actually carry a
        # usable mv tag and fails early otherwise (run_clair3.py:442-463,
        # issue #437) — without it a tagless BAM degrades silently to a
        # zero dwell channel
        from clair3_tpu.io.bam import probe_mv_tag

        has_mv, mv_no_value, checked = probe_mv_tag(args.bam_fn)
        if not has_mv:
            detail = ("an 'mv' tag was found without a valid value"
                      if mv_no_value else "no valid 'mv' tag was found")
            print(f"[ERROR] dwell time is enabled but within the first "
                  f"{checked} alignments {detail}. The 'mv' move table "
                  "(Dorado --emit-moves) is required for the dwell-time "
                  "channel; provide a tagged BAM or use a non move-table "
                  "model / drop --enable_dwell_time.", file=sys.stderr)
            return 1

    dist_id, dist_count = 0, 1
    if (args.dist_coordinator is not None
            or (args.dist_num_processes or 0) > 1):
        from clair3_tpu.parallel.distributed import init_distributed

        dist_id, dist_count = init_distributed(
            coordinator_address=args.dist_coordinator,
            num_processes=args.dist_num_processes,
            process_id=args.dist_process_id)
        if dist_count > 1:
            args.output_dir = os.path.join(args.output_dir, f"proc{dist_id}")
            print(f"[INFO] multi-host: process {dist_id}/{dist_count}, "
                  f"outputs -> {args.output_dir}; merge the per-process "
                  "VCFs afterwards with `clair3_tpu sort_vcf`",
                  file=sys.stderr)

    if args.debug and not args.pileup_only:
        # --debug prints head probabilities INSTEAD of VCF rows (reference
        # CallVariants semantics, per stage).  With zero pileup rows the
        # FA stage would receive no candidates and the cascade would write
        # empty outputs — make the per-stage scoping explicit instead.
        print("[INFO] --debug suppresses VCF rows (reference CallVariants "
              "semantics), so the full-alignment stage has no candidates "
              "to re-call; implying --pileup_only.  Debug the FA stage "
              "via `decode_probabilities --debug` on its dumped "
              "probabilities.", file=sys.stderr)
        args.pileup_only = True

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
        chunk_num=args.chunk_num,
        min_mq=args.min_mq,
        min_coverage=args.min_coverage,
        min_contig_size=args.min_contig_size,
        base_err=args.base_err,
        gq_bin_size=args.gq_bin_size,
        dist_process_id=dist_id,
        dist_process_count=dist_count,
        pileup_only=args.pileup_only,
        print_ref_calls=args.print_ref_calls,
        gvcf=args.gvcf,
        haploid_precise=args.haploid_precise,
        haploid_sensitive=args.haploid_sensitive,
        enable_long_indel=args.enable_long_indel,
        enable_dwell_time=args.enable_dwell_time,
        call_snp_only=args.call_snp_only,
        fast_mode=args.fast_mode,
        include_all_ctgs=args.include_all_ctgs,
        remove_intermediate_dir=args.remove_intermediate_dir,
        output_all_contigs_in_gvcf_header=args.output_all_contigs_in_gvcf_header,
        call_low_seq_entropy=args.call_low_seq_entropy,
        seq_entropy_pro=args.seq_entropy_pro,
        no_phasing_for_fa=args.no_phasing_for_fa,
        keep_iupac_bases=args.keep_iupac_bases,
        enable_variant_calling_at_sequence_head_and_tail=(
            args.enable_variant_calling_at_sequence_head_and_tail),
        use_phasing_for_final_output=args.use_phasing_for_final_output,
        use_haplotagging_for_final_output=args.use_haplotagging_for_final_output,
        output_probabilities_fn=args.output_probabilities_fn,
        debug=args.debug,
    )

    if args.use_oracle_engines:
        from clair3_tpu.testing import FullAlignmentOracleEngine, PileupOracleEngine

        pileup_engine = PileupOracleEngine()
        fa_engine = None if args.pileup_only else FullAlignmentOracleEngine()
    elif args.remote_engines:
        # forward passes on a serving TPU host (`clair3_tpu serve`); this
        # process only extracts/decodes (reference remote-inference analogue:
        # the Triton client mode, CallVariantsFromCffi.py:201-214)
        from clair3_tpu.serve import RemoteEngine

        try:
            pileup_engine = RemoteEngine(args.remote_engines, "pileup",
                                         platform=args.platform)
            fa_engine = None
            if not args.pileup_only:
                fa_engine = RemoteEngine(args.remote_engines,
                                         "full_alignment",
                                         platform=args.platform)
        except Exception as exc:
            print(f"[ERROR] {exc}", file=sys.stderr)
            return 1
        if fa_engine is not None:
            _reconcile_dwell(fa_engine, cfg)
    else:
        pileup_path = args.pileup_model
        fa_path = args.full_alignment_model
        if args.model_path:
            if pileup_path is None:
                pileup_path = resolve_model_file(args.model_path,
                                                 args.pileup_model_prefix)
            if fa_path is None:
                fa_path = resolve_model_file(args.model_path,
                                             args.fa_model_prefix)
        if pileup_path is None:
            print("[ERROR] no pileup model given (--pileup_model / --model_path)",
                  file=sys.stderr)
            return 1
        pileup_engine = _load_engine(pileup_path, "pileup", args.platform,
                                     compute_dtype=args.compute_dtype)
        fa_engine = None
        if not args.pileup_only:
            if fa_path is None:
                print("[ERROR] no full-alignment model given "
                      "(--full_alignment_model / --model_path)", file=sys.stderr)
                return 1
            fa_engine = _load_engine(fa_path, "full_alignment", args.platform,
                                     compute_dtype=args.compute_dtype)
            _reconcile_dwell(fa_engine, cfg)

    phaser = None
    if fa_engine is not None and not cfg.no_phasing_for_fa:
        if getattr(args, "use_whatshap_for_intermediate_phasing", False) or \
                getattr(args, "use_longphase_for_intermediate_phasing", False):
            from clair3_tpu.phase.external import ExternalPhaser

            tool = ("longphase"
                    if args.use_longphase_for_intermediate_phasing
                    else "whatshap")
            phaser = ExternalPhaser(
                tool, cfg.bam_fn, cfg.ref_fn, platform=cfg.platform,
                binary=getattr(args, tool, None), threads=cfg.threads,
                work_dir=cfg.output_dir, sample=cfg.sample_name)
        else:
            from clair3_tpu.phase import ReadBackedPhaser

            phaser = ReadBackedPhaser(cfg.bam_fn, min_mq=max(cfg.min_mq, 20))

    caller = VariantCaller(cfg, pileup_engine=pileup_engine, fa_engine=fa_engine,
                           phaser=phaser)
    if args.profile_dir:
        import jax

        with jax.profiler.trace(args.profile_dir):
            outputs = caller.run()
    else:
        outputs = caller.run()
    for name, path in outputs.items():
        print(f"[INFO] {name}: {path}")
    return 0


def cmd_tensor2bin(args: argparse.Namespace) -> int:
    """Create a labeled HDF5 training bin from a BAM + truth VCF
    (reference workflow: CreateTrainingTensorDirect + Tensor2Bin)."""
    from clair3_tpu.io.fasta import FastaFile
    from clair3_tpu.pileup.extractor import create_pileup_tensors
    from clair3_tpu.train.data import build_labels, truth_variants_from_vcf, write_bin

    fa = FastaFile(args.ref_fn)
    ctg = args.ctg_name or fa.references[0]
    end = args.ctg_end or fa.contig_length(ctg)
    fa.close()

    if args.pileup:
        tensors, pos_infos, alt_infos, _ = create_pileup_tensors(
            args.bam_fn, args.ref_fn, ctg, args.ctg_start, end,
            min_snp_af=args.snp_min_af, min_indel_af=args.indel_min_af)
    else:
        from clair3_tpu.config import PLATFORMS
        from clair3_tpu.train.data import TruthVariant  # noqa: F401
        from clair3_tpu.fullalign.extractor import create_fa_tensors
        from clair3_tpu.pileup.extractor import create_pileup_tensors as _cpt

        _, pos_infos_p, _, _ = _cpt(
            args.bam_fn, args.ref_fn, ctg, args.ctg_start, end,
            min_snp_af=args.snp_min_af, min_indel_af=args.indel_min_af)
        positions = [int(p.split(":")[-2]) for p in pos_infos_p]
        tensors, pos_infos, alt_infos = create_fa_tensors(
            args.bam_fn, args.ref_fn, ctg, positions,
            matrix_depth=PLATFORMS[args.platform].matrix_depth,
            no_phasing=True, enable_dwell=args.enable_dwell_time)

    truths = truth_variants_from_vcf(args.truth_vcf_fn, ctg)
    if args.unify_repr:
        from clair3_tpu.io.fasta import FastaFile as _FF
        from clair3_tpu.train.unify import CandidateAllele, unify_representation

        cands = []
        for pos_info, alt_info in zip(pos_infos, alt_infos):
            pos1 = int(pos_info.split(":")[-2])
            ref_base = pos_info.split(":")[-1]
            ref_base = ref_base[len(ref_base) // 2] if len(ref_base) > 1 else ref_base
            for token in str(alt_info).split("-", 1)[-1].split(" "):
                if not token or token[0] not in "XID" or not token[1:]:
                    continue
                if token[0] == "X":
                    cands.append(CandidateAllele(pos1, ref_base, token[1]))
                elif token[0] == "I":
                    cands.append(CandidateAllele(pos1, ref_base, token[1:]))
                else:  # D<deleted>
                    cands.append(CandidateAllele(pos1, ref_base + token[1:], ref_base))
        _fa = _FF(args.ref_fn)
        ref_seq = _fa.fetch(ctg, 0, _fa.contig_length(ctg))
        _fa.close()
        # read-level support gates relabeling (find_read_support semantics)
        from clair3_tpu.io.bam import BamReader as _BR

        _bam = _BR(args.bam_fn)
        _reads = list(_bam.fetch(ctg, max(0, args.ctg_start - 1), end))
        truths = unify_representation(truths, cands, ref_seq, 0, reads=_reads)
    labels, keep = build_labels(
        pos_infos, truths, maximum_non_variant_ratio=args.maximum_non_variant_ratio)
    write_bin(args.bin_fn, tensors[keep], labels[keep],
              [p for p, k in zip(pos_infos, keep) if k],
              [a for a, k in zip(alt_infos, keep) if k])
    print(f"[INFO] wrote {int(keep.sum())} samples to {args.bin_fn}")
    return 0


def cmd_train(args: argparse.Namespace) -> int:
    from clair3_tpu.config import TrainConfig
    from clair3_tpu.train.trainer import train_model
    from clair3_tpu.utils.common import enable_compilation_cache

    enable_compilation_cache()

    init_variables = None
    if args.chkpnt_fn:
        from clair3_tpu.models.params_io import load_variables

        init_variables = load_variables(args.chkpnt_fn)
    cfg = TrainConfig(
        pileup=args.pileup,
        add_indel_length=args.add_indel_length,
        platform=args.platform,
        learning_rate=args.learning_rate,
        batch_size=args.batch_size,
        max_epoch=args.max_epoch,
        mini_epochs=args.mini_epochs,
        seed=args.seed,
    )
    mesh = None
    if args.data_parallel:
        from clair3_tpu.parallel.mesh import get_mesh

        # global (cross-process) mesh: multi-host training spans the slice
        mesh = get_mesh(local=False)
    result = train_model(args.bin_fn, args.output_dir, cfg, mesh=mesh,
                         init_variables=init_variables,
                         use_class_weights=args.use_class_weights)
    print(f"[INFO] best_val_loss={result['best_val_loss']:.4f} "
          f"model={result['model_path']}")
    return 0


def cmd_decode_probabilities(args: argparse.Namespace) -> int:
    """Re-decode dumped probabilities into VCF rows (reference:
    CallVariants --input_probabilities)."""
    import numpy as np

    from clair3_tpu.decode import DecodeConfig, decode_candidate

    cfg = DecodeConfig(
        add_indel_length=not args.pileup,
        pileup=args.pileup,
        show_ref_calls=args.show_ref,
        gvcf=False,
        debug=getattr(args, "debug", False),
    )
    out = open(args.output_fn, "w") if args.output_fn else sys.stdout
    with open(args.probabilities_fn) as fh:
        for line in fh:
            pos_info, alt_info, probs_s = line.rstrip("\n").split("\t")
            probs = np.fromstring(probs_s, sep=" ")
            row = decode_candidate(pos_info, alt_info, probs, cfg)
            if row:
                out.write(row)
    if args.output_fn:
        out.close()
    return 0


def cmd_sort_vcf(args: argparse.Namespace) -> int:
    """Sort/dedup VCF body rows from input files into one indexed VCF
    (SortVcf equivalent).  With ``--gvcf`` the inputs are gVCF shards
    (e.g. per-process ``merge_output.gvcf.gz`` from a ``--dist_*`` run,
    whose non-variant blocks close at chunk boundaries): rows merge in
    contig/position order under the gVCF header, byte-identical to a
    single-process run's merged gVCF."""
    from clair3_tpu.io.vcf import VcfWriter, get_header
    from clair3_tpu.io.bgzf import decompress, is_gzipped
    from clair3_tpu.pipeline.merge_sort import sort_rows

    rows = []
    for path in args.input_fn:
        text = decompress(path).decode() if is_gzipped(path) else open(path).read()
        rows.extend(l + "\n" for l in text.splitlines() if l and not l.startswith("#"))
    out_rows = sort_rows(rows)
    header_contigs = None
    if getattr(args, "gvcf", False) and args.ref_fn:
        # called-contig header lines, like VariantCaller._write_gvcf:
        # fai order + lengths, restricted to contigs present in the rows
        from clair3_tpu.io.fasta import FastaFile

        seen = {r.split("\t", 1)[0] for r in out_rows}
        fai = FastaFile(args.ref_fn)
        header_contigs = [(n, fai.contig_length(n)) for n in fai.references
                          if n in seen]
        fai.close()
    header = get_header(reference_file_path=args.ref_fn,
                        sample_name=args.sample_name,
                        gvcf=getattr(args, "gvcf", False),
                        contigs=header_contigs)
    with VcfWriter(args.output_fn, header) as w:
        for row in out_rows:
            w.write(row)
    if args.output_fn.endswith(".gz"):
        from clair3_tpu.io.tabix import write_tabix_index

        write_tabix_index(args.output_fn)
    print(f"[INFO] wrote {len(out_rows)} rows to {args.output_fn}")
    return 0


def cmd_merge_vcf(args: argparse.Namespace) -> int:
    """Merge pileup + full-alignment VCFs (MergeVcf equivalent).  Default:
    FA calls win at their positions.  --platform ilmn: region-scoped merge
    (realignment shifts candidate positions, so inside each full-alignment
    window only FA calls survive; reference MergeVcf.py:59-155)."""
    import os

    from clair3_tpu.io.vcf import VcfWriter, get_header
    from clair3_tpu.io.bgzf import decompress, is_gzipped
    from clair3_tpu.pipeline.merge_sort import (
        RegionIndex, merge_pileup_and_full_alignment,
        merge_pileup_and_full_alignment_illumina, read_full_aln_regions,
        sort_rows)

    def read_rows(path):
        text = decompress(path).decode() if is_gzipped(path) else open(path).read()
        return [l + "\n" for l in text.splitlines() if l and not l.startswith("#")]

    if args.platform == "ilmn":
        if not args.full_aln_regions and not args.bed_fn_prefix:
            print("[ERROR] --platform ilmn merge needs --full_aln_regions "
                  "or --bed_fn_prefix", file=sys.stderr)
            return 1
        paths = list(args.full_aln_regions or [])
        if args.bed_fn_prefix:
            if not os.path.isdir(args.bed_fn_prefix):
                print(f"[ERROR] Input directory: {args.bed_fn_prefix} not "
                      "exists!", file=sys.stderr)
                return 1
            # the reference concatenates every {ctg}.* candidate shard in
            # the folder (MergeVcf.py:71-80); shards are named
            # {ctg}.{idx}_{num}, so without --ctg_name match that shape
            # rather than every file (the folder also holds FULL_ALN_FILE_*
            # bookkeeping rows, which are not BED)
            import re

            if args.ctg_name:
                keep = lambda f: f.startswith(args.ctg_name + ".")  # noqa: E731
            else:
                keep = lambda f: re.fullmatch(r".+\.\d+_\d+", f)  # noqa: E731
            paths += sorted(
                os.path.join(args.bed_fn_prefix, f)
                for f in os.listdir(args.bed_fn_prefix) if keep(f))
        # zero matching shards => empty region tree => pileup-only merge
        # (the reference's bed_fn stays None and bed_tree_from returns an
        # empty tree, MergeVcf.py:73-85)
        merged = merge_pileup_and_full_alignment_illumina(
            read_rows(args.pileup_vcf_fn),
            read_rows(args.full_alignment_vcf_fn),
            RegionIndex(read_full_aln_regions(paths)),
            contig=args.ctg_name, qual_cutoff=args.qual,
            print_ref_calls=args.print_ref_calls,
            haploid_precise=args.haploid_precise,
            haploid_sensitive=args.haploid_sensitive)
    else:
        merged = merge_pileup_and_full_alignment(
            read_rows(args.pileup_vcf_fn), read_rows(args.full_alignment_vcf_fn),
            contig=args.ctg_name, qual_cutoff=args.qual,
            print_ref_calls=args.print_ref_calls,
            haploid_precise=args.haploid_precise,
            haploid_sensitive=args.haploid_sensitive)
    merged = sort_rows(merged)
    header = get_header(reference_file_path=args.ref_fn,
                        sample_name=args.sample_name)
    with VcfWriter(args.output_fn, header) as w:
        for row in merged:
            w.write(row)
    if args.output_fn.endswith(".gz"):
        from clair3_tpu.io.tabix import write_tabix_index

        write_tabix_index(args.output_fn)
    print(f"[INFO] wrote {len(merged)} rows to {args.output_fn}")
    return 0


def cmd_dump_tensors(args: argparse.Namespace) -> int:
    """Dump candidate tensors + positions/alt-info to the reference's
    fixture format — `{prefix}.npy` plus `{prefix}.npy.info` rows
    `pos_info\\talt_info` (reference: CreateTensorPileupFromCffi.py:443-452,
    read back by CallVariantsFromCffi.py:107-133).  Debug/visualization
    aid and golden-fixture generator."""
    import numpy as np

    from clair3_tpu.config import PLATFORMS

    preset = PLATFORMS[args.platform]
    if args.full_alignment:
        from clair3_tpu.fullalign.extractor import create_fa_tensors

        if not args.candidates_fn:
            print("[ERROR] --full_alignment needs --candidates_fn "
                  "(1-based positions, one per line)", file=sys.stderr)
            return 1
        with open(args.candidates_fn) as fh:
            positions = [int(l.split()[0]) for l in fh if l.strip()]
        tensors, pos_infos, alt_infos = create_fa_tensors(
            args.bam_fn, args.ref_fn, args.ctg_name, positions,
            matrix_depth=preset.matrix_depth, min_mq=args.min_mq,
            no_phasing=True, enable_dwell=args.enable_dwell_time)
    else:
        from clair3_tpu.pileup.extractor import create_pileup_tensors

        from clair3_tpu.io.fasta import FastaFile

        end = args.ctg_end
        if end is None:
            fa = FastaFile(args.ref_fn)
            end = fa.contig_length(args.ctg_name)
            fa.close()
        tensors, pos_infos, alt_infos, _ = create_pileup_tensors(
            args.bam_fn, args.ref_fn, args.ctg_name, args.ctg_start, end,
            min_mq=args.min_mq,
            min_snp_af=preset.snp_min_af, min_indel_af=preset.indel_min_af)
    np.save(args.tensor_fn, tensors)
    path = args.tensor_fn if args.tensor_fn.endswith(".npy") \
        else args.tensor_fn + ".npy"
    with open(path + ".info", "w") as fh:
        for pos_info, alt_info in zip(pos_infos, alt_infos):
            fh.write(f"{pos_info}\t{alt_info}\n")
    print(f"[INFO] dumped {len(pos_infos)} candidate tensors "
          f"{tuple(tensors.shape)} -> {path}(.info)")
    return 0


def cmd_split_bam(args: argparse.Namespace) -> int:
    """Split a haplotagged BAM into per-haplotype BAMs (the reference's
    split-into-haplotypes haploid calling workflow,
    docs/split_haplotype_into_haploid_calling.md, uses whatshap haplotag
    + samtools split; here the HP tags written by
    --use_haplotagging_for_final_output feed this directly)."""
    import os

    from clair3_tpu.io.bam import BamReader, write_bam

    os.makedirs(args.output_dir, exist_ok=True)
    bam = BamReader(args.bam_fn)
    outs = {}
    untagged = 0
    # one streaming pass per haplotype: write_bam consumes a generator, so
    # a WGS-scale BAM never needs its reads resident in memory
    for hap, name in ((1, "hap1"), (2, "hap2")):
        n = untagged = 0

        def reads():
            nonlocal n, untagged
            for read in BamReader(args.bam_fn):
                hp = read.tags.get("HP")
                if hp == hap or (hp not in (1, 2) and args.include_untagged):
                    n += 1
                    yield read
                if hp not in (1, 2):
                    untagged += 1

        path = os.path.join(args.output_dir, f"{name}.bam")
        write_bam(path, bam.references, bam.lengths, reads())
        outs[name] = path
        print(f"[INFO] {name}: {n} reads -> {path}")
    print(f"[INFO] untagged reads: {untagged} "
          f"({'included in both' if args.include_untagged else 'dropped'})")
    print("[INFO] call each haplotype with: clair3_tpu call --bam_fn "
          f"{outs['hap1']} ... --haploid_precise (or --haploid_sensitive)")
    return 0


def cmd_models(args: argparse.Namespace) -> int:
    from clair3_tpu.models.zoo import format_zoo_table

    print(format_zoo_table())
    return 0


def cmd_metrics(args: argparse.Namespace) -> int:
    """SNP/Indel precision-recall-F1 (GetOverallMetrics equivalent)."""
    from clair3_tpu.postprocess import parse_happy_vcf, variant_metrics

    if args.happy_vcf_fn:
        rows = parse_happy_vcf(args.happy_vcf_fn, args.ctg_name)
    else:
        from clair3_tpu.io.vcf import VcfReader

        truth = [r for r in VcfReader(args.truth_vcf_fn)
                 if not args.ctg_name or r.chrom == args.ctg_name]
        query = [r for r in VcfReader(args.query_vcf_fn)
                 if not args.ctg_name or r.chrom == args.ctg_name]
        rows = variant_metrics(truth, query,
                               genotype_match=not args.ignore_genotype)
    header = ["VariantType", "Query_FP", "Truth_FN", "Truth_TP", "Query_TP",
              "Precision", "Recall", "F1-score"]
    print("".join(h.ljust(14) for h in header))
    for vt in ("SNP", "INDEL"):
        m = rows[vt]
        print("".join(str(x).ljust(14) for x in (
            vt, m.query_fp, m.truth_fn, m.truth_tp, m.query_tp,
            m.precision, m.recall, m.f1)))
    return 0


def cmd_validate_gvcf(args: argparse.Namespace) -> int:
    """Structural gVCF validation (gvcf_validate.py)."""
    from clair3_tpu.gvcf_validate import main as validate_main

    argv = ["--gvcf_fn", args.gvcf_fn]
    if args.bed_fn:
        argv += ["--bed_fn", args.bed_fn]
    return validate_main(argv)


def cmd_serve(args: argparse.Namespace) -> int:
    """Serve the production inference engines over HTTP (TPU host side of
    the remote-inference split; reference analogue: the Triton serving
    mode, CallVariantsFromCffi.py:201-214)."""
    import numpy as np

    from clair3_tpu.config import PLATFORMS
    from clair3_tpu.serve import build_server
    from clair3_tpu.utils.common import enable_compilation_cache

    if not args.model_path and not args.pileup_model:
        print("[ERROR] serve needs --model_path or --pileup_model",
              file=sys.stderr)
        return 1
    if args.model_path:
        from clair3_tpu.models.zoo import (lookup_model, name_implies_dwell,
                                           validate_model_choice)

        zoo_info = lookup_model(args.model_path)
        if zoo_info is not None:
            err = validate_model_choice(zoo_info, args.platform)
            if err:
                print(f"[ERROR] {err}", file=sys.stderr)
                return 1
        if (zoo_info.dwell if zoo_info is not None
                else name_implies_dwell(args.model_path)):
            # mirror the `call` dwell notice so TPU-host operators see it
            # too: clients must extract with the dwell channel (mv/ts tags)
            name = os.path.basename(os.path.normpath(args.model_path))
            print(f"[INFO] '{name}' is a signal-aware (*_with_mv) model: "
                  "clients must send 9-channel full-alignment tensors "
                  "(dwell enabled; BAM needs mv/ts basecaller tags)",
                  file=sys.stderr)
    enable_compilation_cache()
    server = build_server(
        args.model_path, platform=args.platform,
        compute_dtype=args.compute_dtype, host=args.host, port=args.port,
        pileup_model=args.pileup_model, fa_model=args.full_alignment_model)
    # compile every bucket up front so first client batches are fast
    plat = PLATFORMS[args.platform]
    for kind, eng in server.engines.items():
        if not hasattr(eng, "warmup"):
            continue
        if kind == "pileup":
            eng.warmup((33, 18), np.int32)
        else:
            ch = getattr(eng, "fa_input_channels", 8)
            eng.warmup((plat.matrix_depth, 33, ch), np.int8)
    print(f"[INFO] serving {sorted(server.engines)} on {server.address}",
          file=sys.stderr)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    return 0


def main(argv=None) -> int:
    logging.basicConfig(format="%(message)s", level=logging.INFO)
    # CLAIR3T_JAX_PLATFORM pins the jax backend (e.g. "cpu" to call on a
    # host with no accelerator).  The env var JAX_PLATFORMS alone is not
    # enough on machines whose sitecustomize registers a platform eagerly
    # and re-exports the variable — the config value wins once a plugin is
    # registered, so set it explicitly before any backend initializes.
    _plat = os.environ.get("CLAIR3T_JAX_PLATFORM")
    if _plat:
        import jax

        jax.config.update("jax_platforms", _plat)
    if argv is None:
        argv = sys.argv[1:]
    # reference submodule spellings: `python -m clair3_tpu SelectQual ...`
    # (reference: clair3.py:80-104 dispatcher)
    from clair3_tpu.compat import dispatch

    rc = dispatch(list(argv))
    if rc is not None:
        return rc
    parser = argparse.ArgumentParser(
        prog="clair3_tpu",
        description="TPU-native germline small-variant caller",
    )
    from clair3_tpu import __version__

    parser.add_argument("--version", action="version",
                        version=f"clair3_tpu {__version__}")
    sub = parser.add_subparsers(dest="command", required=True)
    call_p = sub.add_parser("call", help="Run the two-stage calling cascade")
    _add_call_args(call_p)
    call_p.set_defaults(func=cmd_call)

    t2b = sub.add_parser("tensor2bin", help="Create labeled HDF5 training bins")
    t2b.add_argument("--bam_fn", required=True)
    t2b.add_argument("--ref_fn", required=True)
    t2b.add_argument("--truth_vcf_fn", required=True)
    t2b.add_argument("--bin_fn", required=True)
    t2b.add_argument("--platform", default="ont", choices=("ont", "hifi", "ilmn"))
    t2b.add_argument("--ctg_name", default=None)
    t2b.add_argument("--ctg_start", type=int, default=1)
    t2b.add_argument("--ctg_end", type=int, default=None)
    t2b.add_argument("--pileup", action="store_true")
    t2b.add_argument("--enable_dwell_time", action="store_true")
    t2b.add_argument("--snp_min_af", type=float, default=0.08)
    t2b.add_argument("--indel_min_af", type=float, default=0.15)
    t2b.add_argument("--maximum_non_variant_ratio", type=float, default=None)
    t2b.add_argument("--unify_repr", action="store_true",
                     help="re-express truth variants in the sample's own "
                          "candidate representation space before labeling")
    t2b.set_defaults(func=cmd_tensor2bin)

    tr = sub.add_parser("train", help="Train a model from HDF5 bins")
    tr.add_argument("--bin_fn", nargs="+", required=True)
    tr.add_argument("--output_dir", required=True)
    tr.add_argument("--platform", default="ont", choices=("ont", "hifi", "ilmn"))
    tr.add_argument("--pileup", action="store_true")
    tr.add_argument("--add_indel_length", action="store_true")
    tr.add_argument("--learning_rate", type=float, default=1e-3)
    tr.add_argument("--batch_size", type=int, default=2000)
    tr.add_argument("--max_epoch", type=int, default=30)
    tr.add_argument("--mini_epochs", type=int, default=1)
    tr.add_argument("--seed", type=int, default=0)
    tr.add_argument("--data_parallel", action="store_true",
                    help="shard batches over all devices via a Mesh")
    tr.add_argument("--chkpnt_fn", default=None,
                    help="initial .npz checkpoint for fine-tuning/resume")
    tr.add_argument("--use_class_weights", action="store_true",
                    help="effective-number class-balanced focal loss weights")
    tr.set_defaults(func=cmd_train)

    sv = sub.add_parser("sort_vcf", help="sort/dedup VCFs into one indexed VCF")
    sv.add_argument("--input_fn", nargs="+", required=True)
    sv.add_argument("--output_fn", required=True)
    sv.add_argument("--ref_fn", default=None)
    sv.add_argument("--sample_name", default="SAMPLE")
    sv.add_argument("--gvcf", action="store_true",
                    help="inputs are gVCF shards: emit the gVCF header "
                         "(non-variant blocks merge in position order)")
    sv.set_defaults(func=cmd_sort_vcf)

    mv = sub.add_parser("merge_vcf", help="merge pileup + full-alignment VCFs")
    mv.add_argument("--pileup_vcf_fn", required=True)
    mv.add_argument("--full_alignment_vcf_fn", required=True)
    mv.add_argument("--output_fn", required=True)
    mv.add_argument("--ref_fn", default=None)
    mv.add_argument("--sample_name", default="SAMPLE")
    mv.add_argument("--ctg_name", default=None)
    mv.add_argument("--qual", type=float, default=None)
    mv.add_argument("--print_ref_calls", action="store_true")
    mv.add_argument("--haploid_precise", action="store_true")
    mv.add_argument("--haploid_sensitive", action="store_true")
    mv.add_argument("--platform", default="ont", choices=("ont", "hifi", "ilmn"))
    mv.add_argument("--full_aln_regions", nargs="+", default=None,
                    help="ilmn: full-alignment region BED file(s)")
    mv.add_argument("--bed_fn_prefix", default=None,
                    help="ilmn: candidate folder holding {ctg}.* region "
                         "shards (reference spelling)")
    mv.set_defaults(func=cmd_merge_vcf)

    dp = sub.add_parser("decode_probabilities",
                        help="re-decode dumped head probabilities to VCF rows")
    dp.add_argument("--probabilities_fn", required=True)
    dp.add_argument("--output_fn", default=None)
    dp.add_argument("--pileup", action="store_true")
    dp.add_argument("--show_ref", action="store_true")
    dp.add_argument("--debug", action="store_true",
                    help="print raw head probabilities instead of VCF rows")
    dp.set_defaults(func=cmd_decode_probabilities)

    dt = sub.add_parser("dump_tensors",
                        help="dump candidate tensors to the reference's "
                             ".npy + .info fixture format")
    dt.add_argument("--bam_fn", required=True)
    dt.add_argument("--ref_fn", required=True)
    dt.add_argument("--ctg_name", required=True)
    dt.add_argument("--ctg_start", type=int, default=1)
    dt.add_argument("--ctg_end", type=int, default=None)
    dt.add_argument("--tensor_fn", required=True,
                    help="output prefix; writes {prefix}.npy + .npy.info")
    dt.add_argument("--platform", default="ont", choices=("ont", "hifi", "ilmn"))
    dt.add_argument("--min_mq", type=int, default=5)
    dt.add_argument("--full_alignment", action="store_true",
                    help="dump FA tensors for --candidates_fn positions "
                         "instead of pileup tensors")
    dt.add_argument("--candidates_fn", default=None)
    dt.add_argument("--enable_dwell_time", action="store_true")
    dt.set_defaults(func=cmd_dump_tensors)

    sb = sub.add_parser("split_bam",
                        help="split a haplotagged BAM (HP tags) into "
                             "per-haplotype BAMs for haploid calling")
    sb.add_argument("--bam_fn", required=True)
    sb.add_argument("--output_dir", required=True)
    sb.add_argument("--include_untagged", action="store_true",
                    help="route untagged reads into both haplotype BAMs")
    sb.set_defaults(func=cmd_split_bam)

    srv = sub.add_parser(
        "serve", help="serve the inference engines over HTTP (remote "
                      "calling hosts use `call --remote_engines`)")
    srv.add_argument("--model_path", default=None,
                     help="directory with pileup.{npz,pt} / "
                          "full_alignment.{npz,pt}")
    srv.add_argument("--pileup_model", default=None)
    srv.add_argument("--full_alignment_model", default=None)
    srv.add_argument("--platform", default="ont",
                     choices=("ont", "hifi", "ilmn"))
    srv.add_argument("--compute_dtype", default="auto",
                     choices=("auto", "fp32", "bf16"))
    srv.add_argument("--host", default="0.0.0.0")
    srv.add_argument("--port", type=int, default=8618)
    srv.set_defaults(func=cmd_serve)

    zl = sub.add_parser(
        "models",
        help="list the known pretrained checkpoint registry (models/zoo.py)")
    zl.set_defaults(func=cmd_models)

    mt = sub.add_parser("metrics", help="SNP/Indel P/R/F1 vs a truth set")
    mt.add_argument("--truth_vcf_fn", default=None)
    mt.add_argument("--query_vcf_fn", default=None)
    mt.add_argument("--happy_vcf_fn", default=None,
                    help="digest a hap.py output VCF instead")
    mt.add_argument("--ctg_name", default=None)
    mt.add_argument("--ignore_genotype", action="store_true")
    mt.set_defaults(func=cmd_metrics)

    vg = sub.add_parser(
        "validate_gvcf",
        help="structural gVCF validator (GATK-ValidateVariants-equivalent: "
             "block continuity, END ordering, PL/GQ consistency, header "
             "contract)")
    vg.add_argument("--gvcf_fn", required=True)
    vg.add_argument("--bed_fn", default=None,
                    help="regions the run was restricted to (coverage gaps "
                         "allowed only across region boundaries)")
    vg.set_defaults(func=cmd_validate_gvcf)

    args = parser.parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    raise SystemExit(main())
