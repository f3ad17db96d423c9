#!/usr/bin/env python
"""Train the committed checkpoint fixtures (VERDICT r03 #3).

Runs the full-cascade demo at 1.2 Mb scale (both nets trained for real,
held-out F1 gated at 0.995/0.99), then freezes the two checkpoints as
float16 .npz fixtures under tests/fixtures/trained/ together with a
manifest recording the training configuration and the achieved held-out
accuracy.  The fixtures power:

* tests/test_trained_fixture_cascade.py — a CI-tier cascade test with BOTH
  real trained nets and hard gates (closes the FA-regression blind spot;
  previously only the per-round TPU demo exercised a trained FA net), and
* bench.py — the end-to-end cascade decodes the ENGINE's own probabilities
  (trained-net-confident), with production QUAL-quantile routing.

Usage: python scripts/train_fixture_checkpoints.py  (TPU; ~15 min)
"""

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures", "trained")


def _freeze(src_npz: str, dst_npz: str) -> None:
    """Re-save a checkpoint with float params narrowed to fp16 (halves the
    committed size; inference runs bf16 anyway so fp16's 10 mantissa bits
    are not the precision floor)."""
    with np.load(src_npz) as data:
        flat = {k: data[k] for k in data.files}
    flat = {k: (v.astype(np.float16) if v.dtype == np.float32 else v)
            for k, v in flat.items()}
    np.savez_compressed(dst_npz, **flat)


def main():
    # the calibrated 1.2 Mb configuration (docs/calling.md:168-176): 1 Mb
    # training region, 200 kb held out, 1500/1000 optimization steps —
    # defaults (400/300) undertrain at this scale (measured: SNP F1 0.983)
    os.environ.setdefault("C3T_DEMO_L", "1200000")
    os.environ.setdefault("C3T_DEMO_TRAIN_END", "1000000")
    os.environ.setdefault("C3T_DEMO_STEPS_P", "1500")
    os.environ.setdefault("C3T_DEMO_STEPS_F", "1000")
    import scripts.full_cascade_demo as demo

    out_dir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="c3t_fix_")
    platform = sys.argv[2] if len(sys.argv) > 2 else "hifi"
    P = demo.PLATFORMS[platform]
    result = demo.run(out_dir, platform=platform)
    if not result["ok"]:
        print(f"[fixture] demo gates failed; NOT freezing fixtures: {result}")
        return 1

    os.makedirs(FIXTURE_DIR, exist_ok=True)
    names = (f"pileup_{platform}.npz", f"fa_{platform}.npz")
    _freeze(result["pileup_model"], os.path.join(FIXTURE_DIR, names[0]))
    _freeze(result["fa_model"], os.path.join(FIXTURE_DIR, names[1]))
    manifest = {
        "scale_bp": result["scale_bp"],
        "held_out_snp_f1": result["snp_f1"],
        "held_out_indel_f1": result["indel_f1"],
        "gates": result["gates"],
        "platform": platform,
        "matrix_depth": P["matrix_depth"],
        "pileup": {"add_indel_length": False},
        "fa": {"add_indel_length": True, "input_channels": P["channels"]},
        "simulator": {"seed": 7, "coverage": P["coverage"],
                      "read_length": P["read_length"],
                      "error_rate": P["error_rate"], "variant_step": 130,
                      "with_mv_tags": P["with_mv_tags"]},
        "trainer": "scripts/full_cascade_demo.py run() at C3T_DEMO_L=1200000",
    }
    # hifi keeps the historical manifest.json name; other platforms get
    # manifest_{platform}.json alongside
    mf = "manifest.json" if platform == "hifi" else f"manifest_{platform}.json"
    with open(os.path.join(FIXTURE_DIR, mf), "w") as fh:
        json.dump(manifest, fh, indent=2)
        fh.write("\n")
    for f in names:
        sz = os.path.getsize(os.path.join(FIXTURE_DIR, f)) / 1e6
        print(f"[fixture] {f}: {sz:.1f} MB")
    print(f"[fixture] frozen [{platform}]; held-out SNP F1 {result['snp_f1']} "
          f"INDEL F1 {result['indel_f1']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
