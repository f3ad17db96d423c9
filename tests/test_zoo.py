"""Pretrained-model registry (models/zoo.py) + its `call` CLI wiring.

Reference behaviors pinned here:
- run_clair3.py:323-326 bumps var_pct_phasing to 0.8 for the Guppy5 models
- README issue #437: clear early guidance for *_with_mv signal-aware models
- README.md:405-449 model tables (names, platforms, dwell)
"""

import subprocess
import sys

from clair3_tpu.models.zoo import (MODEL_ZOO, format_zoo_table, lookup_model,
                                   validate_model_choice)


def test_lookup_by_directory_path():
    info = lookup_model("/models/r941_prom_sup_g5014/")
    assert info is not None and info.platform == "ont"
    assert info.var_pct_phasing == 0.8
    assert lookup_model("/some/where/hifi_revio") .platform == "hifi"
    assert lookup_model("self_trained_model_dir") is None
    assert lookup_model("") is None


def test_with_mv_models_carry_dwell():
    for name, info in MODEL_ZOO.items():
        assert info.dwell == name.endswith("_with_mv"), name


def test_guppy5_phasing_bump_matches_reference_set():
    # reference run_clair3.py:323-326
    bumped = {n for n, m in MODEL_ZOO.items() if m.var_pct_phasing == 0.8}
    assert bumped == {"r941_prom_sup_g5014", "r941_prom_hac_g5014",
                      "ont_guppy5"}
    assert all(m.var_pct_phasing in (None, 0.8) for m in MODEL_ZOO.values())


def test_platform_mismatch_is_actionable():
    err = validate_model_choice(MODEL_ZOO["hifi_revio"], "ont")
    assert err is not None and "--platform hifi" in err
    assert validate_model_choice(MODEL_ZOO["hifi_revio"], "hifi") is None
    assert validate_model_choice(MODEL_ZOO["ilmn"], "ilmn") is None


def test_zoo_table_lists_every_model():
    table = format_zoo_table()
    for name in MODEL_ZOO:
        assert name in table


def test_models_subcommand():
    out = subprocess.run(
        [sys.executable, "-m", "clair3_tpu", "models"],
        capture_output=True, text=True, check=True)
    assert "r1041_e82_400bps_sup_v520_with_mv" in out.stdout
    assert "hifi_revio" in out.stdout


def test_call_rejects_platform_mismatch(tmp_path):
    # a zoo-named --model_path with the wrong --platform fails before any
    # input is opened (the BAM here does not even exist)
    model_dir = tmp_path / "hifi_revio"
    model_dir.mkdir()
    out = subprocess.run(
        [sys.executable, "-m", "clair3_tpu", "call",
         "--bam_fn", str(tmp_path / "none.bam"),
         "--ref_fn", str(tmp_path / "none.fa"),
         "--output_dir", str(tmp_path / "o"),
         "--model_path", str(model_dir),
         "--platform", "ont"],
        capture_output=True, text=True)
    assert out.returncode != 0
    assert "--platform hifi" in out.stderr


def test_serve_rejects_platform_mismatch(tmp_path):
    model_dir = tmp_path / "ilmn"
    model_dir.mkdir()
    out = subprocess.run(
        [sys.executable, "-m", "clair3_tpu", "serve",
         "--model_path", str(model_dir),
         "--platform", "hifi", "--port", "0"],
        capture_output=True, text=True)
    assert out.returncode != 0
    assert "--platform ilmn" in out.stderr


def test_name_implies_dwell_matches_reference_substring():
    # reference matches 'with_mv'/'with_move' substrings in any model name
    # (run_clair3.py:414-418), not just registry entries
    from clair3_tpu.models.zoo import name_implies_dwell

    assert name_implies_dwell("/m/self_trained_with_mv")
    assert name_implies_dwell("my_WITH_MOVE_net/")
    assert not name_implies_dwell("/m/r941_prom_sup_g5014")
    assert not name_implies_dwell("")


def test_probe_mv_tag(tmp_path):
    from clair3_tpu.io.bam import probe_mv_tag
    from clair3_tpu.testing import write_test_case

    _, bam_tagged, _, _ = write_test_case(str(tmp_path), with_mv_tags=True)
    has, without_value, checked = probe_mv_tag(bam_tagged)
    assert has and checked >= 1

    d2 = tmp_path / "untagged"
    d2.mkdir()
    _, bam_plain, _, _ = write_test_case(str(d2))
    has, without_value, checked = probe_mv_tag(bam_plain)
    assert not has and not without_value and checked > 0


def test_call_with_mv_model_rejects_untagged_bam(tmp_path):
    # reference run_clair3.py:442-463: dwell enabled + no usable mv tag in
    # the first 50 alignments -> fail early with actionable guidance
    from clair3_tpu.testing import write_test_case

    fa, bam, _, _ = write_test_case(str(tmp_path))  # no mv tags
    model_dir = tmp_path / "self_trained_with_mv"
    model_dir.mkdir()
    out = subprocess.run(
        [sys.executable, "-m", "clair3_tpu", "call",
         "--bam_fn", bam, "--ref_fn", fa,
         "--output_dir", str(tmp_path / "o"),
         "--model_path", str(model_dir),
         "--platform", "ont"],
        capture_output=True, text=True)
    assert out.returncode != 0
    assert "mv" in out.stderr and "move table" in out.stderr


def test_call_with_mv_model_rejects_non_ont_platform(tmp_path):
    model_dir = tmp_path / "net_with_mv"
    model_dir.mkdir()
    out = subprocess.run(
        [sys.executable, "-m", "clair3_tpu", "call",
         "--bam_fn", str(tmp_path / "none.bam"),
         "--ref_fn", str(tmp_path / "none.fa"),
         "--output_dir", str(tmp_path / "o"),
         "--model_path", str(model_dir),
         "--platform", "hifi"],
        capture_output=True, text=True)
    assert out.returncode != 0
    assert "ONT-only" in out.stderr


def test_enable_dwell_time_rejected_on_non_ont(tmp_path):
    out = subprocess.run(
        [sys.executable, "-m", "clair3_tpu", "call",
         "--bam_fn", str(tmp_path / "none.bam"),
         "--ref_fn", str(tmp_path / "none.fa"),
         "--output_dir", str(tmp_path / "o"),
         "--enable_dwell_time", "--platform", "ilmn"],
        capture_output=True, text=True)
    assert out.returncode != 0
    assert "not supported for non-ONT" in out.stderr
