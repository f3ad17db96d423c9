"""Asserted accuracy gates (VERDICT r02 #7): the trained-cascade F1 is a
TEST THRESHOLD, not prose.  A scaled-down full_cascade_demo (train both
nets from scratch, call a held-out region, genotype-exact scoring) must
clear the gates; regressions in extraction, training, routing, phasing,
haplotagging, FA tensors, decode, or merge all surface here.

The full-scale gates (SNP F1 >= 0.995, INDEL >= 0.99 at the 1.2 Mb demo
scale) are enforced by scripts/full_cascade_demo.py's exit code, run per
round on the TPU (docs/calling.md records the results); this CI-sized run
uses a smaller region and correspondingly looser gates.
"""

import os
import runpy
import sys

import pytest

DEMO = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "scripts", "full_cascade_demo.py")


@pytest.mark.slow
def test_trained_cascade_clears_accuracy_gate(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("C3T_DEMO_L", "100000")
    monkeypatch.setenv("C3T_DEMO_TRAIN_END", "76000")
    monkeypatch.setenv("C3T_DEMO_STEPS_P", "150")
    monkeypatch.setenv("C3T_DEMO_STEPS_F", "120")
    # CI-scale gates (24 kb held-out, ~180 truth sites): far above the
    # untrained/broken-pipeline floor (~0), below the full-scale 0.995/0.99
    monkeypatch.setenv("C3T_GATE_SNP", "0.95")
    monkeypatch.setenv("C3T_GATE_INDEL", "0.80")
    monkeypatch.setattr(sys, "argv", ["full_cascade_demo.py", str(tmp_path)])
    with pytest.raises(SystemExit) as exc:
        runpy.run_path(DEMO, run_name="__main__")
    out = capsys.readouterr().out
    assert exc.value.code == 0, f"accuracy gate failed:\n{out[-2000:]}"
