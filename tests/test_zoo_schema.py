"""Checkpoint-schema conformance for every model-zoo registry entry.

The reference's users call with published pretrained ``.pt`` checkpoints
(reference README.md:405-449); their tensor names/shapes are fully
determined by the architecture code (clair3/model.py:58-416) and captured
as manifests in ``models/schema.py``.  For EVERY ``models/zoo.py`` entry
this test synthesizes a state dict exactly per manifest (including the
entry's dwell channel), round-trips it through ``convert_checkpoint``, and
asserts the flax tree matches the model's own init — so a real published
checkpoint with an unexpected prefix or shape can only fail if the manifest
itself is wrong, and then these tests are the executable record of what we
expect.  Wrapper variants ({'state_dict': ...}, DDP ``module.`` prefixes)
and non-conformant dicts are exercised too.
"""

import os

import numpy as np
import pytest
import torch

from clair3_tpu.config import FA_CHANNEL_SIZE, PILEUP_CHANNEL_SIZE
from clair3_tpu.models import FullAlignmentNet, PileupNet
from clair3_tpu.models.convert import convert_checkpoint
from clair3_tpu.models.schema import (
    full_alignment_state_dict_schema,
    pileup_state_dict_schema,
    validate_state_dict,
)
from clair3_tpu.models.zoo import _MODELS


def synth_state_dict(schema, seed=0):
    rs = np.random.RandomState(seed)
    out = {}
    for key, shape in schema.items():
        if key.endswith("num_batches_tracked"):
            out[key] = torch.tensor(100, dtype=torch.int64)
        elif key.endswith("running_var"):
            out[key] = torch.tensor(rs.rand(*shape).astype(np.float32) + 0.5)
        else:
            out[key] = torch.tensor(
                (rs.randn(*shape) * 0.1).astype(np.float32))
    return out


def _flax_tree_shapes(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flax_tree_shapes(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = tuple(v.shape)
    return out


def _save(tmp_path, sd, name="ckpt.pt"):
    p = os.path.join(str(tmp_path), name)
    torch.save(sd, p)
    return p


@pytest.mark.parametrize("info", _MODELS, ids=lambda m: m.name)
def test_zoo_entry_checkpoints_convert(info, tmp_path):
    """Per-registry-entry conversion: pileup (2 heads, 18 channels) and FA
    (4 heads, 8 or 9 channels per the entry's dwell flag)."""
    import jax
    import jax.numpy as jnp

    # --- pileup: published models ship without indel heads ---------------
    sd_p = synth_state_dict(pileup_state_dict_schema())
    assert validate_state_dict(sd_p, "pileup") == []
    vp = convert_checkpoint(_save(tmp_path, sd_p, "pileup.pt"), "pileup")
    model_p = PileupNet(add_indel_length=False)
    ref_p = model_p.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 33, PILEUP_CHANNEL_SIZE), jnp.int32))
    assert _flax_tree_shapes(vp["params"]) == _flax_tree_shapes(ref_p["params"])

    # --- full-alignment: dwell entries carry 9 input channels ------------
    in_ch = FA_CHANNEL_SIZE + (1 if info.dwell else 0)
    sd_f = synth_state_dict(
        full_alignment_state_dict_schema(input_channels=in_ch), seed=1)
    assert validate_state_dict(sd_f, "full_alignment",
                               expect_dwell=info.dwell) == []
    vf = convert_checkpoint(_save(tmp_path, sd_f, "fa.pt"), "full_alignment")
    model_f = FullAlignmentNet(add_indel_length=True, input_channels=in_ch)
    ref_f = model_f.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 55, 33, in_ch), jnp.int8), train=False)
    for col in ("params", "batch_stats"):
        assert _flax_tree_shapes(vf[col]) == _flax_tree_shapes(ref_f[col]), col


@pytest.mark.parametrize("wrap", ["plain", "state_dict", "ddp", "both"])
def test_wrapper_variants_convert_identically(wrap, tmp_path):
    """{'state_dict': ...} wrappers and DDP 'module.' prefixes load to the
    same tree as the plain dict (reference ships both spellings)."""
    import jax

    sd = synth_state_dict(pileup_state_dict_schema(), seed=2)
    base = convert_checkpoint(_save(tmp_path, sd, "a.pt"), "pileup")
    mod = sd
    if wrap in ("ddp", "both"):
        mod = {f"module.{k}": v for k, v in mod.items()}
    if wrap in ("state_dict", "both"):
        mod = {"state_dict": mod, "epoch": 7, "optimizer": {}}
    got = convert_checkpoint(_save(tmp_path, mod, "b.pt"), "pileup")
    flat_a = jax.tree_util.tree_leaves_with_path(base)
    flat_b = jax.tree_util.tree_leaves_with_path(got)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(a, b)


def test_nonconformant_checkpoints_fail_loudly(tmp_path):
    schema = pileup_state_dict_schema()

    # missing tensor
    sd = synth_state_dict(schema)
    del sd["L4.bias"]
    with pytest.raises(ValueError, match="missing tensor 'L4.bias'"):
        convert_checkpoint(_save(tmp_path, sd, "m.pt"), "pileup")

    # wrong shape
    sd = synth_state_dict(schema)
    sd["L4.weight"] = torch.zeros(128, 999)
    with pytest.raises(ValueError, match="manifest says"):
        convert_checkpoint(_save(tmp_path, sd, "s.pt"), "pileup")

    # unexpected tensor (e.g. an optimizer state leaked into the dict)
    sd = synth_state_dict(schema)
    sd["opt.exp_avg"] = torch.zeros(4)
    with pytest.raises(ValueError, match="unexpected tensor 'opt.exp_avg'"):
        convert_checkpoint(_save(tmp_path, sd, "u.pt"), "pileup")

    # dwell mismatch vs registry expectation: an 8-channel FA checkpoint
    # in a *_with_mv directory
    sd_f = synth_state_dict(full_alignment_state_dict_schema())
    assert any("registry says dwell=True" in p for p in
               validate_state_dict(sd_f, "full_alignment", expect_dwell=True))


def test_indel_length_pileup_variant_also_conforms(tmp_path):
    """Self-trained pileup checkpoints MAY carry the indel heads
    (--add_indel_length); the manifest adapts from the dict itself."""
    import jax
    import jax.numpy as jnp

    sd = synth_state_dict(pileup_state_dict_schema(add_indel_length=True),
                          seed=3)
    assert validate_state_dict(sd, "pileup") == []
    v = convert_checkpoint(_save(tmp_path, sd, "pi.pt"), "pileup")
    model = PileupNet(add_indel_length=True)
    ref = model.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, 33, PILEUP_CHANNEL_SIZE), jnp.int32))
    assert _flax_tree_shapes(v["params"]) == _flax_tree_shapes(ref["params"])


def test_converted_checkpoint_drives_forward(tmp_path):
    """One end-to-end smoke: synthetic manifest checkpoint -> convert ->
    flax forward produces per-head normalized probabilities."""
    import jax.numpy as jnp

    sd = synth_state_dict(full_alignment_state_dict_schema(input_channels=9),
                          seed=4)
    v = convert_checkpoint(_save(tmp_path, sd, "f.pt"), "full_alignment")
    model = FullAlignmentNet(add_indel_length=True, input_channels=9)
    x = np.random.RandomState(5).randint(-50, 51, (3, 55, 33, 9)).astype(np.int8)
    y = np.asarray(model.apply(v, jnp.asarray(x), train=False))
    assert y.shape == (3, 90)
    for s, e in ((0, 21), (21, 24), (24, 57), (57, 90)):
        np.testing.assert_allclose(y[:, s:e].sum(axis=1), 1.0, atol=1e-4)
