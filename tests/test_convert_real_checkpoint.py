"""Real-checkpoint conversion harness.

Reconstructs the reference's Clair3_P / Clair3_F torch module layout
attribute-for-attribute (reference: clair3/model.py:58-416 — exact
state-dict key names, Sequential-wrapped res blocks, BatchNorm eps 1e-3,
SELU-before-softmax heads, NHWC pyramid-pool flatten), saves a real
``torch.save(state_dict)`` checkpoint the way Train.py does, runs
``convert_checkpoint``, and asserts:

* full key coverage — no checkpoint tensor silently dropped, none missing
  (strict mode raises otherwise),
* logit parity between the torch forward (predict=True concatenation) and
  the converted JAX model,
* the DDP ``module.`` prefix and ``{"state_dict": ...}`` wrapper forms,
* the 9-channel ``*_with_mv`` dwell variant.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional

import jax.numpy as jnp  # noqa: E402

from clair3_tpu.models import FullAlignmentNet, PileupNet  # noqa: E402
from clair3_tpu.models.convert import convert_checkpoint  # noqa: E402


# ---------------------------------------------------------------------------
# faithful reconstruction of the reference torch module layout
# ---------------------------------------------------------------------------

class RefClair3P(nn.Module):
    def __init__(self, add_indel_length=False, predict=True, input_channels=18):
        super().__init__()
        self.add_indel_length = add_indel_length
        self.predict = predict
        self.LSTM1 = nn.LSTM(input_size=input_channels, hidden_size=128,
                             batch_first=True, bidirectional=True)
        self.LSTM2 = nn.LSTM(input_size=256, hidden_size=160,
                             batch_first=True, bidirectional=True)
        self.L3_dropout = nn.Dropout(p=0.2)
        self.L4 = nn.Linear(320 * 33, 128)
        self.L4_dropout = nn.Dropout(p=0.5)
        self.L5_1 = nn.Linear(128, 128)
        self.L5_1_dropout = nn.Dropout(p=0.2)
        self.L5_2 = nn.Linear(128, 128)
        self.L5_2_dropout = nn.Dropout(p=0.2)
        self.Y_gt21_logits = nn.Linear(128, 21)
        self.Y_genotype_logits = nn.Linear(128, 3)
        if add_indel_length:
            self.L5_3 = nn.Linear(128, 128)
            self.L5_3_dropout = nn.Dropout(p=0.2)
            self.L5_4 = nn.Linear(128, 128)
            self.L5_4_dropout = nn.Dropout(p=0.2)
            self.Y_indel_length_logits_1 = nn.Linear(128, 33)
            self.Y_indel_length_logits_2 = nn.Linear(128, 33)
        self.softmax = nn.Softmax(dim=-1)
        self.activation = nn.SELU()

    def forward(self, x):
        x = x.float()
        x, _ = self.LSTM1(x)
        x, _ = self.LSTM2(x)
        x = torch.flatten(x, start_dim=1)
        x = self.activation(self.L4(x))
        heads = [
            self.softmax(self.activation(self.Y_gt21_logits(
                self.activation(self.L5_1(x))))),
            self.softmax(self.activation(self.Y_genotype_logits(
                self.activation(self.L5_2(x))))),
        ]
        if self.add_indel_length:
            heads.append(self.softmax(self.activation(
                self.Y_indel_length_logits_1(self.activation(self.L5_3(x))))))
            heads.append(self.softmax(self.activation(
                self.Y_indel_length_logits_2(self.activation(self.L5_4(x))))))
        return torch.cat(heads, dim=1)


class RefBasicConv2D(nn.Module):
    def __init__(self, in_channels, filters, kernel_size, strides, padding):
        super().__init__()
        self.conv = nn.Conv2d(in_channels, filters, kernel_size=kernel_size,
                              stride=strides, padding=padding, bias=True)
        self.bn = nn.BatchNorm2d(filters, eps=1e-3)
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        return self.relu(self.bn(self.conv(x)))


class RefBasicBlock(nn.Module):
    def __init__(self, in_channels, filter_num, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_channels, filter_num, kernel_size=3,
                               stride=stride, padding=1, bias=True)
        self.bn1 = nn.BatchNorm2d(filter_num, eps=1e-3)
        self.conv2 = nn.Conv2d(filter_num, filter_num, kernel_size=3,
                               stride=1, padding=1, bias=True)
        self.bn2 = nn.BatchNorm2d(filter_num, eps=1e-3)
        self.downsample = nn.Identity()  # production blocks keep channels
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        residual = self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(residual + y)


class RefPyramidPolling(nn.Module):
    def __init__(self, spatial_pool_size=(3, 2, 1)):
        super().__init__()
        self.spatial_pool_size = spatial_pool_size

    def forward(self, x):
        pooled = []
        height, width = x.shape[-2], x.shape[-1]
        for pool_size in self.spatial_pool_size:
            wh = int(np.ceil(height / pool_size))
            ww = int(np.ceil(width / pool_size))
            out_h = int(np.ceil(height / wh))
            out_w = int(np.ceil(width / ww))
            pad_h = max((out_h - 1) * wh + wh - height, 0)
            pad_w = max((out_w - 1) * ww + ww - width, 0)
            xp = F.pad(x, (pad_w // 2, pad_w - pad_w // 2,
                           pad_h // 2, pad_h - pad_h // 2)) if pad_h or pad_w else x
            mp = F.max_pool2d(xp, kernel_size=(wh, ww), stride=(wh, ww))
            pooled.append(torch.flatten(mp.permute(0, 2, 3, 1), start_dim=1))
        return torch.cat(pooled, dim=1)


class RefClair3F(nn.Module):
    def __init__(self, add_indel_length=True, input_channels=8):
        super().__init__()
        self.add_indel_length = add_indel_length
        self.input_channels = input_channels
        self.conv1 = RefBasicConv2D(input_channels, 64, (3, 3), 2, 1)
        self.res_block1 = nn.Sequential(RefBasicBlock(64, 64))
        self.conv3 = RefBasicConv2D(64, 128, (3, 3), 2, 1)
        self.res_block2 = nn.Sequential(RefBasicBlock(128, 128))
        self.conv5 = RefBasicConv2D(128, 256, (3, 3), 2, 1)
        self.res_block3 = nn.Sequential(RefBasicBlock(256, 256))
        self.pyramidpolling = RefPyramidPolling()
        self.L4 = nn.Linear(14 * 256, 256)
        self.L5_1 = nn.Linear(256, 128)
        self.L5_2 = nn.Linear(256, 128)
        self.Y_gt21_logits = nn.Linear(128, 21)
        self.Y_genotype_logits = nn.Linear(128, 3)
        if add_indel_length:
            self.L5_3 = nn.Linear(256, 128)
            self.L5_4 = nn.Linear(256, 128)
            self.Y_indel_length_logits_1 = nn.Linear(128, 33)
            self.Y_indel_length_logits_2 = nn.Linear(128, 33)
        self.softmax = nn.Softmax(dim=-1)
        self.activation = nn.SELU()

    def forward(self, x):
        x = x.float() / 100.0
        if x.ndim == 4 and x.shape[-1] == self.input_channels:
            x = x.permute(0, 3, 1, 2)
        x = self.conv1(x)
        x = self.res_block1(x)
        x = self.conv3(x)
        x = self.res_block2(x)
        x = self.conv5(x)
        x = self.res_block3(x)
        x = self.pyramidpolling(x)
        x = self.activation(self.L4(x))
        heads = [
            self.softmax(self.activation(self.Y_gt21_logits(
                self.activation(self.L5_1(x))))),
            self.softmax(self.activation(self.Y_genotype_logits(
                self.activation(self.L5_2(x))))),
        ]
        if self.add_indel_length:
            heads.append(self.softmax(self.activation(
                self.Y_indel_length_logits_1(self.activation(self.L5_3(x))))))
            heads.append(self.softmax(self.activation(
                self.Y_indel_length_logits_2(self.activation(self.L5_4(x))))))
        return torch.cat(heads, dim=1)


def _randomize(module, seed):
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn_like(p) * 0.1)
        for m in module.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.05)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
    return module


def test_pileup_real_checkpoint_loads_and_matches(tmp_path):
    model = _randomize(RefClair3P(add_indel_length=False), 0).eval()
    path = str(tmp_path / "pileup.pt")
    torch.save(model.state_dict(), path)

    variables = convert_checkpoint(path, "pileup")  # strict key coverage
    x = np.random.default_rng(0).integers(-30, 30, size=(4, 33, 18)).astype(np.int32)
    with torch.no_grad():
        y_t = model(torch.from_numpy(x)).numpy()
    net = PileupNet(add_indel_length=False)
    y_j = np.asarray(net.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(y_j, y_t, atol=2e-5)


def test_pileup_checkpoint_ddp_prefix_and_wrapper(tmp_path):
    model = _randomize(RefClair3P(add_indel_length=False), 1).eval()
    sd = {"module." + k: v for k, v in model.state_dict().items()}
    path = str(tmp_path / "pileup_ddp.pt")
    torch.save({"state_dict": sd, "epoch": 7}, path)
    variables = convert_checkpoint(path, "pileup")
    x = np.random.default_rng(1).integers(-30, 30, size=(3, 33, 18)).astype(np.int32)
    with torch.no_grad():
        y_t = model(torch.from_numpy(x)).numpy()
    y_j = np.asarray(PileupNet(add_indel_length=False).apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(y_j, y_t, atol=2e-5)


@pytest.mark.parametrize("channels", [8, 9])  # 9 = *_with_mv dwell variant
def test_full_alignment_real_checkpoint_loads_and_matches(tmp_path, channels):
    model = _randomize(RefClair3F(add_indel_length=True,
                                  input_channels=channels), 2 + channels).eval()
    path = str(tmp_path / "full_alignment.pt")
    torch.save(model.state_dict(), path)

    variables = convert_checkpoint(path, "full_alignment")
    x = np.random.default_rng(2).integers(-100, 100,
                                          size=(3, 89, 33, channels)).astype(np.int8)
    with torch.no_grad():
        y_t = model(torch.from_numpy(x.astype(np.int32))).numpy()
    net = FullAlignmentNet(add_indel_length=True)
    y_j = np.asarray(net.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(y_j, y_t, atol=3e-5)
    # dwell autodetect contract: conv1 kernel input dim reflects channels
    k = variables["params"]["conv1"]["conv"]["kernel"]
    assert k.shape[2] == channels


def test_strict_conversion_rejects_unconsumed_keys(tmp_path):
    model = _randomize(RefClair3P(add_indel_length=False), 3)
    sd = model.state_dict()
    sd["mystery.weight"] = torch.zeros(3)
    path = str(tmp_path / "extra.pt")
    torch.save(sd, path)
    # schema validation now fires first with an aggregated message
    with pytest.raises(ValueError, match="unexpected tensor"):
        convert_checkpoint(path, "pileup")
    # non-strict tolerates it
    convert_checkpoint(path, "pileup", strict=False)


def test_strict_conversion_rejects_missing_keys(tmp_path):
    model = _randomize(RefClair3P(add_indel_length=False), 4)
    sd = model.state_dict()
    del sd["L5_2.bias"]
    path = str(tmp_path / "missing.pt")
    torch.save(sd, path)
    # schema validation reports the missing tensor up front (it used to
    # surface as a KeyError mid-conversion)
    with pytest.raises(ValueError, match="missing tensor 'L5_2.bias'"):
        convert_checkpoint(path, "pileup")


@pytest.mark.slow
def test_cli_call_with_pt_checkpoints_end_to_end(tmp_path):
    """A user's first-run path: a --model_path directory containing
    reference-layout pileup.pt / full_alignment.pt (torch state_dicts,
    run_clair3.py:147-149) drives the full CLI cascade."""
    import torch

    from clair3_tpu.cli import main as cli_main
    from clair3_tpu.testing import SimVariant, random_reference, write_test_case

    model_dir = tmp_path / "models"
    model_dir.mkdir()
    torch.manual_seed(0)
    torch.save(RefClair3P(add_indel_length=False).state_dict(),
               str(model_dir / "pileup.pt"))
    # DDP-prefixed wrapper variant for the FA net (run_clair3.py:414-430)
    fa_sd = RefClair3F(add_indel_length=True).state_dict()
    torch.save({"state_dict": {f"module.{k}": v for k, v in fa_sd.items()}},
               str(model_dir / "full_alignment.pt"))

    d = tmp_path / "case"
    d.mkdir()
    ref = random_reference(1500, seed=23)
    v = SimVariant(700, ref[700], "C" if ref[700] != "C" else "G", (1, 1))
    fasta, bam, _, _ = write_test_case(
        str(d), ref_length=1500, variants=[v], coverage=20,
        read_length=500, seed=23, error_rate=0.01)
    out = str(tmp_path / "out")
    rc = cli_main([
        "call", "--bam_fn", bam, "--ref_fn", fasta, "--output", out,
        "--model_path", str(model_dir), "--platform", "hifi",
        "--no_phasing_for_fa", "--var_pct_full", "1.0",
        "--ref_pct_full", "1.0",
    ])
    assert rc == 0
    import gzip as _gz
    import os as _os

    assert _os.path.exists(_os.path.join(out, "merge_output.vcf.gz"))
    # untrained nets emit arbitrary genotypes; the pipeline ran end-to-end
    # if the pileup stage produced scored rows
    rows = [l for l in _gz.open(_os.path.join(out, "pileup.vcf.gz"), "rt")
            if not l.startswith("#")]
    assert rows


def test_convert_cli_pt_to_npz_roundtrip(tmp_path):
    """`python -m clair3_tpu.models.convert in.pt out.npz` (kind inferred
    from the filename) produces an .npz that loads to identical params."""
    from clair3_tpu.models.convert import main as convert_main
    from clair3_tpu.models.params_io import flatten_tree, load_variables

    model = _randomize(RefClair3P(add_indel_length=False), 3).eval()
    src = str(tmp_path / "pileup.pt")
    dst = str(tmp_path / "pileup.npz")
    torch.save(model.state_dict(), src)
    assert convert_main([src, dst]) == 0

    direct = flatten_tree(convert_checkpoint(src, "pileup"))
    loaded = flatten_tree(load_variables(dst))
    assert direct.keys() == loaded.keys()
    for k in direct:
        np.testing.assert_array_equal(direct[k], loaded[k])
