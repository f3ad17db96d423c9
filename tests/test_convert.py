"""Numerical parity between torch reference ops and the JAX reimplementation,
exercised through the checkpoint converter."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from clair3_tpu.models import FullAlignmentNet, PileupNet  # noqa: E402
from clair3_tpu.models.convert import (  # noqa: E402
    full_alignment_variables_from_torch,
    pileup_variables_from_torch,
    _lstm_dir,
)
from clair3_tpu.models.params_io import (  # noqa: E402
    flatten_tree,
    load_variables,
    save_variables,
)
from clair3_tpu.ops.lstm import BiLSTM  # noqa: E402


def _sd(module, prefix):
    return {f"{prefix}.{k}": v.detach().numpy() for k, v in module.state_dict().items()}


def test_bilstm_matches_torch():
    torch.manual_seed(0)
    B, T, C, H = 3, 33, 18, 16
    lstm = torch.nn.LSTM(C, H, batch_first=True, bidirectional=True)
    x = torch.randn(B, T, C)
    with torch.no_grad():
        y_torch, _ = lstm(x)

    sd = _sd(lstm, "L")
    params = {"fwd": _lstm_dir(sd, "L", ""), "bwd": _lstm_dir(sd, "L", "_reverse")}
    y_jax = BiLSTM(H).apply({"params": params}, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(y_jax), y_torch.numpy(), atol=2e-5)


def _torch_pileup_state_dict(add_indel_length=False, seed=0):
    torch.manual_seed(seed)
    sd = {}
    sd.update(_sd(torch.nn.LSTM(18, 128, batch_first=True, bidirectional=True), "LSTM1"))
    sd.update(_sd(torch.nn.LSTM(256, 160, batch_first=True, bidirectional=True), "LSTM2"))
    sd.update(_sd(torch.nn.Linear(320 * 33, 128), "L4"))
    for name in ("L5_1", "L5_2") + (("L5_3", "L5_4") if add_indel_length else ()):
        sd.update(_sd(torch.nn.Linear(128, 128), name))
    sd.update(_sd(torch.nn.Linear(128, 21), "Y_gt21_logits"))
    sd.update(_sd(torch.nn.Linear(128, 3), "Y_genotype_logits"))
    if add_indel_length:
        sd.update(_sd(torch.nn.Linear(128, 33), "Y_indel_length_logits_1"))
        sd.update(_sd(torch.nn.Linear(128, 33), "Y_indel_length_logits_2"))
    return sd


def _torch_pileup_forward(sd, x, add_indel_length=False):
    """Reference forward semantics (clair3/model.py:130-161) composed from the
    raw state_dict, as a behavioral oracle."""

    def linear(name, h):
        w = torch.from_numpy(sd[f"{name}.weight"])
        b = torch.from_numpy(sd[f"{name}.bias"])
        return h @ w.T + b

    def lstm(name, h, in_size, hidden):
        mod = torch.nn.LSTM(in_size, hidden, batch_first=True, bidirectional=True)
        mod.load_state_dict({k.split(".", 1)[1]: torch.from_numpy(sd[k])
                             for k in sd if k.startswith(name + ".")})
        with torch.no_grad():
            out, _ = mod(h)
        return out

    selu = torch.nn.functional.selu
    softmax = torch.nn.functional.softmax
    with torch.no_grad():
        h = lstm("LSTM1", x.float(), 18, 128)
        h = lstm("LSTM2", h, 256, 160)
        h = torch.flatten(h, start_dim=1)
        h = selu(linear("L4", h))
        outs = [
            softmax(selu(linear("Y_gt21_logits", selu(linear("L5_1", h)))), dim=-1),
            softmax(selu(linear("Y_genotype_logits", selu(linear("L5_2", h)))), dim=-1),
        ]
        if add_indel_length:
            outs.append(softmax(selu(linear("Y_indel_length_logits_1", selu(linear("L5_3", h)))), dim=-1))
            outs.append(softmax(selu(linear("Y_indel_length_logits_2", selu(linear("L5_4", h)))), dim=-1))
        return torch.cat(outs, dim=1)


@pytest.mark.parametrize("add_indel_length", [False, True])
def test_pileup_conversion_end_to_end(add_indel_length):
    sd = _torch_pileup_state_dict(add_indel_length)
    variables = pileup_variables_from_torch(sd)

    rng = np.random.default_rng(1)
    x_np = rng.integers(-30, 30, size=(5, 33, 18)).astype(np.int32)
    expected = _torch_pileup_forward(sd, torch.from_numpy(x_np), add_indel_length).numpy()

    model = PileupNet(add_indel_length=add_indel_length)
    got = model.apply(variables, jnp.asarray(x_np))
    assert got.shape == expected.shape
    np.testing.assert_allclose(np.asarray(got), expected, atol=3e-5)


def test_conv_bn_parity():
    torch.manual_seed(2)
    conv = torch.nn.Conv2d(8, 64, 3, stride=2, padding=1, bias=True)
    bn = torch.nn.BatchNorm2d(64, eps=1e-3)
    bn.eval()
    # make running stats non-trivial
    with torch.no_grad():
        bn.running_mean.uniform_(-1, 1)
        bn.running_var.uniform_(0.5, 2)
        bn.weight.uniform_(0.5, 1.5)
        bn.bias.uniform_(-0.5, 0.5)

    x = torch.randn(2, 8, 89, 33)
    with torch.no_grad():
        expected = torch.relu(bn(conv(x))).permute(0, 2, 3, 1).numpy()

    sd = {**_sd(conv, "c.conv"), **_sd(bn, "c.bn")}
    from clair3_tpu.models.convert import _conv_bn_relu
    params, stats = _conv_bn_relu(sd, "c")

    from clair3_tpu.models.full_alignment import ConvBNRelu
    got = ConvBNRelu(64, strides=2).apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(got), expected, atol=2e-5)


def test_pyramid_pool_matches_torch_semantics():
    """pyramid_pool must reproduce the reference pooling (model.py:245-279):
    centered zero-pad + max-pool with window == stride, NHWC flatten."""
    torch.manual_seed(3)
    x = torch.relu(torch.randn(2, 256, 12, 5))

    import torch.nn.functional as F

    pooled = []
    H, W = 12, 5
    for p in (3, 2, 1):
        wh, ww = -(-H // p), -(-W // p)
        out_h, out_w = -(-H // wh), -(-W // ww)
        pad_h = max((out_h - 1) * wh + wh - H, 0)
        pad_w = max((out_w - 1) * ww + ww - W, 0)
        xp = F.pad(x, (pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2))
        m = F.max_pool2d(xp, kernel_size=(wh, ww), stride=(wh, ww))
        pooled.append(torch.flatten(m.permute(0, 2, 3, 1), start_dim=1))
    expected = torch.cat(pooled, dim=1).numpy()

    from clair3_tpu.models.full_alignment import pyramid_pool
    got = pyramid_pool(jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    assert got.shape == expected.shape == (2, 14 * 256)
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-6)


def test_full_alignment_converter_structure():
    """Converted FA variables must initialize-apply without shape errors."""
    torch.manual_seed(4)
    sd = {}

    def conv_bn(prefix, cin, cout):
        sd.update(_sd(torch.nn.Conv2d(cin, cout, 3, stride=2, padding=1, bias=True), f"{prefix}.conv"))
        sd.update(_sd(torch.nn.BatchNorm2d(cout, eps=1e-3), f"{prefix}.bn"))

    def res_block(prefix, c):
        sd.update(_sd(torch.nn.Conv2d(c, c, 3, padding=1, bias=True), f"{prefix}.0.conv1"))
        sd.update(_sd(torch.nn.BatchNorm2d(c, eps=1e-3), f"{prefix}.0.bn1"))
        sd.update(_sd(torch.nn.Conv2d(c, c, 3, padding=1, bias=True), f"{prefix}.0.conv2"))
        sd.update(_sd(torch.nn.BatchNorm2d(c, eps=1e-3), f"{prefix}.0.bn2"))

    conv_bn("conv1", 8, 64); res_block("res_block1", 64)  # noqa: E702
    conv_bn("conv3", 64, 128); res_block("res_block2", 128)  # noqa: E702
    conv_bn("conv5", 128, 256); res_block("res_block3", 256)  # noqa: E702
    sd.update(_sd(torch.nn.Linear(14 * 256, 256), "L4"))
    for name in ("L5_1", "L5_2", "L5_3", "L5_4"):
        sd.update(_sd(torch.nn.Linear(256, 128), name))
    sd.update(_sd(torch.nn.Linear(128, 21), "Y_gt21_logits"))
    sd.update(_sd(torch.nn.Linear(128, 3), "Y_genotype_logits"))
    sd.update(_sd(torch.nn.Linear(128, 33), "Y_indel_length_logits_1"))
    sd.update(_sd(torch.nn.Linear(128, 33), "Y_indel_length_logits_2"))

    variables = full_alignment_variables_from_torch(sd)
    model = FullAlignmentNet(add_indel_length=True)
    x = jnp.zeros((2, 89, 33, 8), jnp.int8)
    y = model.apply(variables, x, train=False)
    assert y.shape == (2, 90)

    # structural agreement with a fresh init
    init_vars = model.init(jax.random.PRNGKey(0), x, train=False)
    assert set(flatten_tree(init_vars)) == set(flatten_tree(variables))


def test_params_io_roundtrip(tmp_path):
    model = PileupNet()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 33, 18), jnp.int32))
    path = str(tmp_path / "m.npz")
    save_variables(path, variables)
    loaded = load_variables(path)
    f1, f2 = flatten_tree(variables), flatten_tree(loaded)
    assert set(f1) == set(f2)
    for k in f1:
        np.testing.assert_array_equal(np.asarray(f1[k]), f2[k])
