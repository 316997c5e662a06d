"""torch .pth -> Flax conversion: mapping, transposition, and numerical
parity of FrozenBatchNorm vs torch eval-mode BatchNorm."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp


def test_frozen_bn_matches_torch_eval(rng_np):
    from wseg_tpu.models.backbones.common import FrozenBatchNorm
    C = 8
    x = rng_np.randn(2, 5, 5, C).astype(np.float32)
    scale = rng_np.rand(C).astype(np.float32) + 0.5
    bias = rng_np.randn(C).astype(np.float32)
    mean = rng_np.randn(C).astype(np.float32)
    var = rng_np.rand(C).astype(np.float32) + 0.5

    mod = FrozenBatchNorm(C)
    params = {"params": {"scale": scale, "bias": bias,
                         "mean": mean, "var": var}}
    got = np.asarray(mod.apply(params, x))

    bn = torch.nn.BatchNorm2d(C)
    bn.weight.data = torch.from_numpy(scale)
    bn.bias.data = torch.from_numpy(bias)
    bn.running_mean.data = torch.from_numpy(mean)
    bn.running_var.data = torch.from_numpy(var)
    bn.eval()
    want = bn(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    want = np.transpose(want.detach().numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_conv_weight_conversion_numerical(rng_np, tmp_path):
    """A torch conv + frozen BN pipeline must produce identical outputs
    after conversion into the Flax backbone building blocks."""
    from wseg_tpu.utils.torch_convert import _conv_kernel

    w = rng_np.randn(4, 3, 3, 3).astype(np.float32)  # (O,I,kh,kw)
    x = rng_np.randn(1, 7, 7, 3).astype(np.float32)

    want = F.conv2d(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                    torch.from_numpy(w), padding=1)
    want = np.transpose(want.numpy(), (0, 2, 3, 1))

    got = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(_conv_kernel(w)), (1, 1),
        [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


def test_load_pretrained_backbone_resnet50(rng_np, tmp_path):
    """Synthesize a torchvision-style resnet50 state_dict (prefix subset)
    and verify placement into the Flax param tree."""
    from wseg_tpu.config import cfg, reset_cfg
    from wseg_tpu.engine.train_loop import init_test_variables
    from wseg_tpu.models import get_model
    from wseg_tpu.utils.torch_convert import load_pretrained_backbone

    reset_cfg()
    cfg.NET.MODEL = "bsl"
    cfg.NET.BACKBONE = "resnet50"
    cfg.NET.DTYPE = "float32"
    model = get_model(cfg.NET, num_classes=21)
    variables = init_test_variables(model, jax.random.PRNGKey(0),
                                    (1, 64, 64, 3))
    params = jax.device_get(variables["params"])

    sd = {
        "conv1.weight": torch.from_numpy(
            rng_np.randn(64, 3, 7, 7).astype(np.float32)),
        "bn1.weight": torch.from_numpy(np.full(64, 2.0, np.float32)),
        "bn1.bias": torch.from_numpy(np.full(64, 0.5, np.float32)),
        "bn1.running_mean": torch.from_numpy(np.zeros(64, np.float32)),
        "bn1.running_var": torch.from_numpy(np.ones(64, np.float32)),
        "bn1.num_batches_tracked": torch.tensor(100),
        "layer1.0.conv1.weight": torch.from_numpy(
            rng_np.randn(64, 64, 1, 1).astype(np.float32)),
        "layer1.0.downsample.0.weight": torch.from_numpy(
            rng_np.randn(256, 64, 1, 1).astype(np.float32)),
        "layer1.0.downsample.1.weight": torch.from_numpy(
            np.full(256, 3.0, np.float32)),
        "layer1.0.downsample.1.bias": torch.from_numpy(
            np.zeros(256, np.float32)),
        "layer1.0.downsample.1.running_mean": torch.from_numpy(
            np.zeros(256, np.float32)),
        "layer1.0.downsample.1.running_var": torch.from_numpy(
            np.ones(256, np.float32)),
        "fc.weight": torch.from_numpy(
            rng_np.randn(1000, 2048).astype(np.float32)),  # skipped
    }
    pth = tmp_path / "r50.pth"
    torch.save(sd, str(pth))

    out = load_pretrained_backbone(params, str(pth), "resnet50")
    np.testing.assert_allclose(
        out["backbone"]["conv1"]["kernel"],
        np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0)))
    assert float(out["backbone"]["bn1"]["scale"][0]) == 2.0
    assert float(out["backbone"]["layer1_0"]["downsample_bn"]["scale"][0]) \
        == 3.0
    np.testing.assert_allclose(
        out["backbone"]["layer1_0"]["conv1"]["kernel"],
        np.transpose(sd["layer1.0.conv1.weight"].numpy(), (2, 3, 1, 0)))


def test_load_pretrained_backbone_resnet38_names(rng_np, tmp_path):
    """WRN38 (mxnet-converted flat names) placement check."""
    from wseg_tpu.config import cfg, reset_cfg
    from wseg_tpu.engine.train_loop import init_test_variables
    from wseg_tpu.models import get_model
    from wseg_tpu.utils.torch_convert import load_pretrained_backbone

    reset_cfg()
    cfg.NET.MODEL = "bsl"
    cfg.NET.BACKBONE = "resnet38"
    cfg.NET.DTYPE = "float32"
    model = get_model(cfg.NET, num_classes=21)
    variables = init_test_variables(model, jax.random.PRNGKey(0),
                                    (1, 32, 32, 3))
    params = jax.device_get(variables["params"])

    sd = {
        "conv1a.weight": torch.from_numpy(
            rng_np.randn(64, 3, 3, 3).astype(np.float32)),
        "b2.bn_branch2a.weight": torch.from_numpy(
            np.full(64, 5.0, np.float32)),
        "b2.bn_branch2a.bias": torch.from_numpy(np.zeros(64, np.float32)),
        "b2.bn_branch2a.running_mean": torch.from_numpy(
            np.zeros(64, np.float32)),
        "b2.bn_branch2a.running_var": torch.from_numpy(
            np.ones(64, np.float32)),
        "b2.conv_branch2a.weight": torch.from_numpy(
            rng_np.randn(128, 64, 3, 3).astype(np.float32)),
        "bn7.weight": torch.from_numpy(np.full(4096, 7.0, np.float32)),
        "bn7.bias": torch.from_numpy(np.zeros(4096, np.float32)),
        "bn7.running_mean": torch.from_numpy(np.zeros(4096, np.float32)),
        "bn7.running_var": torch.from_numpy(np.ones(4096, np.float32)),
    }
    pth = tmp_path / "r38.pth"
    torch.save(sd, str(pth))
    out = load_pretrained_backbone(params, str(pth), "resnet38")
    assert float(out["backbone"]["b2"]["bn_branch2a"]["scale"][0]) == 5.0
    assert float(out["backbone"]["bn7"]["scale"][0]) == 7.0
    np.testing.assert_allclose(
        out["backbone"]["b2"]["conv_branch2a"]["kernel"],
        np.transpose(sd["b2.conv_branch2a.weight"].numpy(), (2, 3, 1, 0)))
