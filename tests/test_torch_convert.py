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


def test_load_reference_checkpoint_ae_head(rng_np, tmp_path):
    """Synthetic reference-named 'ae' checkpoint places head tensors in
    params AND live-BN running stats in batch_stats."""
    from wseg_tpu.config import cfg, reset_cfg
    from wseg_tpu.models import get_model
    from wseg_tpu.utils.torch_convert import load_reference_checkpoint

    reset_cfg()
    cfg.NET.MODEL = "ae"
    cfg.NET.BACKBONE = "resnet50"
    cfg.NET.DTYPE = "float32"
    model = get_model(cfg.NET, num_classes=21)
    rng = jax.random.PRNGKey(0)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng, "sg": rng},
                           img, img, jnp.ones((1, 20)), train=True)
    variables = jax.device_get(variables)

    sd = {
        "aspp.aspp1.atrous_conv.weight": torch.from_numpy(
            rng_np.randn(256, 2048, 1, 1).astype(np.float32)),
        "aspp.aspp1.bn.weight": torch.from_numpy(
            np.full(256, 4.0, np.float32)),
        "aspp.aspp1.bn.bias": torch.from_numpy(
            np.zeros(256, np.float32)),
        "fc8_skip.1.weight": torch.from_numpy(
            np.full(48, 6.0, np.float32)),
        "fc8_skip.1.bias": torch.from_numpy(np.zeros(48, np.float32)),
        "fc8_skip.1.running_mean": torch.from_numpy(
            np.full(48, 0.25, np.float32)),
        "fc8_skip.1.running_var": torch.from_numpy(
            np.full(48, 2.0, np.float32)),
        "shallow_mask.fc_skip.1.running_mean": torch.from_numpy(
            np.full(256, 0.5, np.float32)),
        "shallow_mask.fc_skip.1.running_var": torch.from_numpy(
            np.full(256, 3.0, np.float32)),
        "last_conv.8.weight": torch.from_numpy(
            rng_np.randn(20, 256, 1, 1).astype(np.float32)),
        "last_conv.8.bias": torch.from_numpy(
            rng_np.randn(20).astype(np.float32)),
    }
    pth = tmp_path / "ae.pth"
    torch.save(sd, str(pth))

    out = load_reference_checkpoint(variables, str(pth), "ae", "resnet50")
    p = out["params"]["decoder"]
    bsdepartment = out["batch_stats"]["decoder"]
    assert float(p["aspp"]["aspp1_bn"]["scale"][0]) == 4.0
    assert float(p["fc8_skip_bn"]["scale"][0]) == 6.0
    np.testing.assert_allclose(
        bsdepartment["fc8_skip_bn"]["mean"], 0.25)
    np.testing.assert_allclose(
        bsdepartment["shallow_mask"]["fc_skip_bn"]["var"], 3.0)
    np.testing.assert_allclose(
        p["last_conv3"]["kernel"],
        np.transpose(sd["last_conv.8.weight"].numpy(), (2, 3, 1, 0)))


def test_load_reference_checkpoint_tf_head(rng_np, tmp_path):
    from wseg_tpu.config import cfg, reset_cfg
    from wseg_tpu.engine.train_loop import init_test_variables
    from wseg_tpu.models import get_model
    from wseg_tpu.utils.torch_convert import load_reference_checkpoint

    reset_cfg()
    cfg.NET.MODEL = "CAM_CASA_WGAP_tf"
    cfg.NET.BACKBONE = "resnet38"
    cfg.NET.DTYPE = "float32"
    model = get_model(cfg.NET, num_classes=21)
    variables = jax.device_get(init_test_variables(
        model, jax.random.PRNGKey(0), (1, 32, 32, 3)))

    sd = {
        "fc7.weight": torch.from_numpy(
            rng_np.randn(1024, 4096, 1, 1).astype(np.float32)),
        "selfattn.qkv.weight": torch.from_numpy(
            rng_np.randn(3072, 1024).astype(np.float32)),
        "selfattn.qkv.bias": torch.from_numpy(
            rng_np.randn(3072).astype(np.float32)),
        "caatention.fc1.weight": torch.from_numpy(
            rng_np.randn(64, 1024, 1, 1).astype(np.float32)),
        "attention.conv1.weight": torch.from_numpy(
            rng_np.randn(1, 2, 7, 7).astype(np.float32)),
    }
    pth = tmp_path / "tf.pth"
    torch.save(sd, str(pth))
    out = load_reference_checkpoint(variables, str(pth),
                                    "CAM_CASA_WGAP_tf", "resnet38")
    p = out["params"]
    np.testing.assert_allclose(
        p["selfattn"]["qkv"]["kernel"],
        sd["selfattn.qkv.weight"].numpy().T)
    np.testing.assert_allclose(
        p["caatention"]["fc1"]["kernel"],
        sd["caatention.fc1.weight"].numpy()[:, :, 0, 0].T)
    np.testing.assert_allclose(
        p["attention"]["conv1"]["kernel"],
        np.transpose(sd["attention.conv1.weight"].numpy(), (2, 3, 1, 0)))
