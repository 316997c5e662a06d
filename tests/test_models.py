"""Model registry and forward-contract tests for all 26 variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wseg_tpu.config import cfg
from wseg_tpu.models import MODEL_SPECS, get_model

C = 21
H = W = 48  # small but exercises strides 4/8/16 and window padding


def _build(model_name, backbone="resnet50"):
    cfg.NET.MODEL = model_name
    cfg.NET.BACKBONE = backbone
    cfg.NET.DTYPE = "float32"
    cfg.NET.PAMR_KERNEL = [1, 2]  # keep tests fast
    cfg.NET.PAMR_ITER = 2
    return get_model(cfg.NET, num_classes=C)


def _init_and_run(model, train, labels_dim=C - 1):
    rng = jax.random.PRNGKey(0)
    img = jnp.asarray(np.random.RandomState(0).rand(2, H, W, 3),
                      jnp.float32)
    raw = img
    labels = jnp.ones((2, labels_dim), jnp.float32) if train else None
    rngs = {"params": rng, "dropout": rng, "sg": rng}
    variables = model.init(rngs, img, raw, labels, train=train)
    out, _ = model.apply(
        variables, img, raw, labels, train=train,
        rngs={"dropout": rng, "sg": rng},
        mutable=["batch_stats"] if train else [])
    return out


# MF needs the multi-tap resnet38 backbone; tf_v3 runs unpadded window
# attention (reference parity), so its stride-8 features must divide ws=2
# (resnet50 at 48^2 gives 3x3)
R38_MODELS = {"CAM_MF", "CAM_MF_v2", "CAM_CASA_WGAP_tf_v3"}


@pytest.mark.parametrize("name", sorted(MODEL_SPECS.keys()))
def test_forward_test_mode(name):
    backbone = "resnet38" if name in R38_MODELS else "resnet50"
    model = _build(name, backbone)
    out = _init_and_run(model, train=False)
    spec = MODEL_SPECS[name]
    exp_cls = C if spec.cls_all_channels else C - 1
    assert out.cls.shape == (2, exp_cls), name
    assert out.masks.shape == (2, H, W, C), name
    assert np.isfinite(np.asarray(out.cls)).all()
    assert np.isfinite(np.asarray(out.masks)).all()


@pytest.mark.parametrize("name", ["ae", "bsl", "CAM_CASA_WGAP_v5",
                                  "CAM_CASA_WGAP_tf", "CAM_SA_WGAP",
                                  "CAM_CASA_WGAP_PCM"])
def test_forward_train_mode(name):
    # PCM reads the conv4/conv5 taps (reference uses resnet38d_v2)
    backbone = "resnet38" if name == "CAM_CASA_WGAP_PCM" else "resnet50"
    model = _build(name, backbone)
    spec = MODEL_SPECS[name]
    out = _init_and_run(model, train=True,
                        labels_dim=C if spec.labels_with_bg else C - 1)
    assert out.cls_fg is not None and out.cls_fg.shape == (2,)
    assert out.masks.shape == (2, H, W, C)
    assert out.mask_logits is not None
    if spec.refine:
        assert out.masks_dec is not None
        assert out.masks_dec.shape == (2, H, W, C)
    if spec.loss_at:
        assert out.attn_map is not None


def test_softmax_masks_sum_to_one():
    model = _build("ae")
    out = _init_and_run(model, train=False)
    # test-mode ae masks are a rescaled softmax: close to a simplex
    s = np.asarray(out.masks.sum(-1))
    np.testing.assert_allclose(s, 1.0, atol=1e-3)


def test_registry_covers_reference_list():
    reference_models = {
        "ae", "bsl", "CAM_SA", "CAM_CASA", "CAM_SA_WGAP", "CAM_CASA_WGAP",
        "CAM_MF", "CAM_MF_v2", "CAM_CASA_WGAP_v2", "CAM_CASA_WGAP_v3",
        "CAM_WGAP_v3", "CAM_CASA_WGAP_v4", "CAM_CASA_WGAP_v5",
        "CAM_CASA_WGAP_PCM", "CAM_CASA_WGAP_v6", "CAM_CASA_WGAP_tf",
        "CAM_CASA_WGAP_tf_v2", "CAM_CASA_WGAP_tf_v3", "CAM_CASA_WGAP_tf_v4",
        "CAM_CASA_WGAP_tf_v5", "CAM_CASA_WGAP_tf_v6", "CAM_CASA_WGAP_tf_v7",
        "CAM_CASA_WGAP_tf_v8", "CAM_CASA_WGAP_tf_v9",
        "CAM_CASA_WGAP_tf_v9_2", "CAM_CASA_WGAP_tf_v10",
    }
    assert reference_models == set(MODEL_SPECS.keys())
