"""int8 inference mode (NET.DTYPE: int8): w8a8 dynamically-quantized
backbone convs (models/backbones/common.py QuantConv).

Checkpoint compatibility is structural (same param tree as the bf16
model), and the quantized forward must track the bf16 forward closely —
even on a random-init model with random inputs, the worst case for
per-tensor activation scales."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from wseg_tpu.config import cfg
from wseg_tpu.engine.train_loop import init_test_variables
from wseg_tpu.models import get_model


def _models(model="CAM_CASA_WGAP_tf", backbone="resnet38"):
    cfg.NET.MODEL = model
    cfg.NET.BACKBONE = backbone
    cfg.NET.DTYPE = "bfloat16"
    m16 = get_model(cfg.NET, num_classes=21)
    cfg.NET.DTYPE = "int8"
    m8 = get_model(cfg.NET, num_classes=21)
    return m16, m8


@pytest.mark.parametrize("backbone", ["resnet38", "resnet50", "vgg16"])
def test_int8_param_tree_matches_bf16(backbone):
    """A bf16 checkpoint loads into the int8 model unchanged."""
    m16, m8 = _models(backbone=backbone)
    v16 = init_test_variables(m16, jax.random.PRNGKey(0), (1, 64, 64, 3))
    v8 = init_test_variables(m8, jax.random.PRNGKey(0), (1, 64, 64, 3))
    s16 = jax.tree.map(lambda a: (a.shape, a.dtype), v16["params"])
    s8 = jax.tree.map(lambda a: (a.shape, a.dtype), v8["params"])
    assert s16 == s8


def test_int8_forward_tracks_bf16():
    m16, m8 = _models()
    v = init_test_variables(m16, jax.random.PRNGKey(0), (1, 64, 64, 3))
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3),
                    jnp.float32)
    o16 = m16.apply(v, x, train=False)
    o8 = m8.apply(v, x, train=False)  # same (bf16) params
    agree = (np.asarray(o16.masks).argmax(-1)
             == np.asarray(o8.masks).argmax(-1)).mean()
    assert agree > 0.9, agree
    c16 = np.asarray(o16.cls, np.float32).ravel()
    c8 = np.asarray(o8.cls, np.float32).ravel()
    # random-init cls logits are near-zero (SkipInit) so tight pointwise
    # bounds are ill-conditioned; bound the MEAN deviation vs scale and
    # require strong rank agreement
    dev = np.abs(c16 - c8).mean() / (np.abs(c16).mean() + 1e-6)
    assert dev < 0.25, dev
    assert np.corrcoef(c16, c8)[0, 1] > 0.9


def test_quantconv_matches_float_conv():
    """QuantConv output vs an exact f32 conv on the same weights: the
    quantization error bound is ~(|x|max |w|max K^2 Cin) / 127^2-ish;
    check relative error on realistic magnitudes."""
    from wseg_tpu.models.backbones.common import QuantConv

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 32) * 0.5, jnp.float32)
    qc = QuantConv(24, (3, 3), padding=[(1, 1), (1, 1)])
    v = qc.init(jax.random.PRNGKey(0), x)
    got = np.asarray(qc.apply(v, x), np.float32)
    w = np.asarray(v["params"]["kernel"], np.float32)
    want = np.asarray(jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")), np.float32)
    rel = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-8)
    assert rel < 0.02, rel


def test_quantconv_small_cin_is_float():
    """The RGB stem (cin < 16) must bypass quantization entirely."""
    from wseg_tpu.models.backbones.common import QuantConv

    x = jnp.asarray(np.random.RandomState(2).randn(1, 8, 8, 3) * 100,
                    jnp.float32)
    qc = QuantConv(16, (3, 3), padding=[(1, 1), (1, 1)])
    v = qc.init(jax.random.PRNGKey(0), x)
    got = np.asarray(qc.apply(v, x), np.float32)
    w = np.asarray(v["params"]["kernel"], np.float32)
    want = np.asarray(jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), jnp.asarray(w, jnp.bfloat16), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32), np.float32)
    np.testing.assert_allclose(got, want.astype(np.float32)
                               .astype(jnp.bfloat16).astype(np.float32),
                               rtol=0.05, atol=0.05)


def test_quantconv_static_calibration():
    """Static mode (NET.QUANT_ACT: static): a mutable-quant_stats pass
    max-accumulates per-channel |x|; serving on those grids tracks the
    f32 conv at least as closely as the dynamic per-tensor path, and on
    an outlier-channel input it must be strictly closer."""
    from wseg_tpu.models.backbones.common import QuantConv

    rng = np.random.RandomState(3)
    x = rng.randn(2, 12, 12, 32).astype(np.float32) * 0.5
    x[..., 7] *= 60.0  # one outlier channel wrecks a per-tensor grid
    x = jnp.asarray(x)

    qs = QuantConv(24, (3, 3), padding=[(1, 1), (1, 1)],
                   act_mode="static")
    v = qs.init(jax.random.PRNGKey(0), x)
    assert "quant_stats" in v and \
        v["quant_stats"]["amax"].shape == (32,)

    # calibration pass: stats accumulate, max over batches
    _, mut = qs.apply(v, x * 0.5, mutable=["quant_stats"])
    _, mut2 = qs.apply(dict(v, quant_stats=mut["quant_stats"]), x,
                       mutable=["quant_stats"])
    amax = np.asarray(mut2["quant_stats"]["amax"])
    np.testing.assert_allclose(
        amax, np.abs(np.asarray(x)).max(axis=(0, 1, 2)), rtol=1e-6)

    got = np.asarray(qs.apply(dict(v, quant_stats=mut2["quant_stats"]),
                              x), np.float32)
    qd = QuantConv(24, (3, 3), padding=[(1, 1), (1, 1)])
    dyn = np.asarray(qd.apply({"params": v["params"]}, x), np.float32)
    w = np.asarray(v["params"]["kernel"], np.float32)
    want = np.asarray(jax.lax.conv_general_dilated(
        x, jnp.asarray(w), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")), np.float32)
    err_s = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-8)
    err_d = np.abs(dyn - want).mean() / (np.abs(want).mean() + 1e-8)
    # ~0.5% of the static budget is bf16 output rounding; the signal
    # is the strict improvement over the per-tensor dynamic grid
    assert err_s < 0.03, err_s
    assert err_s < err_d, (err_s, err_d)


def test_int8_static_model_tracks_bf16():
    """End-to-end static mode on a full model: calibrate on the input
    distribution, then the static int8 forward tracks bf16 like the
    dynamic mode does (cls correlation + argmax agreement)."""
    saved = (cfg.NET.DTYPE, cfg.NET.QUANT_ACT)
    try:
        cfg.NET.MODEL = "CAM_CASA_WGAP_tf"
        cfg.NET.BACKBONE = "resnet38"
        cfg.NET.DTYPE = "bfloat16"
        m16 = get_model(cfg.NET, num_classes=21)
        cfg.NET.DTYPE = "int8"
        cfg.NET.QUANT_ACT = "static"
        ms = get_model(cfg.NET, num_classes=21)

        v = init_test_variables(ms, jax.random.PRNGKey(0),
                                (1, 64, 64, 3))
        x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3),
                        jnp.float32)
        _, mut = ms.apply(v, x, train=False, mutable=["quant_stats"])
        v = dict(v, quant_stats=mut["quant_stats"])

        o16 = m16.apply({k: v[k] for k in v if k != "quant_stats"}, x,
                        train=False)
        o8 = ms.apply(v, x, train=False)
        agree = (np.asarray(o16.masks).argmax(-1)
                 == np.asarray(o8.masks).argmax(-1)).mean()
        assert agree > 0.9, agree
        c16 = np.asarray(o16.cls, np.float32).ravel()
        c8 = np.asarray(o8.cls, np.float32).ravel()
        assert np.corrcoef(c16, c8)[0, 1] > 0.9
    finally:
        cfg.NET.DTYPE, cfg.NET.QUANT_ACT = saved
