"""Golden tests: criteria vs torch; SEAM step smoke test."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from wseg_tpu.losses import (
    get_criterion,
    mask_loss_ce,
    multilabel_hinge_loss,
    multilabel_soft_margin_loss,
)


def test_soft_margin_matches_torch(rng_np):
    x = rng_np.randn(4, 20).astype(np.float32)
    y = (rng_np.rand(4, 20) > 0.7).astype(np.float32)
    want = torch.nn.MultiLabelSoftMarginLoss(reduction="none")(
        torch.from_numpy(x), torch.from_numpy(y)).numpy()
    got = np.asarray(multilabel_soft_margin_loss(x, y))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_hinge_matches_torch(rng_np):
    x = rng_np.randn(4, 20).astype(np.float32)
    y = (rng_np.rand(4, 20) > 0.6).astype(np.float32)
    y[0, 3] = 1.0  # ensure at least one positive everywhere
    # torch multilabel_margin_loss wants index-form targets: positives
    # first, then -1 padding
    y_idx = np.full((4, 20), -1, np.int64)
    for b in range(4):
        pos = np.nonzero(y[b])[0]
        y_idx[b, : len(pos)] = pos
    want = F.multilabel_margin_loss(
        torch.from_numpy(x), torch.from_numpy(y_idx),
        reduction="none").numpy()
    got = np.asarray(multilabel_hinge_loss(x, y))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_get_criterion():
    assert get_criterion("SoftMargin") is multilabel_soft_margin_loss
    assert get_criterion("Hinge") is multilabel_hinge_loss


def test_mask_loss_ce_matches_torch(rng_np):
    B, h, w, H, W, C = 2, 4, 4, 8, 8, 5
    logits = rng_np.randn(B, h, w, C).astype(np.float32)
    pgt = np.zeros((B, H, W, C), np.float32)
    cls_map = rng_np.randint(0, C, (B, H, W))
    keep = rng_np.rand(B, H, W) > 0.3
    for b in range(B):
        for i in range(H):
            for j in range(W):
                if keep[b, i, j]:
                    pgt[b, i, j, cls_map[b, i, j]] = 1.0

    got = float(mask_loss_ce(logits, pgt))

    lt = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    lt = F.interpolate(lt, size=(H, W), mode="bilinear",
                       align_corners=True)
    pt = torch.from_numpy(np.transpose(pgt, (0, 3, 1, 2)))
    tgt = torch.argmax(pt, 1)
    tgt[pt.sum(1) < 1] = 255
    want = float(F.cross_entropy(lt, tgt, ignore_index=255))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_seam_step_runs(rng_np):
    from wseg_tpu.config import cfg, reset_cfg
    from wseg_tpu.engine.seam import make_seam_train_step
    from wseg_tpu.engine.train_loop import create_train_state, \
        init_variables
    from wseg_tpu.models import get_model
    from wseg_tpu.parallel import make_optimizer

    reset_cfg()
    cfg.NET.MODEL = "ae"
    cfg.NET.BACKBONE = "vgg16"
    cfg.NET.DTYPE = "float32"
    cfg.NET.PAMR_KERNEL = [1, 2]
    cfg.NET.PAMR_ITER = 2
    model = get_model(cfg.NET, num_classes=21)
    rng = jax.random.PRNGKey(0)
    batch = {
        "image": jnp.asarray(rng_np.randn(2, 48, 48, 3), jnp.float32),
        "labels": jnp.ones((2, 20), jnp.float32),
    }
    variables = init_variables(model, rng, batch)
    tx, _ = make_optimizer(cfg.NET, "vgg16", variables["params"])
    state = create_train_state(model, tx, rng, batch, variables=variables)
    step = make_seam_train_step(model, tx)
    state, metrics = step(state, batch, rng, jnp.asarray(1.0),
                          jnp.asarray(1.0))
    for k in ("loss", "loss_cls", "loss_er", "loss_mask"):
        assert k in metrics and np.isfinite(float(metrics[k])), k


def test_segmentation_ce_matches_torch(rng_np):
    from wseg_tpu.losses import segmentation_ce_loss
    B, H, W, C = 2, 6, 6, 5
    logits = rng_np.randn(B, H, W, C).astype(np.float32)
    target = rng_np.randint(0, C, (B, H, W))
    target[0, 0, :3] = 255
    got = float(segmentation_ce_loss(logits, target))
    lt = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    want = float(F.cross_entropy(lt, torch.from_numpy(target).long(),
                                 ignore_index=255))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_fpn_head(rng_np):
    import jax.numpy as jnp
    from wseg_tpu.models.heads.fpn import FPN
    taps = {
        "conv3": jnp.asarray(rng_np.rand(1, 16, 16, 32), jnp.float32),
        "conv4": jnp.asarray(rng_np.rand(1, 8, 8, 64), jnp.float32),
        "conv6": jnp.asarray(rng_np.rand(1, 8, 8, 128), jnp.float32),
    }
    fpn = FPN(out_channels=64)
    v = fpn.init(jax.random.PRNGKey(0), taps)
    out = fpn.apply(v, taps)
    assert out.shape == (1, 16, 16, 64)
    assert np.isfinite(np.asarray(out)).all()
