"""Backbone freezing: mmdet frozen_stages / norm requires_grad=False parity.

Reference: the R101-DCN config freezes the ResNet stem + layer1 and all
backbone BN affine params (occformer_nusc_r101_896x1600.py: frozen_stages=1,
norm_cfg=dict(type='BN2d', requires_grad=False), mmdet ResNet._freeze_stages).
Here freezing = optax mask that zeroes those updates (engine/optim.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from occformer_tpu.engine.optim import backbone_freeze_mask, build_optimizer


def _tiny_params():
    return {
        "backbone": {
            "conv1": {"Conv_0": {"kernel": jnp.ones((7, 7, 3, 8))}},
            "bn1": {"BatchNorm_0": {"scale": jnp.ones(8), "bias": jnp.zeros(8)}},
            "layer1_0": {
                "conv1": {"Conv_0": {"kernel": jnp.ones((1, 1, 8, 8))}},
                "bn1": {"BatchNorm_0": {"scale": jnp.ones(8), "bias": jnp.zeros(8)}},
            },
            "layer2_0": {
                "conv1": {"Conv_0": {"kernel": jnp.ones((1, 1, 8, 8))}},
                "bn1": {"BatchNorm_0": {"scale": jnp.ones(8), "bias": jnp.zeros(8)}},
            },
        },
        "head": {"cls": {"kernel": jnp.ones((8, 4)), "bias": jnp.zeros(4)}},
    }


@pytest.mark.quick
def test_freeze_mask_paths():
    params = _tiny_params()
    mask = backbone_freeze_mask(
        params,
        dict(frozen_stages=1, norm_cfg=dict(type="BN2d", requires_grad=False)),
    )
    b = mask["backbone"]
    assert b["conv1"]["Conv_0"]["kernel"] is True          # stem frozen
    assert b["bn1"]["BatchNorm_0"]["scale"] is True
    assert b["layer1_0"]["conv1"]["Conv_0"]["kernel"] is True   # stage 1 frozen
    assert b["layer2_0"]["conv1"]["Conv_0"]["kernel"] is False  # stage 2 live
    # norm requires_grad=False freezes BN affine even in live stages
    assert b["layer2_0"]["bn1"]["BatchNorm_0"]["scale"] is True
    assert mask["head"]["cls"]["kernel"] is False

    # no freezing configured -> None (optimizer stays unmasked)
    assert backbone_freeze_mask(params, dict(frozen_stages=-1)) is None
    assert backbone_freeze_mask(params, None) is None


def test_frozen_params_do_not_update():
    params = _tiny_params()
    mask = backbone_freeze_mask(params, dict(frozen_stages=1))
    tx = build_optimizer(params, lr=0.1, grad_clip=1.0, freeze_mask=mask)
    opt_state = tx.init(params)
    grads = jax.tree_util.tree_map(lambda p: jnp.ones_like(p), params)
    updates, _ = tx.update(grads, opt_state, params)
    new_params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

    # frozen: stem + layer1 identical (no adam step, no weight decay)
    for name in ("conv1",):
        np.testing.assert_array_equal(
            new_params["backbone"][name]["Conv_0"]["kernel"],
            params["backbone"][name]["Conv_0"]["kernel"])
    np.testing.assert_array_equal(
        new_params["backbone"]["layer1_0"]["conv1"]["Conv_0"]["kernel"],
        params["backbone"]["layer1_0"]["conv1"]["Conv_0"]["kernel"])
    # live params moved
    assert not np.allclose(
        new_params["backbone"]["layer2_0"]["conv1"]["Conv_0"]["kernel"],
        params["backbone"]["layer2_0"]["conv1"]["Conv_0"]["kernel"])
    assert not np.allclose(new_params["head"]["cls"]["kernel"],
                           params["head"]["cls"]["kernel"])

    # frozen grads are excluded from the clipping norm: with all-ones grads
    # on live params only, the update direction on live params must be
    # identical to an optimizer that never saw the frozen leaves.
    grads_live_only = jax.tree_util.tree_map(
        lambda g, f: jnp.zeros_like(g) if f else g, grads, mask)
    updates2, _ = tx.update(grads_live_only, tx.init(params), params)
    np.testing.assert_allclose(
        np.asarray(updates["head"]["cls"]["kernel"]),
        np.asarray(updates2["head"]["cls"]["kernel"]), rtol=1e-6)


def test_resnet_frozen_stages_stop_gradient():
    """frozen_stages stops backward at the frozen/live boundary: grads of the
    stem and layer1 are exactly zero without any optimizer mask (and XLA can
    drop that part of the backward entirely)."""
    from occformer_tpu.models.resnet import ResNet

    model = ResNet(depth=18, train=True, frozen_stages=1, norm_eval=True)
    x = jnp.asarray(np.random.RandomState(0).randn(1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss(params):
        outs = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]}, x)
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)

    grads = jax.grad(loss)(variables["params"])
    frozen = [grads["conv1"], grads["bn1"], grads["layer1_0"], grads["layer1_1"]]
    for g in frozen:
        for leaf in jax.tree_util.tree_leaves(g):
            np.testing.assert_array_equal(np.asarray(leaf), 0.0)
    live = jax.tree_util.tree_leaves(grads["layer2_0"])
    assert any(np.abs(np.asarray(l)).max() > 0 for l in live)


def test_freeze_mask_stage_zero():
    """frozen_stages=0 (the flagship R50 config) freezes the STEM only —
    regression: `or -1` used to swallow the falsy 0."""
    params = _tiny_params()
    mask = backbone_freeze_mask(params, dict(frozen_stages=0))
    assert mask is not None
    b = mask["backbone"]
    assert b["conv1"]["Conv_0"]["kernel"] is True
    assert b["bn1"]["BatchNorm_0"]["scale"] is True
    assert b["layer1_0"]["conv1"]["Conv_0"]["kernel"] is False
    assert mask["head"]["cls"]["kernel"] is False
