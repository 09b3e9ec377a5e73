"""Deformable-attention 3D core vs a torch grid_sample oracle.

The oracle re-implements the sampling+weighting math of the reference's
pure-torch path (multi_scale_deform_attn_3d.py:17-80) directly with torch
grid_sample, in OUR coordinate convention, to pin down the gather-lerp core.
"""
import pytest
import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from occformer_tpu.models.deform_attn import MultiScaleDeformableAttention3D


def _torch_core(value, shapes, locs, weights):
    """value [B, Nv, H, hd]; locs [B, Nq, H, L, P, 3] in [0,1] (x,y,z);
    weights [B, Nq, H, L, P] -> [B, Nq, H*hd]."""
    B, Nv, H, hd = value.shape
    Nq = locs.shape[1]
    L = len(shapes)
    P = locs.shape[4]
    out = torch.zeros(B, Nq, H, hd)
    start = 0
    for l, (X, Y, Z) in enumerate(shapes):
        n = X * Y * Z
        v = value[:, start : start + n]  # [B, n, H, hd]
        v = v.permute(0, 2, 3, 1).reshape(B * H, hd, X, Y, Z)
        g = locs[:, :, :, l] * 2 - 1  # [B, Nq, H, P, 3] (x, y, z)
        # torch grid coord order reversed relative to volume dims
        g = g.flip(-1).permute(0, 2, 1, 3, 4).reshape(B * H, Nq, P, 1, 3)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)  # [B*H, hd, Nq, P, 1]
        s = s[..., 0].reshape(B, H, hd, Nq, P)
        w = weights[:, :, :, l].permute(0, 2, 1, 3)  # [B, H, Nq, P]
        out += torch.einsum("bhdqp,bhqp->bqhd", s, w)
        start += n
    return out.reshape(B, Nq, H * hd)


@pytest.mark.quick
def test_deform_attn_core_matches_torch(rng):
    B, H, hd, Nq, L, P = 2, 4, 8, 10, 2, 3
    shapes = [(4, 5, 3), (2, 3, 2)]
    Nv = sum(x * y * z for x, y, z in shapes)
    C = H * hd

    model = MultiScaleDeformableAttention3D(
        embed_dims=C, num_heads=H, num_levels=L, num_points=P)
    query = rng.randn(B, Nq, C).astype(np.float32)
    value = rng.randn(B, Nv, C).astype(np.float32)
    ref_pts = rng.uniform(0.1, 0.9, (B, Nq, L, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(query),
                           jnp.asarray(value), jnp.asarray(ref_pts), shapes)
    out = np.asarray(model.apply(variables, jnp.asarray(query),
                                 jnp.asarray(value), jnp.asarray(ref_pts), shapes))

    # oracle: replicate the module's linear layers with numpy, then the
    # sampling core with torch grid_sample
    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    vproj = value @ p["value_proj"]["Dense_0"]["kernel"] + p["value_proj"]["Dense_0"]["bias"]
    offs = query @ p["sampling_offsets"]["Dense_0"]["kernel"] + p["sampling_offsets"]["Dense_0"]["bias"]
    offs = offs.reshape(B, Nq, H, L, P, 3)
    w = query @ p["attention_weights"]["Dense_0"]["kernel"] + p["attention_weights"]["Dense_0"]["bias"]
    w = torch.softmax(torch.from_numpy(w.reshape(B, Nq, H, L * P)), -1)
    w = w.reshape(B, Nq, H, L, P)
    normalizer = np.array([[s[0], s[1], s[2]] for s in shapes], np.float32)
    locs = ref_pts[:, :, None, :, None, :] + offs / normalizer[None, None, None, :, None, :]

    core = _torch_core(
        torch.from_numpy(vproj.reshape(B, Nv, H, hd)), shapes,
        torch.from_numpy(locs.astype(np.float32)), w,
    ).numpy()
    expected = core @ p["output_proj"]["Dense_0"]["kernel"] + p["output_proj"]["Dense_0"]["bias"]
    expected = expected + query  # identity residual
    np.testing.assert_allclose(out, expected, rtol=1e-3, atol=1e-4)


def test_offset_bias_init_radial():
    from occformer_tpu.models.deform_attn import deform_attn_offset_bias_init

    b = deform_attn_offset_bias_init(8, 3, 4).reshape(8, 3, 4, 3)
    # point scaling: point i+1 has (i+1)x the magnitude of point 0
    np.testing.assert_allclose(b[:, :, 3, :], 4 * b[:, :, 0, :], rtol=1e-5)
    # max-|component| normalized to 1 at point 0
    np.testing.assert_allclose(np.abs(b[:, 0, 0, :]).max(-1), 1.0, rtol=1e-5)


def test_query_chunking_matches_unchunked():
    """query_chunks is a pure remat/memory lever: outputs are identical."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from occformer_tpu.models.deform_attn import MultiScaleDeformableAttention3D

    B, C, H = 1, 24, 4
    shapes = ((4, 4, 2), (2, 2, 1))
    Nv = sum(x * y * z for x, y, z in shapes)
    Nq = 37  # deliberately not divisible by the chunk count
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, Nq, C), jnp.float32)
    v = jnp.asarray(rng.randn(B, Nv, C), jnp.float32)
    ref = jnp.asarray(rng.uniform(0.05, 0.95, (B, Nq, len(shapes), 3)),
                      jnp.float32)

    m1 = MultiScaleDeformableAttention3D(
        embed_dims=C, num_heads=H, num_levels=2, num_points=3, query_chunks=1)
    m5 = MultiScaleDeformableAttention3D(
        embed_dims=C, num_heads=H, num_levels=2, num_points=3, query_chunks=5)
    variables = m1.init(jax.random.PRNGKey(0), q, v, ref, shapes)
    o1 = m1.apply(variables, q, v, ref, shapes)
    o5 = m5.apply(variables, q, v, ref, shapes)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o5),
                               rtol=1e-6, atol=1e-6)

    # gradients flow and agree through the chunked (checkpointed) path
    def loss(params, mod):
        return jnp.sum(mod.apply({"params": params}, q, v, ref, shapes) ** 2)

    g1 = jax.grad(loss)(variables["params"], m1)
    g5 = jax.grad(loss)(variables["params"], m5)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g5)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)



@pytest.mark.quick
@pytest.mark.parametrize("fused", [False, True])
def test_gather_impl_mxu_matches_xla(fused):
    """The Pallas MXU gather (interpret mode on CPU) must match the XLA
    path through the full deform-attn module, values AND parameter/input
    gradients — this is the round-4 hot-path kernel guard (VERDICT r3 #6).
    fused=True additionally covers the round-5 single-call multi-level
    kernel (ops/trilerp_fused.py) through the module."""
    B, C, H = 1, 24, 4
    shapes = ((4, 4, 2), (2, 2, 1))
    Nv = sum(x * y * z for x, y, z in shapes)
    Nq = 37
    rng = np.random.RandomState(7)
    q = jnp.asarray(rng.randn(B, Nq, C), jnp.float32)
    v = jnp.asarray(rng.randn(B, Nv, C), jnp.float32)
    ref = jnp.asarray(rng.uniform(0.05, 0.95, (B, Nq, len(shapes), 3)),
                      jnp.float32)

    mx = MultiScaleDeformableAttention3D(
        embed_dims=C, num_heads=H, num_levels=2, num_points=3,
        gather_impl="xla")
    mm = MultiScaleDeformableAttention3D(
        embed_dims=C, num_heads=H, num_levels=2, num_points=3,
        gather_impl="mxu_interpret", gather_fused=fused)
    variables = mx.init(jax.random.PRNGKey(0), q, v, ref, shapes)
    ox = mx.apply(variables, q, v, ref, shapes)
    om = mm.apply(variables, q, v, ref, shapes)
    np.testing.assert_allclose(np.asarray(ox), np.asarray(om),
                               rtol=1e-5, atol=1e-5)

    def loss(params, mod, qq):
        return jnp.sum(jnp.sin(mod.apply({"params": params}, qq, v, ref,
                                         shapes)))

    gx = jax.grad(loss, (0, 2))(variables["params"], mx, q)
    gm = jax.grad(loss, (0, 2))(variables["params"], mm, q)
    for a, b in zip(jax.tree_util.tree_leaves(gx),
                    jax.tree_util.tree_leaves(gm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
