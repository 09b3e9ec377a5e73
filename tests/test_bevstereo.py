"""BEVStereo view transformer tests.

homo_warping is parity-tested against a torch oracle replicating the reference
math (ViewTransformerLSSBEVDepth.py:1008-1098); the EM stereo path and the
module forward are exercised for shapes/finiteness on tiny sizes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from occformer_tpu.models.bevstereo import (
    DepthNetStereo,
    ViewTransformerLSSBEVStereo,
    create_depth_sample_frustum,
    depth_sampling_k_list,
    homo_warping,
)

INPUT_SIZE = (64, 96)  # (H, W) of the augmented image


def _random_mats(rng, bn):
    """Well-conditioned camera/IDA/sensor2sensor 4x4 stacks."""
    intrin = np.tile(np.eye(4, dtype=np.float32), (bn, 1, 1))
    intrin[:, 0, 0] = 40 + 5 * rng.random(bn)
    intrin[:, 1, 1] = 40 + 5 * rng.random(bn)
    intrin[:, 0, 2] = INPUT_SIZE[1] / 2 + rng.random(bn)
    intrin[:, 1, 2] = INPUT_SIZE[0] / 2 + rng.random(bn)
    ida = np.tile(np.eye(4, dtype=np.float32), (bn, 1, 1))
    ida[:, 0, 0] = 0.9 + 0.2 * rng.random(bn)
    ida[:, 1, 1] = 0.9 + 0.2 * rng.random(bn)
    ida[:, 0, 3] = rng.random(bn) * 2 - 1
    ida[:, 1, 3] = rng.random(bn) * 2 - 1
    s2s = np.tile(np.eye(4, dtype=np.float32), (bn, 1, 1))
    th = 0.05 * (rng.random(bn) - 0.5)
    s2s[:, 0, 0] = np.cos(th)
    s2s[:, 0, 2] = np.sin(th)
    s2s[:, 2, 0] = -np.sin(th)
    s2s[:, 2, 2] = np.cos(th)
    s2s[:, :3, 3] = 0.3 * (rng.random((bn, 3)) - 0.5)
    return intrin, ida, s2s


def _torch_homo_warp(feat_nchw, key_int, swp_int, s2s, key_ida, swp_ida,
                     depth_sample, frustum, sdf):
    """Oracle: the reference homo_warping math verbatim in torch."""
    import torch
    import torch.nn.functional as F

    feat = torch.from_numpy(feat_nchw)
    bn, ch, h, w = feat.shape
    pts = torch.from_numpy(frustum).reshape(bn, -1, 4).clone()
    pts[..., 2] = 1
    pts = torch.from_numpy(key_ida).inverse().unsqueeze(1) @ pts.unsqueeze(-1)
    pts[..., :3, :] = pts[..., :3, :] * torch.from_numpy(depth_sample).reshape(bn, -1, 1, 1)
    num_depth = frustum.shape[1]
    pts = torch.from_numpy(key_int).inverse().unsqueeze(1) @ pts
    pts = torch.from_numpy(s2s).unsqueeze(1) @ pts
    pts = torch.from_numpy(swp_int).unsqueeze(1) @ pts
    pts[..., :2, :] = pts[..., :2, :] / pts[..., 2:3, :]
    pts = (torch.from_numpy(swp_ida).unsqueeze(1) @ pts).squeeze(-1)
    neg = pts[..., 2] < 1e-3
    pts[..., 0][neg] = w * sdf
    pts[..., 1][neg] = h * sdf
    pts[..., 2][neg] = 1
    px = pts[..., 0] / ((w * sdf - 1) / 2) - 1
    py = pts[..., 1] / ((h * sdf - 1) / 2) - 1
    grid = torch.stack([px, py], dim=2)
    out = F.grid_sample(feat, grid.view(bn, num_depth * h, w, 2),
                        mode="bilinear", padding_mode="zeros",
                        align_corners=False)
    return out.view(bn, ch, num_depth, h, w).numpy()


@pytest.mark.quick
def test_k_list_matches_reference_formula():
    ks = depth_sampling_k_list(3.0, 3)
    assert len(ks) == 3
    assert ks[1] == pytest.approx(0.0, abs=1e-9)
    assert ks[0] == pytest.approx(-ks[2])


def test_homo_warping_torch_parity():
    torch = pytest.importorskip("torch")  # noqa: F841
    rng = np.random.default_rng(0)
    bn, ch, sdf = 2, 8, 4
    h, w = INPUT_SIZE[0] // sdf, INPUT_SIZE[1] // sdf
    S = 3
    feat = rng.standard_normal((bn, ch, h, w)).astype(np.float32)
    key_int, key_ida, _ = _random_mats(rng, bn)
    swp_int, swp_ida, s2s = _random_mats(rng, bn)
    depth = (5 + 20 * rng.random((bn, S, h, w))).astype(np.float32)
    frustum = np.asarray(create_depth_sample_frustum(
        jnp.asarray(depth), INPUT_SIZE, sdf))

    ours = homo_warping(
        jnp.asarray(np.moveaxis(feat, 1, -1)), jnp.asarray(key_int),
        jnp.asarray(swp_int), jnp.asarray(s2s), jnp.asarray(key_ida),
        jnp.asarray(swp_ida), jnp.asarray(depth), jnp.asarray(frustum), sdf)
    ref = _torch_homo_warp(feat, key_int, swp_int, s2s, key_ida, swp_ida,
                           depth, frustum, sdf)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(ours), -1, 1), ref,
        rtol=2e-4, atol=2e-4)


def _tiny_stereo_module():
    grid_config = {
        "xbound": [-8.0, 8.0, 2.0], "ybound": [-8.0, 8.0, 2.0],
        "zbound": [-2.0, 2.0, 1.0], "dbound": [2.0, 10.0, 0.5],
    }
    return ViewTransformerLSSBEVStereo(
        grid_config=grid_config, data_config={"input_size": INPUT_SIZE},
        numC_input=16, numC_Trans=8, downsample=16, num_ranges=2,
        range_list=((2.0, 6.0), (6.0, 10.0)), em_iteration=2, num_samples=3,
        num_groups=4, stereo_downsample_factor=4)


def test_depthnet_stereo_shapes():
    net = DepthNetStereo(mid_channels=16, context_channels=8,
                         depth_channels=16, num_ranges=2)
    x = jnp.ones((2, 4, 6, 16))
    mlp = jnp.ones((2, 27))
    vars_ = net.init(jax.random.PRNGKey(0), x, mlp)
    y, ctx, mu, sigma, rs, mono = net.apply(vars_, x, mlp)
    assert y.shape == (2, 4, 6, 16)
    assert ctx.shape == (2, 4, 6, 8)
    assert mu.shape == (2, 16, 24, 2) and sigma.shape == (2, 16, 24, 2)
    assert rs.shape == (2, 16, 24, 2)
    assert mono.shape == (2, 4, 6, 16)
    assert np.all(np.asarray(sigma) > 0)


def test_forward_stereo_and_fusion():
    rng = np.random.default_rng(1)
    mod = _tiny_stereo_module()
    bn = 2
    hs, ws = INPUT_SIZE[0] // 4, INPUT_SIZE[1] // 4
    fh, fw = INPUT_SIZE[0] // 16, INPUT_SIZE[1] // 16
    D = 16
    feats = [jnp.asarray(rng.standard_normal((bn, hs, ws, 8)).astype(np.float32))
             for _ in range(2)]
    monos = [jnp.asarray(rng.standard_normal((bn, fh, fw, D)).astype(np.float32))
             for _ in range(2)]
    ints, idas, s2ss = [], [], []
    for _ in range(2):
        i_, a_, s_ = _random_mats(rng, bn)
        ints.append(i_); idas.append(a_); s2ss.append(s_)
    mats = {
        "intrin_mats": jnp.asarray(np.stack(ints, 1)),
        "ida_mats": jnp.asarray(np.stack(idas, 1)),
        "sensor2sensor_mats": jnp.asarray(np.stack(s2ss, 1)),
    }
    mus = [jnp.asarray(rng.standard_normal((bn, hs, ws, 2)).astype(np.float32))
           for _ in range(2)]
    sigmas = [jnp.ones((bn, hs, ws, 2), jnp.float32) * 2.0 for _ in range(2)]
    rss = [jnp.asarray(rng.standard_normal((bn, hs, ws, 2)).astype(np.float32))
           for _ in range(2)]

    def run(self, feats, monos, mats, mus, sigmas, rss):
        sd, ms = self.forward_stereo(0, feats, monos, mats, mus, sigmas, rss)
        prob = self.fuse_depth(monos[0], sd, ms)
        return sd, ms, prob

    vars_ = mod.init(jax.random.PRNGKey(0), feats, monos, mats, mus, sigmas,
                     rss, method=run)
    sd, ms, prob = mod.apply(vars_, feats, monos, mats, mus, sigmas, rss,
                             method=run)
    assert sd.shape == (bn, hs, ws, D)
    assert ms.shape == (bn, fh, fw, D)
    assert prob.shape == (bn, fh, fw, D)
    assert np.all(np.isfinite(np.asarray(sd)))
    assert np.all(np.asarray(ms) >= 0) and np.all(np.asarray(ms) <= 1)
    np.testing.assert_allclose(np.asarray(jnp.sum(prob, -1)), 1.0, rtol=1e-5)
    # every depth bin belongs to exactly one range slice -> scores nonneg
    assert np.all(np.asarray(sd) >= 0)


def test_lift_splat_forward():
    rng = np.random.default_rng(2)
    mod = _tiny_stereo_module()
    B, N = 1, 2
    fh, fw = INPUT_SIZE[0] // 16, INPUT_SIZE[1] // 16
    D = 16
    img_feat = jnp.asarray(rng.standard_normal((B, N, fh, fw, 8)).astype(np.float32))
    depth_prob = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((B * N, fh, fw, D)).astype(np.float32)), -1)
    rots = jnp.tile(jnp.eye(3), (B, N, 1, 1))
    trans = jnp.zeros((B, N, 3))
    intrins = jnp.asarray(np.tile(np.diag([30.0, 30.0, 1.0]), (B, N, 1, 1)))
    intrins = intrins.at[:, :, 0, 2].set(fw * 8.0).at[:, :, 1, 2].set(fh * 8.0)
    post_rots = jnp.tile(jnp.eye(3), (B, N, 1, 1))
    post_trans = jnp.zeros((B, N, 3))
    bda = jnp.tile(jnp.eye(3), (B, 1, 1))

    vars_ = mod.init(jax.random.PRNGKey(0), img_feat, depth_prob, rots, trans,
                     intrins, post_rots, post_trans, bda)
    vol = mod.apply(vars_, img_feat, depth_prob, rots, trans, intrins,
                    post_rots, post_trans, bda)
    assert vol.shape == (B, 8, 8, 4, 8)
    assert np.all(np.isfinite(np.asarray(vol)))
