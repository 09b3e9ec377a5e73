"""SinePositionalEncoding3D numeric parity vs the reference formula.

Oracle: verbatim torch replica of the reference forward (positional_encodings/
positional_encoding.py:58-110) on an all-valid mask, which is the only way
OccFormer calls it (volumes are never padded).
"""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from occformer_tpu.models.pos_embed import sine_positional_encoding_3d


def _torch_oracle(shape, num_feats, temperature=10000.0, scale=2 * math.pi,
                  eps=1e-6, offset=0.0):
    X, Y, Z = shape
    not_mask = torch.ones((1, X, Y, Z), dtype=torch.int)
    x_embed = not_mask.cumsum(1, dtype=torch.float32)
    y_embed = not_mask.cumsum(2, dtype=torch.float32)
    z_embed = not_mask.cumsum(3, dtype=torch.float32)
    x_embed = (x_embed + offset) / (x_embed[:, -1:] + eps) * scale
    y_embed = (y_embed + offset) / (y_embed[:, :, -1:] + eps) * scale
    z_embed = (z_embed + offset) / (z_embed[:, :, :, -1:] + eps) * scale
    dim_t = torch.arange(num_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / num_feats)
    outs = []
    for emb in (x_embed, y_embed, z_embed):
        pos = emb[..., None] / dim_t
        pos = torch.stack((pos[..., 0::2].sin(), pos[..., 1::2].cos()),
                          dim=5).view(1, X, Y, Z, -1)
        outs.append(pos)
    return torch.cat(outs, dim=4)[0].numpy()  # [X, Y, Z, 3F]


@pytest.mark.parametrize("shape,num_feats", [((5, 4, 3), 6), ((8, 8, 2), 16)])
@pytest.mark.quick
def test_sine_pos_encoding_matches_reference(shape, num_feats):
    ours = sine_positional_encoding_3d(shape, num_feats)
    ref = _torch_oracle(shape, num_feats)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-6, atol=1e-6)
