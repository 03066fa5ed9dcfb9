"""FGD embedder structure tests: topology math + latent shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raggesture_tpu.models import eval_fgd as F


def test_edge_topology():
    parents = F.default_smplx_parents()
    edges = F.build_edge_topology(parents)
    assert len(edges) == 55  # virtual root edge + 54 child edges
    assert edges[0] == (0, 55)
    # 330-d input = 55 edges x 6 channels (the FGD eval feature dim)
    assert len(edges) * 6 == 330


def test_neighbor_symmetric():
    edges = F.build_edge_topology([-1, 0, 1, 2])
    nbrs = F.find_neighbor(edges, 2)
    for i, ns in enumerate(nbrs):
        assert i in ns
        for j in ns:
            assert i in nbrs[j]


def test_pooling_halves_chains():
    edges = F.build_edge_topology([-1, 0, 1, 2, 3])  # simple chain, 5 edges
    pooling, new_edges = F.find_pooling(edges, last_pool=False)
    total = sum(len(p) for p in pooling)
    assert total == len(edges)
    assert len(new_edges) == len(pooling)
    pooling_last, _ = F.find_pooling(edges, last_pool=True)
    assert all(len(p) >= 1 for p in pooling_last)


def test_conv_mask_blocks():
    mask = F.conv_mask([[0], [0, 1]], in_per_joint=2, out_per_joint=3, kernel=4)
    assert mask.shape == (6, 4, 4)
    # edge 0 sees only edge 0's input channels
    assert mask[:3, :2].all() and not mask[:3, 2:].any()
    # edge 1 sees both
    assert mask[3:, :].all()


@pytest.mark.slow
def test_fgd_embedder_shapes():
    cfg = F.FGDConfig()
    model = F.FGDEmbedder(cfg)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 330), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x)

    @jax.jit
    def run(p, x):
        return model.apply(p, x, method=model.map2latent)

    z = run(params, x)
    # 32 frames / 2^4 temporal stride -> 2; latent flattened to 240
    assert z.shape == (2, 2, 240)
    out = jax.jit(lambda p, x: model.apply(p, x))(params, x)
    assert out["rec_pose"].shape == (2, 32, 330)
    assert np.isfinite(np.asarray(out["rec_pose"])).all()
