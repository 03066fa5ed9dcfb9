"""FGD embedder: skeleton-aware convolutional autoencoder (VAESKConv).

Rebuild of the EMAGE evaluation model the reference loads from
``AESKConv_240_100.bin`` (/root/reference/mogen/models/eval_models/model.py:
12-252 and skeleton.py): a LocalEncoder of skeleton-masked strided convs +
mean skeleton pooling over the SMPL-X kinematic tree, whose 240-d latents
feed the Frechet Gesture Distance (tools/evaluate.py:91-97, 159-165,
258-275).

Shipped eval hyperparameters (tools/evaluate.py:91-97): input 330 (= 55
edges x 6d rotation channels), 4 layers, channel growth [1,1,2,1] on base 6,
kernel 4 stride 2 (T/16 temporal reduction), latent 240, non-variational.

Skeleton machinery (edge topology, distance-d edge neighborhoods, chain
pooling) is static host-side preprocessing; the masked convs are ordinary
XLA conv1ds with a fixed 0/1 weight mask (identical math to the reference's
masked F.conv1d), so the whole embedder jit-compiles to dense MXU convs.

Replicated quirk: SkeletonResidual inserts ``GroupNorm(10, out_channels)``
after the strided conv (skeleton.py:569 — EMAGE's in-code FIXME) — kept for
checkpoint parity.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------------------
# static skeleton topology helpers (host-side)
# ---------------------------------------------------------------------------


def build_edge_topology(parents: Sequence[int]) -> List[Tuple[int, int]]:
    """(parent, child) edge list with a virtual root edge (0, J)
    (skeleton.py:320-327)."""
    J = len(parents)
    edges = [(0, J)]
    for i in range(1, J):
        edges.append((int(parents[i]), i))
    return edges


def calc_edge_distances(edges: List[Tuple[int, int]]) -> np.ndarray:
    """All-pairs edge distances: adjacent (sharing a joint) = 1, then
    Floyd-Warshall (skeleton.py:377-400)."""
    n = len(edges)
    mat = np.full((n, n), 100000, np.int64)
    np.fill_diagonal(mat, 0)
    for i, a in enumerate(edges):
        for j, b in enumerate(edges):
            if a[0] in b or a[1] in b:
                mat[i, j] = 1
    for k in range(n):
        mat = np.minimum(mat, mat[:, k : k + 1] + mat[k : k + 1, :])
    return mat


def find_neighbor(edges: List[Tuple[int, int]], d: int) -> List[List[int]]:
    mat = calc_edge_distances(edges)
    return [list(np.where(mat[i] <= d)[0]) for i in range(len(edges))]


def find_pooling(edges: List[Tuple[int, int]], last_pool: bool
                 ) -> Tuple[List[List[int]], List[Tuple[int, int]]]:
    """Chain-based skeleton pooling (skeleton.py:166-233): split the edge
    graph into chains between branching joints / end effectors, then merge
    consecutive edge pairs (or whole chains when last_pool)."""
    degree = [0] * 1000
    for a, b in edges:
        degree[a] += 1
        degree[b] += 1

    seq_list: List[List[int]] = []

    def find_seq(j: int, seq: List[int]):
        if degree[j] > 2 and j != 0:
            seq_list.append(seq)
            seq = []
        if degree[j] == 1:
            seq_list.append(seq)
            return
        for idx, e in enumerate(edges):
            if e[0] == j:
                find_seq(e[1], seq + [idx])

    find_seq(0, [])

    pooling_list: List[List[int]] = []
    new_edges: List[Tuple[int, int]] = []
    for seq in seq_list:
        if last_pool:
            pooling_list.append(seq)
            continue
        if len(seq) % 2 == 1:
            pooling_list.append([seq[0]])
            new_edges.append(edges[seq[0]])
            seq = seq[1:]
        for i in range(0, len(seq), 2):
            pooling_list.append([seq[i], seq[i + 1]])
            new_edges.append((edges[seq[i]][0], edges[seq[i + 1]][1]))
    return pooling_list, new_edges


def pool_matrix(pooling_list: List[List[int]], in_edges: int,
                channels_per_edge: int) -> np.ndarray:
    """Mean-pool matrix (out_edges*c, in_edges*c) (skeleton.py:226-233)."""
    w = np.zeros((len(pooling_list) * channels_per_edge,
                  in_edges * channels_per_edge), np.float32)
    for i, pair in enumerate(pooling_list):
        for j in pair:
            for c in range(channels_per_edge):
                w[i * channels_per_edge + c, j * channels_per_edge + c] = (
                    1.0 / len(pair)
                )
    return w


def conv_mask(neighbour_list: List[List[int]], in_per_joint: int,
              out_per_joint: int, kernel: int) -> np.ndarray:
    """0/1 weight mask (out_ch, in_ch, k): each edge's output channels see
    only its distance-d neighbor edges' input channels (skeleton.py:63-66)."""
    n = len(neighbour_list)
    mask = np.zeros((n * out_per_joint, n * in_per_joint, kernel), np.float32)
    for i, nbrs in enumerate(neighbour_list):
        cols = [k * in_per_joint + c for k in nbrs for c in range(in_per_joint)]
        mask[i * out_per_joint : (i + 1) * out_per_joint, cols, :] = 1.0
    return mask


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------


class SkeletonConv(nn.Module):
    """Masked conv1d over (B, C, T) with constant padding."""

    mask: np.ndarray  # (out_ch, in_ch, k)
    stride: int
    padding: int

    @nn.compact
    def __call__(self, x):  # x: (B, C_in, T)
        out_ch, in_ch, k = self.mask.shape
        w = self.param(
            "weight",
            lambda key, shape: jax.nn.initializers.he_uniform(
                in_axis=1, out_axis=0, batch_axis=()
            )(key, shape),
            (out_ch, in_ch, k),
        )
        b = self.param("bias", nn.initializers.zeros, (out_ch,))
        w = w * jnp.asarray(self.mask)
        xp = jnp.pad(x, ((0, 0), (0, 0), (self.padding, self.padding)))
        y = jax.lax.conv_general_dilated(
            xp, w, (self.stride,), "VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        return y + b[None, :, None]


class SkeletonResidualLayer(nn.Module):
    """One encoder stage: strided masked conv + GroupNorm(10) residual,
    k=1 strided masked shortcut, optional mean pool, Tanh
    (skeleton.py:551-589)."""

    res_mask: np.ndarray
    short_mask: np.ndarray
    pool_w: np.ndarray  # (out_edges*c, in_edges*c) or None-size for no pool
    do_pool: bool
    kernel: int = 4

    @nn.compact
    def __call__(self, x):  # (B, C, T)
        pad = (self.kernel - 1) // 2
        res = SkeletonConv(self.res_mask, stride=2, padding=pad, name="conv")(x)
        res = nn.GroupNorm(num_groups=10, epsilon=1e-5, use_bias=True,
                           use_scale=True, name="norm")(
            res.transpose(0, 2, 1)
        ).transpose(0, 2, 1)
        short = SkeletonConv(self.short_mask, stride=2, padding=0,
                             name="shortcut")(x)
        y = res + short
        if self.do_pool:
            y = jnp.einsum("oc,bct->bot", jnp.asarray(self.pool_w), y)
        return jnp.tanh(y)


@dataclasses.dataclass(frozen=True)
class FGDConfig:
    """tools/evaluate.py:91-97."""

    input_dim: int = 330
    latent_dim: int = 240
    num_layers: int = 4
    channel_base: int = 6
    grow: Tuple[int, ...] = (1, 1, 2, 1)
    skeleton_dist: int = 2
    kernel_size: int = 4
    window: int = 32
    stride: int = 20
    variational: bool = False


def default_smplx_parents() -> np.ndarray:
    """The 55-joint SMPL-X kinematic tree (standard SMPLX_NEUTRAL_2020
    kintree, body 0-21, jaw 22, eyes 23-24, left hand 25-39, right 40-54)."""
    return np.array([
        -1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
        18, 19, 15, 15, 15,
        20, 25, 26, 20, 28, 29, 20, 31, 32, 20, 34, 35, 20, 37, 38,
        21, 40, 41, 21, 43, 44, 21, 46, 47, 21, 49, 50, 21, 52, 53,
    ], np.int32)


class LocalSkeletonEncoder(nn.Module):
    """The 4-stage skeleton conv encoder (model.py:12-107)."""

    cfg: FGDConfig
    parents: Tuple[int, ...]

    def setup(self):
        c = self.cfg
        edges = build_edge_topology(list(self.parents))
        topologies = [edges]
        cb = [c.channel_base]
        for g in c.grow:
            cb.append(cb[-1] * g)

        layers = []
        self._out_dim = None
        for i in range(c.num_layers):
            nbrs = find_neighbor(topologies[i], c.skeleton_dist)
            in_per = cb[i]
            out_per = cb[i + 1]
            last_pool = i == c.num_layers - 1
            pooling_list, new_edges = find_pooling(topologies[i], last_pool)
            n_edges = len(topologies[i])
            do_pool = len(pooling_list) != n_edges
            layers.append(
                SkeletonResidualLayer(
                    res_mask=conv_mask(nbrs, in_per, out_per, c.kernel_size),
                    # the reference shortcut SkeletonConv uses the FULL
                    # neighbour list too (skeleton.py:573-575), not identity
                    short_mask=conv_mask(nbrs, in_per, out_per, 1),
                    pool_w=pool_matrix(pooling_list, n_edges, out_per),
                    do_pool=do_pool,
                    kernel=c.kernel_size,
                    name=f"layer_{i}",
                )
            )
            topologies.append(new_edges if not last_pool else
                              [(0, 0)] * len(pooling_list))
        self.layers_seq = layers

    def __call__(self, x):  # (B, T, D)
        y = x.transpose(0, 2, 1)
        for layer in self.layers_seq:
            y = layer(y)
        return y.transpose(0, 2, 1)  # (B, T/16, latent)


class FGDEmbedder(nn.Module):
    """map2latent + conv decoder (VAESKConv, model.py:207-252)."""

    cfg: FGDConfig = FGDConfig()
    parents: Tuple[int, ...] = tuple(default_smplx_parents().tolist())

    def setup(self):
        self.encoder = LocalSkeletonEncoder(self.cfg, self.parents,
                                            name="encoder")
        self.decoder = ConvDecoder(self.cfg, name="decoder")
        if self.cfg.variational:
            self.fc_mu = nn.Dense(self.cfg.latent_dim, name="fc_mu")
            self.fc_logvar = nn.Dense(self.cfg.latent_dim, name="fc_logvar")

    def map2latent(self, poses_6d):
        """(B, T, 330) 6d poses -> (B, T/16, latent) FGD latents."""
        z = self.encoder(poses_6d)
        if self.cfg.variational:
            mu = self.fc_mu(z)
            logvar = self.fc_logvar(z)
            z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(
                self.make_rng("vae"), mu.shape
            )
        return z

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, poses_6d):
        z = self.map2latent(poses_6d)
        return {"poses_feat": z, "rec_pose": self.decode(z)}


class ConvDecoder(nn.Module):
    """VQDecoderV3 (model.py:165-198): 2 res blocks + num_layers x
    (2x nearest upsample + conv + leaky relu) + final conv."""

    cfg: FGDConfig

    @nn.compact
    def __call__(self, z):  # (B, T', latent)
        c = self.cfg
        x = z.transpose(0, 2, 1)  # (B, C, T)

        def conv(x, out_ch, k, name):
            w = self.param(f"{name}_w", nn.initializers.xavier_normal(),
                           (out_ch, x.shape[1], k))
            b = self.param(f"{name}_b", nn.initializers.zeros, (out_ch,))
            pad = (k - 1) // 2
            xp = jnp.pad(x, ((0, 0), (0, 0), (pad, pad)))
            y = jax.lax.conv_general_dilated(
                xp, w, (1,), "VALID", dimension_numbers=("NCH", "OIH", "NCH")
            )
            return y + b[None, :, None]

        def resblock(x, name):
            y = conv(x, x.shape[1], 3, f"{name}_c1")
            y = jax.nn.leaky_relu(y, 0.2)
            y = conv(y, x.shape[1], 3, f"{name}_c2")
            return x + y

        x = resblock(x, "res0")
        x = resblock(x, "res1")
        channels = [c.latent_dim] * (c.num_layers - 1) + [c.latent_dim, c.input_dim]
        for i in range(c.num_layers):
            x = jnp.repeat(x, 2, axis=-1)  # nearest 2x upsample
            x = conv(x, channels[i + 1] if i + 1 < len(channels) else channels[-1],
                     3, f"up{i}")
            x = jax.nn.leaky_relu(x, 0.2)
        x = conv(x, x.shape[1], 3, "final")
        return x.transpose(0, 2, 1)
