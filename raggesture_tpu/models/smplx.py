"""SMPL-X body model: batched linear blend skinning in pure JAX.

The reference uses the ``smplx`` PyTorch package for (a) foot-contact
computation during dataset cache building (/root/reference/mogen/datasets/
beatx_dataset.py:381-424, FK in 128-frame GPU batches), (b) evaluation FK to
55 joints + face vertices (tools/evaluate.py:286-355), and (c) pose recovery
for visualization.  This is the TPU-native equivalent: one jit/vmap-able LBS
over (betas 300, expressions 100, 55 joints) loaded from the standard
SMPLX_NEUTRAL_2020.npz.

Everything is a pure function of a :class:`SmplxModel` pytree — FK for a
whole motion clip is one batched matmul chain on the MXU rather than a
frame-chunked loop.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rotations import axis_angle_to_matrix

NUM_JOINTS = 55  # SMPL-X: 22 body + 1 jaw + 2 eyes + 30 hands


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class SmplxModel:
    """Model constants as device arrays."""

    v_template: jnp.ndarray     # (V, 3)
    shapedirs: jnp.ndarray      # (V, 3, n_betas)
    exprdirs: jnp.ndarray       # (V, 3, n_expr)
    posedirs: jnp.ndarray       # (9*(J-1), V*3)
    j_regressor: jnp.ndarray    # (J, V)
    parents: jnp.ndarray        # (J,) int32, parents[0] == -1
    lbs_weights: jnp.ndarray    # (V, J)

    def tree_flatten(self):
        return (
            (self.v_template, self.shapedirs, self.exprdirs, self.posedirs,
             self.j_regressor, self.parents, self.lbs_weights),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_joints(self) -> int:
        return self.j_regressor.shape[0]


def load_smplx(npz_path: str, num_betas: int = 300, num_expr: int = 100
               ) -> SmplxModel:
    """Load SMPLX_NEUTRAL_2020.npz (the standard smplx release layout:
    shapedirs stores betas and expressions concatenated at [..., 300:400])."""
    d = np.load(npz_path, allow_pickle=True)
    shapedirs = np.asarray(d["shapedirs"], np.float32)
    if shapedirs.shape[-1] >= num_betas + num_expr:
        betas_dirs = shapedirs[..., :num_betas]
        expr_dirs = shapedirs[..., num_betas : num_betas + num_expr]
    else:
        betas_dirs = shapedirs[..., :num_betas]
        expr_dirs = np.zeros(shapedirs.shape[:2] + (num_expr,), np.float32)
    posedirs = np.asarray(d["posedirs"], np.float32)
    if posedirs.ndim == 3:  # (V, 3, P) -> (P, V*3)
        posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T
    parents = np.asarray(d["kintree_table"], np.int64)
    if parents.ndim == 2:
        parents = parents[0]
    parents = parents.astype(np.int32)
    parents[0] = -1
    return SmplxModel(
        v_template=jnp.asarray(d["v_template"], jnp.float32),
        shapedirs=jnp.asarray(betas_dirs),
        exprdirs=jnp.asarray(expr_dirs),
        posedirs=jnp.asarray(posedirs),
        j_regressor=jnp.asarray(d["J_regressor"], jnp.float32),
        parents=jnp.asarray(parents),
        lbs_weights=jnp.asarray(d["weights"], jnp.float32),
    )


def load_smplx_faces(npz_path: str) -> np.ndarray:
    """(F, 3) int32 triangle list from the SMPL-X npz (key ``f`` in the
    standard release; ``faces`` accepted too).  Kept out of
    :class:`SmplxModel` — faces are render-only and never enter jit."""
    d = np.load(npz_path, allow_pickle=True)
    for key in ("f", "faces"):
        if key in d:
            return np.asarray(d[key], np.int32)
    raise KeyError(f"no face array ('f'/'faces') in {npz_path}")


def synthetic_faces(num_joints: int = 4, verts_per_joint: int = 6
                    ) -> np.ndarray:
    """Triangle list matching :func:`synthetic_model`'s vertex layout: a fan
    over each joint's vertex cluster (valid indices, nondegenerate)."""
    faces = []
    for j in range(num_joints):
        base = j * verts_per_joint
        for k in range(1, verts_per_joint - 1):
            faces.append([base, base + k, base + k + 1])
    return np.asarray(faces, np.int32)


def synthetic_model(num_joints: int = 4, verts_per_joint: int = 6,
                    seed: int = 0, num_betas: int = 10, num_expr: int = 5,
                    posedirs: bool = False) -> SmplxModel:
    """A well-formed synthetic rig: a joint chain with vertex clusters
    rigidly attached to each joint.

    Defaults give the tiny hermetic-test rig; ``num_joints=55,
    verts_per_joint=190, num_betas=300, num_expr=100, posedirs=True``
    gives a release-SHAPE stand-in (J=55, V=10450 ~ SMPL-X's 10475) whose
    FK/LBS device cost matches the real asset — used by the bench's
    eval-suite row where the 3 GB asset can't be downloaded."""
    r = np.random.RandomState(seed)
    J, V = num_joints, num_joints * verts_per_joint
    joints = np.cumsum(r.rand(J, 3).astype(np.float32) * 0.3, axis=0)
    v_template = np.concatenate(
        [joints[j] + r.randn(verts_per_joint, 3).astype(np.float32) * 0.05
         for j in range(J)], axis=0,
    )
    weights = np.zeros((V, J), np.float32)
    for j in range(J):
        weights[j * verts_per_joint : (j + 1) * verts_per_joint, j] = 1.0
    j_reg = np.zeros((J, V), np.float32)
    for j in range(J):
        j_reg[j, j * verts_per_joint : (j + 1) * verts_per_joint] = (
            1.0 / verts_per_joint
        )
    # make the regressed rest joints consistent with the chain
    rest = j_reg @ v_template
    parents = np.arange(-1, J - 1, dtype=np.int32)
    pd = (r.randn(9 * (J - 1), V * 3).astype(np.float32) * 1e-3 if posedirs
          else np.zeros((9 * (J - 1), V * 3), np.float32))
    return SmplxModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(
            r.randn(V, 3, num_betas).astype(np.float32) * 0.01),
        exprdirs=jnp.asarray(
            r.randn(V, 3, num_expr).astype(np.float32) * 0.01
            if num_expr != 5 else np.zeros((V, 3, 5), np.float32)),
        posedirs=jnp.asarray(pd),
        j_regressor=jnp.asarray(j_reg),
        parents=jnp.asarray(parents),
        lbs_weights=jnp.asarray(weights),
    )


def _rigid_transform_chain(rot_mats: jnp.ndarray, rest_joints: jnp.ndarray,
                           parents: jnp.ndarray
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compose per-joint local rotations along the kinematic tree.

    rot_mats: (..., J, 3, 3); rest_joints: (J, 3).
    Returns (posed_joints (..., J, 3), rel_transforms (..., J, 4, 4)).

    Implemented as a scan over joints in topological order (parents array is
    already topologically sorted in SMPL-X) — J=55 sequential 4x4 composes,
    batched over all frames on the MXU.
    """
    J = rest_joints.shape[0]
    rel_pos = rest_joints - jnp.where(
        (parents < 0)[:, None], 0.0, rest_joints[jnp.maximum(parents, 0)]
    )

    batch_shape = rot_mats.shape[:-3]
    local = jnp.zeros(batch_shape + (J, 4, 4), rot_mats.dtype)
    local = local.at[..., :3, :3].set(rot_mats)
    local = local.at[..., :3, 3].set(
        jnp.broadcast_to(rel_pos, batch_shape + (J, 3))
    )
    local = local.at[..., 3, 3].set(1.0)

    def body(carry, j):
        # carry: (..., J, 4, 4) world transforms accumulated so far
        world = carry
        parent = jnp.maximum(parents[j], 0)
        parent_tf = jnp.where(
            parents[j] < 0,
            jnp.broadcast_to(jnp.eye(4, dtype=rot_mats.dtype),
                             batch_shape + (4, 4)),
            world[..., parent, :, :],
        )
        tf_j = parent_tf @ local[..., j, :, :]
        world = world.at[..., j, :, :].set(tf_j)
        return world, None

    world0 = jnp.zeros(batch_shape + (J, 4, 4), rot_mats.dtype)
    world, _ = jax.lax.scan(body, world0, jnp.arange(J))

    posed_joints = world[..., :3, 3]
    # relative transforms for skinning: world * inv(rest translation)
    rest_h = jnp.concatenate(
        [rest_joints, jnp.zeros((J, 1), rot_mats.dtype)], axis=-1
    )
    correction = jnp.einsum("...jab,jb->...ja", world, rest_h)
    rel = world.at[..., :3, 3].add(-correction[..., :3])
    return posed_joints, rel


def lbs(model: SmplxModel, betas: jnp.ndarray, pose_aa: jnp.ndarray,
        expression: Optional[jnp.ndarray] = None,
        transl: Optional[jnp.ndarray] = None,
        return_verts: bool = True) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Batched SMPL-X forward.

    betas: (B, n_betas); pose_aa: (B, J*3) axis-angle (global orient first);
    expression: (B, n_expr); transl: (B, 3).
    Returns (joints (B, J, 3), vertices (B, V, 3) or None).
    """
    B = pose_aa.shape[0]
    J = model.num_joints

    v_shaped = model.v_template + jnp.einsum(
        "vdk,bk->bvd", model.shapedirs, betas
    )
    if expression is not None:
        v_shaped = v_shaped + jnp.einsum(
            "vdk,bk->bvd", model.exprdirs, expression
        )
    rest_joints = jnp.einsum("jv,bvd->bjd", model.j_regressor, v_shaped)

    rot = axis_angle_to_matrix(pose_aa.reshape(B, J, 3))

    # pose-dependent corrective blendshapes
    eye = jnp.eye(3, dtype=rot.dtype)
    pose_feature = (rot[:, 1:] - eye).reshape(B, -1)
    if return_verts and model.posedirs.size:
        pose_offsets = (pose_feature @ model.posedirs).reshape(B, -1, 3)
        v_posed = v_shaped + pose_offsets
    else:
        v_posed = v_shaped

    # per-sample rest joints differ (betas) -> vmap the chain
    def chain(rm, rj):
        return _rigid_transform_chain(rm, rj, model.parents)

    posed_joints, rel = jax.vmap(chain)(rot, rest_joints)

    verts = None
    if return_verts:
        T = jnp.einsum("vj,bjxy->bvxy", model.lbs_weights, rel)
        v_h = jnp.concatenate(
            [v_posed, jnp.ones((B, v_posed.shape[1], 1), v_posed.dtype)],
            axis=-1,
        )
        verts = jnp.einsum("bvxy,bvy->bvx", T, v_h)[..., :3]

    if transl is not None:
        posed_joints = posed_joints + transl[:, None, :]
        if verts is not None:
            verts = verts + transl[:, None, :]
    return posed_joints, verts


def foot_contacts(model: SmplxModel, betas, pose_aa, transl,
                  foot_joint_ids=(7, 8, 10, 11), fps: int = 30,
                  threshold: float = 0.01) -> jnp.ndarray:
    """Foot-contact bits from ankle/foot joint velocities (reference
    beatx_dataset.py:381-424: velocity magnitude < 0.01 -> contact).

    pose_aa: (T, J*3), transl: (T, 3). Returns (T, len(foot_joint_ids))."""
    joints, _ = lbs(model, betas, pose_aa, transl=transl, return_verts=False)
    fj = joints[:, jnp.asarray(foot_joint_ids)]  # (T, 4, 3)
    # reference semantics (beatx_dataset.py:418-421): vel[t] = ||j[t+1]-j[t]||
    # with vel[T-1] = 0, so the LAST frame is always a contact — matching
    # the featurize_clip cache path exactly
    vel = jnp.linalg.norm(fj[1:] - fj[:-1], axis=-1)  # (T-1, 4)
    vel = jnp.concatenate([vel, jnp.zeros_like(vel[:1])], axis=0)
    return (vel < threshold).astype(jnp.float32)
