"""Kinematic transform chains: the IK domain model and benchmark workload.

TPU-native redesign of the reference's test-domain layer
(/root/reference/test/transform_chains.{hpp,cc}): ``Pose`` is a pytree of
(quaternion, translation) arrays, the chain forward pass is a ``lax.scan``
(with an ``associative_scan`` option for long chains -- pose composition is
associative, so the O(L) sequential sweep of transform_chains.cc:37-52
becomes O(log L) depth), and the per-link "active parameter" masks are
static metadata compiled into fixed gather/scatter patterns so everything
stays vmappable over problem batches.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..structs import _pytree_dataclass
from ..utils import so3


@_pytree_dataclass
class Pose:
    """Rotation (wxyz quaternion) + translation; analog of
    transform_chains.hpp:23-59. Leaves may carry leading batch dims."""

    rotation: jax.Array  # (..., 4)
    translation: jax.Array  # (..., 3)

    @staticmethod
    def identity(dtype=jnp.float64) -> "Pose":
        return Pose(so3.quat_identity(dtype), jnp.zeros((3,), dtype))

    def compose(self, other: "Pose") -> "Pose":
        return Pose(
            so3.quat_multiply(self.rotation, other.rotation),
            self.translation + so3.quat_rotate(self.rotation, other.translation),
        )

    def __mul__(self, other):
        if isinstance(other, Pose):
            return self.compose(other)
        return self.transform(other)

    def inverse(self) -> "Pose":
        q_inv = so3.quat_conjugate(self.rotation)
        return Pose(q_inv, so3.quat_rotate(q_inv, -self.translation))

    def transform(self, v: jax.Array) -> jax.Array:
        return so3.quat_rotate(self.rotation, v) + self.translation

    def to_matrix(self) -> jax.Array:
        R = so3.quat_to_matrix(self.rotation)
        top = jnp.concatenate([R, self.translation[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], R.dtype), top.shape[:-2] + (1, 4)
        )
        return jnp.concatenate([top, bottom], axis=-2)


class ChainBuffers(NamedTuple):
    """Forward-pass products; analog of ChainComputationBuffer
    (transform_chains.hpp:78-101) with (L, 3, 3) derivative panels instead of
    packed (3, 3L) column blocks."""

    i_R_end: jax.Array  # (L+1, 4): frame i -> end rotation
    i_t_end: jax.Array  # (L+1, 3): end position in frame i
    rotation_D_rotation: jax.Array  # (L, 3, 3)
    translation_D_rotation: jax.Array  # (L, 3, 3)
    translation_D_translation: jax.Array  # (L, 3, 3)

    def start_T_end(self) -> Pose:
        return Pose(self.i_R_end[0], self.i_t_end[0])


def _compose_qt(a, b):
    """(q, t) pose composition for scans: a * b."""
    qa, ta = a
    qb, tb = b
    return so3.quat_multiply(qa, qb), ta + so3.quat_rotate(qa, tb)


_UNROLL_MAX_LINKS = 16


def compute_chain(
    links: Pose, use_associative_scan: bool = False, unroll: Optional[bool] = None
) -> ChainBuffers:
    """Forward pass over a stacked chain of L links (transform_chains.cc:23-82).

    Computes the end-effector pose in every intermediate frame plus the three
    derivative panels (all wrt the right tangent of SO(3)):

      translation_D_translation[i] = R(start_R_i)
      translation_D_rotation[i]    = R(start_R_{i+1}) @ skew(-i_t_end[i+1])
      rotation_D_rotation[i]       = R(i_R_end[i+1])^T

    (The reference's special-cased last blocks, transform_chains.cc:73-81,
    are these same formulas evaluated at the identity end frame.)
    """
    L = links.rotation.shape[0]
    dtype = links.rotation.dtype
    q_id = so3.quat_identity(dtype)
    t_zero = jnp.zeros((3,), dtype)
    if unroll is None:
        unroll = L <= _UNROLL_MAX_LINKS and not use_associative_scan

    if unroll:
        # Short chains: straight-line code. A lax.scan of length ~3 costs more
        # in loop overhead and lost fusion than it saves; unrolling lets XLA
        # fuse the whole sweep into a few kernels (critical for the batched
        # IK throughput path).
        q_suf_l, t_suf_l = [q_id], [t_zero]
        for i in range(L - 1, -1, -1):
            q_suf_l.append(
                so3.quat_multiply(links.rotation[i], q_suf_l[-1])
            )
            t_suf_l.append(
                so3.quat_rotate(links.rotation[i], t_suf_l[-1]) + links.translation[i]
            )
        i_R_end = jnp.stack(q_suf_l[::-1])
        i_t_end = jnp.stack(t_suf_l[::-1])
        starts_l = [q_id]
        for i in range(L):
            starts_l.append(so3.quat_multiply(starts_l[-1], links.rotation[i]))
        start_R = jnp.stack(starts_l)
    elif use_associative_scan:
        # Suffix products links[i] * ... * links[L-1] in O(log L) depth.
        # reverse=True flips the array, so the combine must compose b * a to
        # preserve left-to-right link order.
        q_suf, t_suf = jax.lax.associative_scan(
            lambda a, b: _compose_qt(b, a),
            (links.rotation, links.translation),
            reverse=True,
        )
        i_R_end = jnp.concatenate([q_suf, q_id[None]], axis=0)
        i_t_end = jnp.concatenate([t_suf, t_zero[None]], axis=0)
        # Prefix products identity, links[0], links[0]*links[1], ...
        q_pre, t_pre = jax.lax.associative_scan(
            lambda a, b: _compose_qt(a, b), (links.rotation, links.translation)
        )
        start_R = jnp.concatenate([q_id[None], q_pre], axis=0)
    else:

        def bwd(carry, link):
            new = _compose_qt(link, carry)
            return new, new

        _, (q_suf, t_suf) = jax.lax.scan(
            bwd, (q_id, t_zero), (links.rotation, links.translation), reverse=True
        )
        i_R_end = jnp.concatenate([q_suf, q_id[None]], axis=0)
        i_t_end = jnp.concatenate([t_suf, t_zero[None]], axis=0)

        def fwd(carry, link_q):
            new = so3.quat_multiply(carry, link_q)
            return new, carry

        last, starts = jax.lax.scan(fwd, q_id, links.rotation)
        start_R = jnp.concatenate([starts, last[None]], axis=0)  # (L+1, 4)

    R_start = so3.quat_to_matrix(start_R)  # (L+1, 3, 3)
    translation_D_translation = R_start[:L]
    translation_D_rotation = jnp.einsum(
        "lij,ljk->lik", R_start[1:], so3.skew3(-i_t_end[1:])
    )
    rotation_D_rotation = jnp.swapaxes(so3.quat_to_matrix(i_R_end[1:]), -1, -2)
    return ChainBuffers(
        i_R_end=i_R_end,
        i_t_end=i_t_end,
        rotation_D_rotation=rotation_D_rotation,
        translation_D_rotation=translation_D_rotation,
        translation_D_translation=translation_D_translation,
    )


def compute_all_poses(buffers: ChainBuffers) -> Pose:
    """All intermediate poses start_T_i (transform_chains.cc:84-92), stacked
    with leading dim L+1."""
    start_T_end = buffers.start_T_end()

    def one(q, t):
        return start_T_end.compose(Pose(q, t).inverse())

    return jax.vmap(one)(buffers.i_R_end, buffers.i_t_end)


# ---------------------------------------------------------------------------
# Actuator links / chain (the IK model).
# ---------------------------------------------------------------------------


@_pytree_dataclass
class ActuatorLink:
    """One link: XYZ-euler rotation + translation with a static 6-bit mask of
    optimized parameters (transform_chains.hpp:124-153).

    ``rotation``/``translation`` are the base pose; ``rotation_xyz`` its euler
    decomposition (valid when any rotation parameter is active). ``active``
    is static so parameter gathers compile to fixed indexing.
    """

    rotation: jax.Array  # (4,)
    translation: jax.Array  # (3,)
    rotation_xyz: jax.Array  # (3,)
    active: Tuple[bool, ...] = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def create(pose: Pose, mask: Sequence[int]) -> "ActuatorLink":
        """Decompose the pose's rotation into XYZ euler angles
        (transform_chains.cc:104-118)."""
        active = tuple(bool(m) for m in mask)
        rotation_xyz = so3.euler_angles_xyz_from_quat(pose.rotation)
        return ActuatorLink(
            rotation=pose.rotation,
            translation=pose.translation,
            rotation_xyz=rotation_xyz,
            active=active,
        )

    @property
    def active_count(self) -> int:
        return sum(self.active)

    @property
    def active_rotation_count(self) -> int:
        return sum(self.active[:3])

    def compute(self, params: jax.Array, position: int):
        """Substitute active params, return (Pose, J) with J the
        d(SO3 right tangent)/d(active angles) block, shape
        (3, active_rotation_count) (transform_chains.cc:125-158)."""
        dtype = params.dtype
        if self.active_rotation_count == 0:
            t = self.translation
            p = position
            for i in range(3):
                if self.active[i + 3]:
                    t = t.at[i].set(params[p])
                    p += 1
            J = jnp.zeros((3, 0), dtype)
            return Pose(self.rotation, t), J

        angles = self.rotation_xyz
        t = self.translation
        p = position
        for i in range(3):
            if self.active[i]:
                angles = angles.at[i].set(params[p])
                p += 1
        for i in range(3):
            if self.active[i + 3]:
                t = t.at[i].set(params[p])
                p += 1
        rot = so3.so3_from_euler_angles_xyz(angles)
        cols = [rot.rotation_D_angles[:, i] for i in range(3) if self.active[i]]
        J = jnp.stack(cols, axis=1)
        return Pose(rot.q, t), J


class ChainState(NamedTuple):
    """Effector pose + derivative panels wrt the active parameter vector;
    analog of ActuatorChain's cached outputs (transform_chains.hpp:157-209)."""

    effector: Pose
    rotation_D_params: jax.Array  # (3, P)
    translation_D_params: jax.Array  # (3, P)
    buffers: ChainBuffers

    @property
    def translation(self) -> jax.Array:
        return self.effector.translation

    @property
    def rotation(self) -> jax.Array:
        return self.effector.rotation


@_pytree_dataclass
class ActuatorChain:
    """A chain of actuator links (transform_chains.hpp:157-209). Static link
    structure (masks), dynamic base poses: vmappable over chain geometry."""

    links: Tuple[ActuatorLink, ...]

    @property
    def total_active(self) -> int:
        return sum(l.active_count for l in self.links)

    def update(self, params: jax.Array, use_associative_scan: bool = False) -> ChainState:
        """Forward pass + chain rule to active parameters
        (transform_chains.cc:165-243). Pure function (no caching needed: XLA
        CSEs repeated subexpressions; under jit the reference's 1e-9
        param-change cache is meaningless)."""
        dtype = params.dtype
        P = self.total_active
        poses = []
        rot_jacs = []
        position = 0
        for link in self.links:
            pose, J = link.compute(params, position)
            poses.append(pose)
            rot_jacs.append(J)
            position += link.active_count

        stacked = Pose(
            rotation=jnp.stack([p.rotation for p in poses]),
            translation=jnp.stack([p.translation for p in poses]),
        )
        buf = compute_chain(stacked, use_associative_scan=use_associative_scan)

        rot_D = jnp.zeros((3, P), dtype)
        trans_D = jnp.zeros((3, P), dtype)
        position = 0
        for i, link in enumerate(self.links):
            na = link.active_count
            nr = link.active_rotation_count
            if na == 0:
                continue
            if nr > 0:
                rd_angles = rot_jacs[i]  # (3, nr)
                trans_D = trans_D.at[:, position : position + nr].set(
                    buf.translation_D_rotation[i] @ rd_angles
                )
                rot_D = rot_D.at[:, position : position + nr].set(
                    buf.rotation_D_rotation[i] @ rd_angles
                )
            out_col = position + nr
            for axis in range(3):
                if link.active[axis + 3]:
                    trans_D = trans_D.at[:, out_col].set(
                        buf.translation_D_translation[i][:, axis]
                    )
                    out_col += 1
            position += na

        return ChainState(
            effector=Pose(buf.i_R_end[0], buf.i_t_end[0]),
            rotation_D_params=rot_D,
            translation_D_params=trans_D,
            buffers=buf,
        )
