"""Domain-layer tests mirroring the reference's transform_chains_test.cc:

* compute_chain derivative panels vs numerical Jacobians (:12-101), for both
  the sequential-scan and associative-scan implementations,
* pose-chain composition consistency (:84-100),
* ActuatorLink.compute over all 64 active-masks vs numerical rotation
  Jacobians (:115-177),
* ActuatorChain effector derivatives over mask combinations (:179-231),
* SO(3)/quaternion utility correctness.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mini_opt_tpu.models.chains import (
    ActuatorChain,
    ActuatorLink,
    Pose,
    compute_all_poses,
    compute_chain,
)
from mini_opt_tpu.utils import so3
from mini_opt_tpu.utils.numerical import numerical_jacobian

# ---------------------------------------------------------------------------
# SO(3) utilities.
# ---------------------------------------------------------------------------


def test_quat_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        w = rng.standard_normal(3) * rng.uniform(0, 2.5)
        q = so3.quat_exp(jnp.asarray(w))
        np.testing.assert_allclose(np.linalg.norm(np.asarray(q)), 1.0, atol=1e-12)
        w_back = so3.quat_log(q)
        if np.linalg.norm(w) < np.pi:  # log returns the short arc
            np.testing.assert_allclose(np.asarray(w_back), w, atol=1e-9)


def test_quat_multiply_matches_matrix_product():
    rng = np.random.default_rng(1)
    for _ in range(10):
        q1 = so3.quat_exp(jnp.asarray(rng.standard_normal(3)))
        q2 = so3.quat_exp(jnp.asarray(rng.standard_normal(3)))
        R12 = so3.quat_to_matrix(so3.quat_multiply(q1, q2))
        np.testing.assert_allclose(
            np.asarray(R12),
            np.asarray(so3.quat_to_matrix(q1)) @ np.asarray(so3.quat_to_matrix(q2)),
            atol=1e-12,
        )
        v = rng.standard_normal(3)
        np.testing.assert_allclose(
            np.asarray(so3.quat_rotate(q1, jnp.asarray(v))),
            np.asarray(so3.quat_to_matrix(q1)) @ v,
            atol=1e-12,
        )


def test_euler_xyz_roundtrip_and_derivative():
    rng = np.random.default_rng(2)
    for _ in range(10):
        angles = rng.uniform(-1.2, 1.2, 3)  # away from the gimbal singularity
        out = so3.so3_from_euler_angles_xyz(jnp.asarray(angles))
        # roundtrip
        back = so3.euler_angles_xyz_from_quat(out.q)
        np.testing.assert_allclose(np.asarray(back), angles, atol=1e-10)
        # matrix = Rx Ry Rz
        def rot(a, axis):
            q = so3.quat_exp(jnp.asarray(np.eye(3)[axis] * a))
            return np.asarray(so3.quat_to_matrix(q))

        R_expected = rot(angles[0], 0) @ rot(angles[1], 1) @ rot(angles[2], 2)
        np.testing.assert_allclose(
            np.asarray(so3.quat_to_matrix(out.q)), R_expected, atol=1e-12
        )
        # right-tangent derivative vs numerical: column i is
        # d log(R(angles)^-1 R(angles + eps e_i)) / d eps.
        def f(a):
            q = so3.so3_from_euler_angles_xyz(jnp.asarray(a)).q
            rel = so3.quat_multiply(so3.quat_conjugate(out.q), q)
            return np.asarray(so3.quat_log(rel))

        J_num = numerical_jacobian(f, angles)
        np.testing.assert_allclose(
            np.asarray(out.rotation_D_angles), J_num, atol=1e-8
        )


def test_mod_pi():
    vals = jnp.asarray([0.0, 3.5, -3.5, 7.0, -7.0, np.pi, -np.pi + 1e-9])
    wrapped = np.asarray(so3.mod_pi(vals))
    assert (np.abs(wrapped) <= np.pi + 1e-12).all()
    np.testing.assert_allclose(np.sin(wrapped), np.sin(np.asarray(vals)), atol=1e-12)
    np.testing.assert_allclose(np.cos(wrapped), np.cos(np.asarray(vals)), atol=1e-12)


def test_pose_compose_inverse():
    rng = np.random.default_rng(3)
    a = Pose(so3.quat_exp(jnp.asarray(rng.standard_normal(3))), jnp.asarray(rng.standard_normal(3)))
    b = Pose(so3.quat_exp(jnp.asarray(rng.standard_normal(3))), jnp.asarray(rng.standard_normal(3)))
    ab = a * b
    np.testing.assert_allclose(
        np.asarray(ab.to_matrix()),
        np.asarray(a.to_matrix()) @ np.asarray(b.to_matrix()),
        atol=1e-12,
    )
    ident = (a * a.inverse()).to_matrix()
    np.testing.assert_allclose(np.asarray(ident), np.eye(4), atol=1e-12)
    v = jnp.asarray(rng.standard_normal(3))
    np.testing.assert_allclose(
        np.asarray(a.transform(v)),
        (np.asarray(a.to_matrix()) @ np.append(np.asarray(v), 1.0))[:3],
        atol=1e-12,
    )


# ---------------------------------------------------------------------------
# compute_chain (transform_chains_test.cc:12-101).
# ---------------------------------------------------------------------------


def _test_links():
    ws = np.array(
        [[-0.5, 0.5, 0.3], [0.8, 0.5, 1.2], [1.5, -0.2, 0.0], [0.2, -0.1, 0.3]]
    )
    ts = np.array(
        [[1.0, 0.5, 2.0], [0.5, 0.75, -0.5], [1.2, -0.5, 0.1], [0.1, -0.1, 0.2]]
    )
    return Pose(
        rotation=jax.vmap(so3.quat_exp)(jnp.asarray(ws)), translation=jnp.asarray(ts)
    )


@pytest.mark.parametrize("use_assoc", [False, True])
def test_compute_chain_derivatives_vs_numerical(use_assoc):
    links = _test_links()
    L = 4
    buf = compute_chain(links, use_associative_scan=use_assoc)

    def perturb_rot(w_all):
        w_all = jnp.asarray(w_all).reshape(L, 3)
        q = jax.vmap(so3.quat_multiply)(links.rotation, jax.vmap(so3.quat_exp)(w_all))
        return Pose(q, links.translation)

    # translation_D_rotation
    J_num = numerical_jacobian(
        lambda w: np.asarray(compute_chain(perturb_rot(w)).i_t_end[0]), np.zeros(L * 3)
    )
    J_ana = np.concatenate(np.asarray(buf.translation_D_rotation), axis=1)
    np.testing.assert_allclose(J_ana, J_num, atol=1e-8)

    # rotation_D_rotation (right-tangent local coordinates of the output)
    q0 = buf.i_R_end[0]

    def rot_local(w):
        q = compute_chain(perturb_rot(w)).i_R_end[0]
        return np.asarray(so3.quat_log(so3.quat_multiply(so3.quat_conjugate(q0), q)))

    J_num = numerical_jacobian(rot_local, np.zeros(L * 3))
    J_ana = np.concatenate(np.asarray(buf.rotation_D_rotation), axis=1)
    np.testing.assert_allclose(J_ana, J_num, atol=1e-8)

    # translation_D_translation
    def perturb_trans(dt):
        dt = jnp.asarray(dt).reshape(L, 3)
        return Pose(links.rotation, links.translation + dt)

    J_num = numerical_jacobian(
        lambda dt: np.asarray(compute_chain(perturb_trans(dt)).i_t_end[0]),
        np.zeros(L * 3),
    )
    J_ana = np.concatenate(np.asarray(buf.translation_D_translation), axis=1)
    np.testing.assert_allclose(J_ana, J_num, atol=1e-8)


def test_unroll_scan_and_associative_scan_agree():
    links = _test_links()
    a = compute_chain(links, unroll=True)
    b = compute_chain(links, use_associative_scan=True)
    c = compute_chain(links, unroll=False)  # lax.scan path
    for x, y, z in zip(a, b, c):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-12)
        np.testing.assert_allclose(np.asarray(x), np.asarray(z), atol=1e-12)


def test_compute_all_poses_composition():
    """start_T_i from the buffer must equal the running composition of links
    (transform_chains_test.cc:84-100)."""
    links = _test_links()
    buf = compute_chain(links)
    poses = compute_all_poses(buf)
    current = Pose.identity()
    for i in range(5):
        np.testing.assert_allclose(
            np.asarray(poses.translation[i]), np.asarray(current.translation), atol=1e-9
        )
        np.testing.assert_allclose(
            np.asarray(so3.quat_to_matrix(poses.rotation[i])),
            np.asarray(so3.quat_to_matrix(current.rotation)),
            atol=1e-9,
        )
        if i < 4:
            current = current * Pose(links.rotation[i], links.translation[i])


# ---------------------------------------------------------------------------
# ActuatorLink over all 64 masks (transform_chains_test.cc:115-177).
# ---------------------------------------------------------------------------


def test_actuator_link_all_masks():
    base = Pose(
        so3.quat_exp(jnp.asarray([-0.3, 0.5, 0.4])), jnp.asarray([0.4, -0.2, 1.2])
    )
    rng = np.random.default_rng(4)
    for mask in itertools.product([0, 1], repeat=6):
        link = ActuatorLink.create(base, mask)
        n = link.active_count
        params = jnp.asarray(rng.uniform(-0.8, 0.8, n))
        pose, J = link.compute(params, 0)

        # The returned pose substitutes active params into the euler/translation
        # representation; verify by reconstruction.
        angles = np.asarray(link.rotation_xyz).copy()
        trans = np.asarray(link.translation).copy()
        p = 0
        for i in range(3):
            if mask[i]:
                angles[i] = params[p]
                p += 1
        for i in range(3):
            if mask[i + 3]:
                trans[i] = params[p]
                p += 1
        if link.active_rotation_count > 0:
            q_expected = so3.so3_from_euler_angles_xyz(jnp.asarray(angles)).q
        else:
            q_expected = base.rotation
        np.testing.assert_allclose(
            np.asarray(so3.quat_to_matrix(pose.rotation)),
            np.asarray(so3.quat_to_matrix(q_expected)),
            atol=1e-9,
        )
        np.testing.assert_allclose(np.asarray(pose.translation), trans, atol=1e-12)

        # Rotation Jacobian vs numerical in the right tangent.
        if link.active_rotation_count > 0:
            q0 = pose.rotation

            def rot_local(pv):
                q = link.compute(jnp.asarray(pv), 0)[0].rotation
                return np.asarray(
                    so3.quat_log(so3.quat_multiply(so3.quat_conjugate(q0), q))
                )

            J_num = numerical_jacobian(rot_local, np.asarray(params))
            np.testing.assert_allclose(
                np.asarray(J), J_num[:, : link.active_rotation_count], atol=1e-8
            )


# ---------------------------------------------------------------------------
# ActuatorChain effector derivatives (transform_chains_test.cc:179-231).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "masks",
    [
        [(0, 0, 1, 0, 0, 0), (0, 0, 1, 0, 0, 0), (0, 0, 0, 0, 0, 0)],
        [(1, 1, 1, 0, 0, 0), (0, 0, 1, 1, 0, 0), (0, 1, 0, 0, 0, 1)],
        [(1, 0, 0, 1, 1, 1), (0, 0, 0, 0, 0, 0), (1, 1, 1, 1, 1, 1)],
    ],
)
def test_actuator_chain_derivatives(masks):
    rng = np.random.default_rng(5)
    links = []
    for mask in masks:
        base = Pose(
            so3.quat_exp(jnp.asarray(rng.uniform(-0.6, 0.6, 3))),
            jnp.asarray(rng.standard_normal(3)),
        )
        links.append(ActuatorLink.create(base, mask))
    chain = ActuatorChain(links=tuple(links))
    P = chain.total_active
    params = jnp.asarray(rng.uniform(-0.7, 0.7, P))
    state = chain.update(params)

    # translation_D_params vs numerical
    J_num = numerical_jacobian(
        lambda p: np.asarray(chain.update(jnp.asarray(p)).translation),
        np.asarray(params),
    )
    np.testing.assert_allclose(
        np.asarray(state.translation_D_params), J_num, atol=1e-8
    )

    # rotation_D_params vs numerical (right-tangent local coords)
    q0 = state.rotation

    def rot_local(p):
        q = chain.update(jnp.asarray(p)).rotation
        return np.asarray(so3.quat_log(so3.quat_multiply(so3.quat_conjugate(q0), q)))

    J_num = numerical_jacobian(rot_local, np.asarray(params))
    np.testing.assert_allclose(np.asarray(state.rotation_D_params), J_num, atol=1e-8)

    # jacfwd through the whole chain agrees with the analytic panels
    J_auto = jax.jacfwd(lambda p: chain.update(p).translation)(params)
    np.testing.assert_allclose(
        np.asarray(state.translation_D_params), np.asarray(J_auto), atol=1e-10
    )
