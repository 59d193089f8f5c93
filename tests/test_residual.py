"""Residual assembly tests mirroring residual_test.cc: scatter/gather
correctness of J^T J / J^T r accumulation against explicit remap matrices
M H_local M^T, for in-order, permuted, and sparse index maps (:51-146), plus
dynamic-size params (:149-182) and the BlockResidual batched path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mini_opt_tpu import (
    BlockResidual,
    accumulate_hessian,
    accumulate_hessian_block,
    fill_jacobian_rows,
    make_residual,
)


def _quadratic_residual(A, b):
    """r = A x_local + b with known Jacobian A."""
    A = jnp.asarray(A)
    b = jnp.asarray(b)
    return lambda xl: A @ xl + b


def _remap_matrix(index, dim):
    """M maps local params into the global vector (residual_test.cc oracle)."""
    M = np.zeros((dim, len(index)))
    for local, g in enumerate(index):
        M[g, local] = 1.0
    return M


@pytest.mark.parametrize(
    "index,dim",
    [
        ((0, 1, 2), 3),  # in-order (residual_test.cc:51-74)
        ((2, 0, 1), 3),  # permuted (:77-104)
        ((5, 1, 3), 7),  # sparse into larger system (:107-146)
    ],
)
def test_update_hessian_against_remap(index, dim):
    rng = np.random.default_rng(0)
    A = rng.standard_normal((4, 3))
    b = rng.standard_normal(4)
    res = make_residual(index, _quadratic_residual(A, b), 4)
    x = jnp.asarray(rng.standard_normal(dim))

    G = jnp.zeros((dim, dim))
    c = jnp.zeros((dim,))
    G, c, f = accumulate_hessian(G, c, res, x)

    # Oracle: explicit remap M (dim x 3), H_expected = M (A^T A) M^T.
    M = _remap_matrix(index, dim)
    r = A @ np.asarray(x)[list(index)] + b
    H_exp = M @ (A.T @ A) @ M.T
    c_exp = M @ (A.T @ r)
    np.testing.assert_allclose(np.asarray(G), H_exp, atol=1e-12)
    np.testing.assert_allclose(np.asarray(c), c_exp, atol=1e-12)
    assert float(f) == pytest.approx(0.5 * r @ r, abs=1e-12)

    # Untouched cells must remain exactly zero (residual_test.cc:141-145).
    touched = np.zeros((dim, dim), bool)
    touched[np.ix_(list(index), list(index))] = True
    assert (np.asarray(G)[~touched] == 0).all()


def test_update_jacobian_rows():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((2, 3))
    b = rng.standard_normal(2)
    index = (4, 0, 2)
    res = make_residual(index, _quadratic_residual(A, b), 2)
    x = jnp.asarray(rng.standard_normal(6))

    A_glob = jnp.zeros((5, 6))
    b_glob = jnp.zeros((5,))
    A_glob, b_glob = fill_jacobian_rows(A_glob, b_glob, res, x, row=2)

    expected_A = np.zeros((5, 6))
    for local, g in enumerate(index):
        expected_A[2:4, g] = A[:, local]
    expected_b = np.zeros(5)
    expected_b[2:4] = A @ np.asarray(x)[list(index)] + b
    np.testing.assert_allclose(np.asarray(A_glob), expected_A, atol=1e-12)
    np.testing.assert_allclose(np.asarray(b_glob), expected_b, atol=1e-12)


def test_accumulation_is_additive():
    """Multiple residuals accumulate, matching the reference's += semantics."""
    rng = np.random.default_rng(2)
    dim = 5
    x = jnp.asarray(rng.standard_normal(dim))
    G = jnp.zeros((dim, dim))
    c = jnp.zeros((dim,))
    H_exp = np.zeros((dim, dim))
    c_exp = np.zeros(dim)
    for index in [(0, 1), (3, 4), (1, 3)]:
        A = rng.standard_normal((2, 2))
        b = rng.standard_normal(2)
        res = make_residual(index, _quadratic_residual(A, b), 2)
        G, c, _ = accumulate_hessian(G, c, res, x)
        M = _remap_matrix(index, dim)
        r = A @ np.asarray(x)[list(index)] + b
        H_exp += M @ (A.T @ A) @ M.T
        c_exp += M @ (A.T @ r)
    np.testing.assert_allclose(np.asarray(G), H_exp, atol=1e-12)
    np.testing.assert_allclose(np.asarray(c), c_exp, atol=1e-12)


def test_block_residual_matches_loop():
    """The batched scatter-add path must equal the per-residual loop."""
    rng = np.random.default_rng(3)
    dim, B = 8, 12
    x = jnp.asarray(rng.standard_normal(dim))
    indices = tuple(
        tuple(int(i) for i in rng.permutation(dim)[:3]) for _ in range(B)
    )
    data = jnp.asarray(rng.standard_normal((B, 3)))

    def fn(xl, row):
        return jnp.stack([jnp.dot(xl, row) - 1.0, xl[0] * xl[1]])

    block = BlockResidual(fn=fn, indices=indices, dim=2, data=data)
    G_b = jnp.zeros((dim, dim))
    c_b = jnp.zeros((dim,))
    G_b, c_b, f_b = accumulate_hessian_block(G_b, c_b, block, x)

    G_l = jnp.zeros((dim, dim))
    c_l = jnp.zeros((dim,))
    f_l = 0.0
    for i in range(B):
        row = data[i]
        res = make_residual(indices[i], lambda xl, row=row: fn(xl, row), 2)
        G_l, c_l, f = accumulate_hessian(G_l, c_l, res, x)
        f_l += float(f)
    np.testing.assert_allclose(np.asarray(G_b), np.asarray(G_l), atol=1e-12)
    np.testing.assert_allclose(np.asarray(c_b), np.asarray(c_l), atol=1e-12)
    assert float(f_b) == pytest.approx(f_l, abs=1e-12)

    # error_vectors matches per-residual evaluation
    r_b = np.asarray(block.error_vectors(x))
    for i in range(B):
        np.testing.assert_allclose(
            r_b[i], np.asarray(fn(x[jnp.asarray(indices[i])], data[i])), atol=1e-12
        )


def test_jacfwd_default_matches_custom_jac():
    rng = np.random.default_rng(4)
    A = rng.standard_normal((3, 2))
    b = rng.standard_normal(3)
    fn = _quadratic_residual(A, b)

    def jac(xl):
        return fn(xl), jnp.asarray(A)

    res_auto = make_residual((1, 3), fn, 3)
    res_custom = make_residual((1, 3), fn, 3, jac=jac)
    x = jnp.asarray(rng.standard_normal(5))
    r1, J1 = res_auto.error_and_jacobian(x)
    r2, J2 = res_custom.error_and_jacobian(x)
    np.testing.assert_allclose(np.asarray(J1), np.asarray(J2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-12)


def test_quadratic_error():
    rng = np.random.default_rng(5)
    A = rng.standard_normal((3, 2))
    b = rng.standard_normal(3)
    res = make_residual((0, 1), _quadratic_residual(A, b), 3)
    x = jnp.asarray(rng.standard_normal(2))
    r = A @ np.asarray(x) + b
    assert float(res.quadratic_error(x)) == pytest.approx(0.5 * r @ r, abs=1e-12)
