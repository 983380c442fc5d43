"""Parity tests for the vector math core.

Re-hosts the analytic assertions of the reference's
test/test_tinygfx/test_g3d/test_operations.py on the JAX kernels.
"""

import jax
import numpy as np
import pytest

from pyrayt_tpu.core import operations as ops


def vector(x=0.0, y=0.0, z=0.0):
    return np.array([x, y, z, 0.0])


class TestSmallestPositiveRoot:
    def test_simple_roots(self):
        # x^2 - 1: roots +/-1 -> smallest positive is 1
        assert float(ops.smallest_positive_root(1.0, 0.0, -1.0)) == pytest.approx(1.0)
        # x^2 + 3x + 2: roots -1, -2 -> none positive
        assert np.isinf(float(ops.smallest_positive_root(1.0, 3.0, 2.0)))
        # x^2 + 1: no real roots
        assert np.isinf(float(ops.smallest_positive_root(1.0, 0.0, 1.0)))

    def test_arrayed_roots(self):
        a = np.ones(3)
        b = np.array([0.0, 3.0, 0.0])
        c = np.array([-1.0, 2.0, 1.0])
        result = np.asarray(ops.smallest_positive_root(a, b, c))
        assert result[0] == pytest.approx(1.0)
        assert np.isinf(result[1])
        assert np.isinf(result[2])


class TestBinomialRoot:
    def test_two_real_roots(self):
        roots = np.asarray(ops.binomial_root(1.0, 0.0, -1.0))
        assert sorted(roots.tolist()) == pytest.approx([-1.0, 1.0])

    def test_negative_discriminant_is_inf_pair(self):
        roots = np.asarray(ops.binomial_root(1.0, 0.0, 1.0))
        assert np.all(np.isinf(roots)) and np.all(roots > 0)

    def test_linear_case_duplicates_root(self):
        # 2x + 4 = 0 -> x = -2 duplicated
        roots = np.asarray(ops.binomial_root(0.0, 2.0, 4.0))
        assert np.allclose(roots, -2.0)

    def test_constant_case_outside(self):
        # c > 0, no a or b: ray never inside -> (+inf, +inf)
        roots = np.asarray(ops.binomial_root(0.0, 0.0, 1.0))
        assert np.all(np.isinf(roots)) and np.all(roots > 0)

    def test_constant_case_inside(self):
        # c <= 0: always inside -> (-inf, +inf)
        roots = np.asarray(ops.binomial_root(0.0, 0.0, -1.0))
        assert roots[0] == -np.inf and roots[1] == np.inf

    def test_mixed_array_batch(self):
        a = np.array([1.0, 0.0, 0.0, 1.0])
        b = np.array([0.0, 2.0, 0.0, 0.0])
        c = np.array([-1.0, 4.0, -1.0, 1.0])
        roots = np.sort(np.asarray(ops.binomial_root(a, b, c)), axis=0)
        assert np.allclose(roots[:, 0], [-1.0, 1.0])
        assert np.allclose(roots[:, 1], [-2.0, -2.0])
        assert roots[0, 2] == -np.inf and roots[1, 2] == np.inf
        assert np.all(np.isinf(roots[:, 3])) and np.all(roots[:, 3] > 0)

    def test_jit_matches_eager(self):
        a = np.array([1.0, 0.0, 0.0])
        b = np.array([0.0, 2.0, 0.0])
        c = np.array([-1.0, 4.0, -1.0])
        eager = np.asarray(ops.binomial_root(a, b, c))
        jitted = np.asarray(jax.jit(ops.binomial_root)(a, b, c))
        assert np.array_equal(eager, jitted)


class TestElementWiseDot:
    def test_1d(self):
        assert float(ops.element_wise_dot(np.ones(3), np.ones(3))) == pytest.approx(3.0)

    def test_columnwise(self):
        m1 = np.arange(12.0).reshape(3, 4)
        m2 = np.ones((3, 4))
        assert np.allclose(ops.element_wise_dot(m1, m2, axis=0), m1.sum(axis=0))

    def test_rowwise(self):
        m1 = np.arange(12.0).reshape(3, 4)
        m2 = np.ones((3, 4))
        assert np.allclose(ops.element_wise_dot(m1, m2, axis=1), m1.sum(axis=1))


class TestReflect:
    def test_single_vector_reflection(self):
        refl = np.asarray(ops.reflect(vector(1, -1, 0), vector(0, 1, 0)))
        assert np.allclose(refl, vector(1, 1, 0))

        refl = np.asarray(
            ops.reflect(vector(0, -1, 0), vector(1, 1, 0) / np.sqrt(2))
        )
        assert np.allclose(refl, vector(1, 0, 0), atol=1e-5)

    def test_single_normal_many_vectors(self):
        n_vects = 1000
        vect_in = np.zeros((4, n_vects))
        vect_in[0] = 1
        vect_in[1] = -1
        refl = np.asarray(ops.reflect(vect_in, vector(0, 1, 0)))
        assert np.allclose(refl, np.tile(vector(1, 1, 0), (n_vects, 1)).T)

    def test_multi_normal(self):
        n_vects = 1000
        vect_in = np.zeros((4, n_vects))
        vect_in[0] = 1
        vect_in[1] = -1
        normals = np.tile(vector(0, 1, 0), (n_vects, 1)).T
        refl = np.asarray(ops.reflect(vect_in, normals))
        assert np.allclose(refl, np.tile(vector(1, 1, 0), (n_vects, 1)).T)


class TestRefract:
    def setup_method(self):
        self.vector = vector(1, 1, 0) / np.sqrt(2)
        self.normal = vector(-1, 0, 0)

    def test_refraction_into_higher(self):
        n1, n2 = 1.0, 1.5
        refracted, index = ops.refract(self.vector[:, None], self.normal[:, None], n1, n2)
        assert float(index[0]) == pytest.approx(n2)
        theta_2 = np.arcsin(n1 * np.sqrt(2) / (2 * n2))
        expected = vector(np.cos(theta_2), np.sin(theta_2))
        assert np.allclose(np.asarray(refracted)[:, 0], expected)

    def test_refraction_into_lower(self):
        n1, n2 = 1.1, 1.0
        refracted, index = ops.refract(self.vector[:, None], self.normal[:, None], n1, n2)
        assert float(index[0]) == pytest.approx(n2)
        theta_2 = np.arcsin(n1 * np.sqrt(2) / (2 * n2))
        expected = vector(np.cos(theta_2), np.sin(theta_2))
        assert np.allclose(np.asarray(refracted)[:, 0], expected)

    def test_refraction_into_world(self):
        # v . n > 0: exiting, so n2 is replaced by the world index
        n1 = n2 = 1.5
        n_world = 1.4
        refracted, index = ops.refract(
            self.vector[:, None], -self.normal[:, None], n1, n2, n_world
        )
        assert float(index[0]) == pytest.approx(n_world)
        theta_2 = np.arcsin(n1 * np.sqrt(2) / (2 * n_world))
        expected = vector(np.cos(theta_2), np.sin(theta_2))
        assert np.allclose(np.asarray(refracted)[:, 0], expected)

    def test_total_internal_reflection(self):
        n1 = n2 = 1.5
        n_world = 1.0
        refracted, index = ops.refract(
            self.vector[:, None], -self.normal[:, None], n1, n2, n_world
        )
        assert float(index[0]) == pytest.approx(n1)  # TIR keeps incident index
        expected = vector(-1, 1) / np.sqrt(2)
        assert np.allclose(np.asarray(refracted)[:, 0], expected)

        refracted, index = ops.refract(
            self.vector[:, None], self.normal[:, None], 1.5, 1.0, n_world
        )
        assert float(index[0]) == pytest.approx(1.5)
        assert np.allclose(np.asarray(refracted)[:, 0], expected)

    def test_arrayed_mixed_refraction(self):
        n_elements = 1000
        split = n_elements // 2
        n1 = np.full(n_elements, 1.5)
        n2 = np.full(n_elements, 1.6)
        n2[:split] = 1.0  # first half TIRs

        vectors = np.zeros((4, n_elements))
        vectors[:2, :] = 1 / np.sqrt(2)
        normals = np.zeros((4, n_elements))
        normals[0] = -1

        refracted, index = ops.refract(vectors, normals, n1, n2)
        refracted = np.asarray(refracted)
        index = np.asarray(index)
        assert np.allclose(index[:split], 1.5)
        assert np.allclose(index[split:], 1.6)

        expected_tir = np.zeros((4, split))
        expected_tir[0] = -1 / np.sqrt(2)
        expected_tir[1] = 1 / np.sqrt(2)
        assert np.allclose(refracted[:, :split], expected_tir)

        theta_2 = np.arcsin(1.5 * np.sqrt(2) / (2 * 1.6))
        expected_refr = np.zeros((4, split))
        expected_refr[0] = np.cos(theta_2)
        expected_refr[1] = np.sin(theta_2)
        assert np.allclose(refracted[:, split:], expected_refr)

    def test_does_not_mutate_inputs(self):
        # the reference normalizes callers' arrays in place (quirk Q7);
        # the functional kernel must not
        import jax.numpy as jnp

        v = jnp.asarray(2.0 * self.vector[:, None])
        before = np.asarray(v).copy()
        ops.refract(v, self.normal[:, None], 1.0, 1.5)
        assert np.array_equal(np.asarray(v), before)


class TestSafeGuards:
    def test_safe_sqrt_gradient_at_zero(self):
        g = jax.grad(lambda x: ops.safe_sqrt(x))(0.0)
        assert np.isfinite(float(g))

    def test_safe_normalize_zero_vector(self):
        out = np.asarray(ops.safe_normalize(np.zeros((3, 4))))
        assert np.all(out == 0)

    def test_refract_zero_direction_no_nan(self):
        v = np.zeros((4, 2))
        n = np.zeros((4, 2))
        n[0] = -1
        refracted, index = ops.refract(v, n, 1.0, 1.5)
        assert np.all(np.isfinite(np.asarray(refracted)))
