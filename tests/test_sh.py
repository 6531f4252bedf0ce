"""Spherical-harmonics basis correctness.

The degree-3 basis must be orthonormal on the sphere: with uniformly sampled
unit directions, 4*pi * E[Y_i(d) Y_j(d)] == delta_ij.  This is the test that
catches coefficient/sign mistakes in any individual term (a wrong term shows
up both as a wrong diagonal norm and as off-diagonal leakage into another
band — e.g. x*(xx-yy) instead of x*(xx-3yy) aliases into the degree-1 x
basis).
"""

import jax
import jax.numpy as jnp
import numpy as np

from collab_splats_tpu.core.sh import eval_sh, eval_sh_basis, num_sh_bases


class TestBasisOrthonormality:
    def _gram(self, num_bases, n=200_000, seed=0):
        key = jax.random.PRNGKey(seed)
        d = jax.random.normal(key, (n, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        basis = eval_sh_basis(d, num_bases)  # [n, K]
        return np.asarray(4.0 * np.pi * (basis.T @ basis) / n)

    def test_orthonormal_deg3(self):
        g = self._gram(num_sh_bases(3))
        eye = np.eye(g.shape[0])
        # Monte-Carlo noise at 200k samples is ~O(1e-2).
        np.testing.assert_allclose(g, eye, atol=0.05)

    def test_diag_norms_deg2(self):
        g = self._gram(num_sh_bases(2))
        np.testing.assert_allclose(np.diag(g), 1.0, atol=0.05)


class TestEvalSh:
    def test_dc_only(self):
        coeffs = jnp.zeros((5, 16, 3)).at[:, 0, :].set(1.0)
        dirs = jax.random.normal(jax.random.PRNGKey(1), (5, 3))
        out = eval_sh(coeffs, dirs, 3)
        np.testing.assert_allclose(out, 0.28209479, rtol=1e-5)

    def test_degree_mask_zeroes_high_bands(self):
        key = jax.random.PRNGKey(2)
        coeffs = jax.random.normal(key, (7, 16, 3))
        dirs = jax.random.normal(jax.random.PRNGKey(3), (7, 3))
        full = eval_sh(coeffs, dirs, 3)
        dc = eval_sh(coeffs.at[:, 1:, :].set(0.0), dirs, 3)
        masked = eval_sh(coeffs, dirs, 0)
        np.testing.assert_allclose(masked, dc, atol=1e-6)
        assert not np.allclose(full, dc)
