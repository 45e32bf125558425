"""Oracle tests of the Pallas fused-leapfrog kernel (interpret mode on CPU;
the same kernel runs compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aehmc_tpu.integrators import velocity_verlet
from aehmc_tpu.ops.leapfrog import (
    batched_leapfrog_reference,
    batched_leapfrog_tpu,
)


def _random_inputs(chains=8, dim=128, dtype=jnp.float32, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    q = jax.random.normal(k1, (chains, dim), dtype)
    p = jax.random.normal(k2, (chains, dim), dtype)
    lam = jnp.linspace(0.5, 2.0, dim).astype(dtype)
    inv_mass = jnp.linspace(0.8, 1.2, dim).astype(dtype)
    return q, p, lam, inv_mass


def test_reference_matches_generic_integrator():
    """The specialized quadratic leapfrog must equal the generic
    velocity-Verlet driven by autodiff."""
    q, p, lam, inv_mass = _random_inputs(chains=4, dim=16, dtype=jnp.float64)

    def potential(x):
        return 0.5 * jnp.sum(lam * x * x)

    def kinetic(m):
        return 0.5 * jnp.sum(inv_mass * m * m)

    one_step = velocity_verlet(potential, kinetic)

    def generic(qi, pi):
        from aehmc_tpu.types import IntegratorState

        state = IntegratorState(qi, pi, potential(qi), jax.grad(potential)(qi))
        for _ in range(5):
            state = one_step(state, 0.05)
        return state.position, state.momentum

    q_gen, p_gen = jax.vmap(generic)(q, p)
    q_ref, p_ref = batched_leapfrog_reference(q, p, lam, inv_mass, 0.05, 5)
    np.testing.assert_allclose(q_ref, q_gen, rtol=1e-12)
    np.testing.assert_allclose(p_ref, p_gen, rtol=1e-12)


@pytest.mark.parametrize("num_steps", [1, 7])
def test_pallas_kernel_matches_oracle_interpret(num_steps):
    """Pallas kernel (interpret mode) must match the lax oracle."""
    q, p, lam, inv_mass = _random_inputs(chains=16, dim=128)
    eps = jnp.asarray(0.01, jnp.float32)
    q_ref, p_ref = batched_leapfrog_reference(q, p, lam, inv_mass, eps, num_steps)
    q_pl, p_pl = batched_leapfrog_tpu(
        q, p, lam, inv_mass, eps, num_steps, block_chains=8, interpret=True
    )
    np.testing.assert_allclose(q_pl, q_ref, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(p_pl, p_ref, rtol=1e-6, atol=1e-6)


def test_pallas_kernel_fallback_on_odd_chain_count():
    """Non-divisible chain counts fall back to the lax path."""
    q, p, lam, inv_mass = _random_inputs(chains=7, dim=32)
    eps = jnp.asarray(0.01, jnp.float32)
    q1, p1 = batched_leapfrog_tpu(q, p, lam, inv_mass, eps, 3, block_chains=4)
    q2, p2 = batched_leapfrog_reference(q, p, lam, inv_mass, eps, 3)
    np.testing.assert_allclose(q1, q2, rtol=1e-6)
    np.testing.assert_allclose(p1, p2, rtol=1e-6)


def test_fused_logistic_hmc_matches_oracle_interpret():
    from aehmc_tpu.ops.fused_hmc import (
        fused_logistic_hmc_reference,
        fused_logistic_hmc_tpu,
    )

    rng = np.random.default_rng(7)
    dim, n_points, chains, L = 8, 32, 8, 5
    X = jnp.asarray(rng.normal(size=(n_points, dim)) / np.sqrt(dim), jnp.float32)
    y = jnp.asarray((rng.uniform(size=n_points) < 0.5).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(chains, dim)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(chains, dim)), jnp.float32)
    im = jnp.ones(dim, jnp.float32)
    eps = jnp.asarray(0.05, jnp.float32)

    q_ref, p_ref = fused_logistic_hmc_reference(q, p, X, y, im, eps, L)
    q_pl, p_pl = fused_logistic_hmc_tpu(
        q, p, X, y, im, eps, L, block_chains=4, interpret=True
    )
    np.testing.assert_allclose(q_pl, q_ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(p_pl, p_ref, rtol=2e-5, atol=2e-5)


def test_fused_logistic_reference_matches_model_autodiff():
    """The manual-gradient oracle must agree with the model's autodiff."""
    from aehmc_tpu.integrators import velocity_verlet
    from aehmc_tpu.metrics import gaussian_metric
    from aehmc_tpu.ops.fused_hmc import fused_logistic_hmc_reference
    from aehmc_tpu.types import IntegratorState

    rng = np.random.default_rng(9)
    dim, n_points, L = 6, 40, 4
    X = jnp.asarray(rng.normal(size=(n_points, dim)) / np.sqrt(dim))
    y = jnp.asarray((rng.uniform(size=n_points) < 0.5).astype(np.float64))

    def logprob_fn(w):
        logits = X @ w
        return jnp.sum(y * logits - jax.nn.softplus(logits)) - 0.5 * jnp.sum(
            w**2
        )

    im = jnp.ones(dim)
    eps = jnp.asarray(0.05)
    _, ke, _ = gaussian_metric(im)
    integ = velocity_verlet(lambda x: -logprob_fn(x), ke)

    q = jnp.asarray(rng.normal(size=(3, dim)))
    p = jnp.asarray(rng.normal(size=(3, dim)))

    def auto(qi, pi):
        st = IntegratorState(
            qi, pi, -logprob_fn(qi), jax.grad(lambda x: -logprob_fn(x))(qi)
        )
        st = jax.lax.fori_loop(0, L, lambda _, s: integ(s, eps), st)
        return st.position, st.momentum

    q_auto, p_auto = jax.vmap(auto)(q, p)
    q_man, p_man = fused_logistic_hmc_reference(q, p, X, y, im, eps, L)
    np.testing.assert_allclose(q_man, q_auto, rtol=1e-10)
    np.testing.assert_allclose(p_man, p_auto, rtol=1e-10)
