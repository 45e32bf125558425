"""Analytic-physics tests of the velocity-Verlet integrator.

Mirrors ref tests/test_integrators.py: harmonic oscillator, free fall and
circular motion with closed-form endpoints, plus energy conservation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aehmc_tpu.integrators import new_integrator_state, velocity_verlet


def HarmonicOscillator(inverse_mass_matrix, k=1.0, m=1.0):
    def potential_energy(x):
        return jnp.sum(0.5 * k * jnp.square(x))

    def kinetic_energy(p):
        v = inverse_mass_matrix * p
        return jnp.sum(0.5 * jnp.dot(v, p))

    return potential_energy, kinetic_energy


def FreeFall(inverse_mass_matrix, g=1.0):
    def potential_energy(h):
        return jnp.sum(g * h)

    def kinetic_energy(p):
        v = inverse_mass_matrix * p
        return jnp.sum(0.5 * jnp.dot(v, p))

    return potential_energy, kinetic_energy


def CircularMotion(inverse_mass_matrix):
    def potential_energy(q):
        return -1.0 / jnp.power(jnp.square(q[0]) + jnp.square(q[1]), 0.5)

    def kinetic_energy(p):
        return 0.5 * jnp.dot(inverse_mass_matrix, jnp.square(p))

    return potential_energy, kinetic_energy


examples = [
    {
        "model": FreeFall,
        "n_steps": 100,
        "step_size": 0.01,
        "q_init": np.array([0.0]),
        "p_init": np.array([1.0]),
        "q_final": np.array([0.5]),
        "p_final": np.array([0.0]),
        "inverse_mass_matrix": np.array([1.0]),
    },
    {
        "model": HarmonicOscillator,
        "n_steps": 100,
        "step_size": 0.01,
        "q_init": np.array([0.0]),
        "p_init": np.array([1.0]),
        "q_final": np.array([np.sin(1.0)]),
        "p_final": np.array([np.cos(1.0)]),
        "inverse_mass_matrix": np.array([1.0]),
    },
    {
        "model": CircularMotion,
        "n_steps": 628,
        "step_size": 0.01,
        "q_init": np.array([1.0, 0.0]),
        "p_init": np.array([0.0, 1.0]),
        "q_final": np.array([1.0, 0.0]),
        "p_final": np.array([0.0, 1.0]),
        "inverse_mass_matrix": np.array([1.0, 1.0]),
    },
]


@pytest.mark.parametrize("example", examples)
def test_velocity_verlet(example):
    model = example["model"]
    inverse_mass_matrix = jnp.asarray(example["inverse_mass_matrix"])
    step_size = example["step_size"]

    potential, kinetic_energy = model(inverse_mass_matrix)
    one_step = velocity_verlet(potential, kinetic_energy)

    state = new_integrator_state(
        potential, jnp.asarray(example["q_init"]), jnp.asarray(example["p_init"])
    )
    energy0 = state.potential_energy + kinetic_energy(state.momentum)

    state = jax.jit(
        lambda s: jax.lax.fori_loop(
            0, example["n_steps"], lambda _, x: one_step(x, step_size), s
        )
    )(state)

    np.testing.assert_allclose(example["q_final"], state.position, atol=1e-2)
    np.testing.assert_allclose(example["p_final"], state.momentum, atol=1e-2)

    energy1 = state.potential_energy + kinetic_energy(state.momentum)
    assert energy0 == pytest.approx(energy1, 1e-4)


def test_velocity_verlet_caches_gradient():
    """Each step must carry U and grad U consistent with the position."""
    potential, kinetic = HarmonicOscillator(jnp.ones(2))
    one_step = velocity_verlet(potential, kinetic)
    state = new_integrator_state(potential, jnp.ones(2), jnp.ones(2))
    new = one_step(state, 0.1)
    np.testing.assert_allclose(new.potential_energy, potential(new.position))
    np.testing.assert_allclose(
        new.potential_energy_grad, jax.grad(potential)(new.position)
    )


@pytest.mark.parametrize("scheme", ["mclachlan", "yoshida"])
@pytest.mark.parametrize("example", examples)
def test_higher_order_integrators(scheme, example):
    from aehmc_tpu import integrators as I

    model = example["model"]
    inverse_mass_matrix = jnp.asarray(example["inverse_mass_matrix"])
    step_size = example["step_size"]

    potential, kinetic_energy = model(inverse_mass_matrix)
    one_step = getattr(I, scheme)(potential, kinetic_energy)

    state = new_integrator_state(
        potential, jnp.asarray(example["q_init"]), jnp.asarray(example["p_init"])
    )
    energy0 = state.potential_energy + kinetic_energy(state.momentum)
    state = jax.jit(
        lambda s: jax.lax.fori_loop(
            0, example["n_steps"], lambda _, x: one_step(x, step_size), s
        )
    )(state)
    np.testing.assert_allclose(example["q_final"], state.position, atol=1e-2)
    np.testing.assert_allclose(example["p_final"], state.momentum, atol=1e-2)
    energy1 = state.potential_energy + kinetic_energy(state.momentum)
    assert energy0 == pytest.approx(energy1, 1e-4)


def test_mclachlan_smaller_energy_error_than_verlet():
    """At equal step size the two-stage scheme conserves energy better."""
    from aehmc_tpu import integrators as I

    potential, kinetic = HarmonicOscillator(jnp.ones(1))

    def energy_error(scheme, eps, n):
        step = scheme(potential, kinetic)
        state = new_integrator_state(
            potential, jnp.asarray([0.3]), jnp.asarray([1.1])
        )
        e0 = state.potential_energy + kinetic(state.momentum)
        state = jax.lax.fori_loop(0, n, lambda _, s: step(s, eps), state)
        e1 = state.potential_energy + kinetic(state.momentum)
        return abs(float(e1 - e0))

    err_verlet = energy_error(I.velocity_verlet, 0.5, 100)
    err_mcl = energy_error(I.mclachlan, 0.5, 100)
    err_yos = energy_error(I.yoshida, 0.5, 100)
    assert err_mcl < err_verlet
    assert err_yos < err_verlet


def test_nuts_with_mclachlan_integrator():
    """The integrator plugs into the NUTS kernel."""
    from aehmc_tpu import integrators as I
    from aehmc_tpu import nuts

    logprob_fn = lambda q: -0.5 * jnp.sum(q**2)  # noqa: E731
    kernel = nuts.new_kernel(logprob_fn, integrator=I.mclachlan)
    state = nuts.new_state(jnp.ones(2), logprob_fn)
    new_state, info = kernel(
        jax.random.PRNGKey(0), state, jnp.asarray(0.8), jnp.ones(2)
    )
    assert np.all(np.isfinite(np.asarray(new_state.position)))
    assert not bool(info.is_diverging)
