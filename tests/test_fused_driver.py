"""The fused warmup/sampling driver in interpret mode (CPU): the Stan
window state machine must drive the megakernel's runtime eps/imm inputs
and move them in the right direction.  Statistical quality at scale is
gated on TPU (tests/test_nuts_fused_tpu.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aehmc_tpu.ops.fused_driver import sample_fused_adaptive

VAR = np.asarray([0.5, 2.0, 1.0, 4.0], np.float32)


def _potential(q, var_row):
    return 0.5 * jnp.sum(q * q / var_row, axis=-1)


def _potential_t(q_t, var_col):
    return 0.5 * jnp.sum(q_t * q_t / var_col, axis=0)


@pytest.mark.parametrize("layout", ["standard", "small"])
def test_adaptive_driver_tunes_and_samples(layout):
    chains, dim = 8, VAR.size
    q0 = jax.random.normal(
        jax.random.PRNGKey(0), (chains, dim), jnp.float32
    ) * jnp.sqrt(jnp.asarray(VAR))
    kwargs = dict(
        num_samples=40,
        num_warmup=60,
        max_num_expansions=4,
        block_chains=chains,
        use_internal_prng=False,  # interpret mode has no on-chip PRNG
        interpret=True,
    )
    if layout == "small":
        qf, pos, stats, eps, imm = sample_fused_adaptive(
            jax.random.PRNGKey(1), None, [VAR.reshape(-1, 1)], q0,
            potential_fn_t=_potential_t, **kwargs,
        )
    else:
        qf, pos, stats, eps, imm = sample_fused_adaptive(
            jax.random.PRNGKey(1), _potential, [VAR], q0, **kwargs,
        )
    stats = np.asarray(stats)
    assert pos.shape == (40, chains, dim)
    assert qf.shape == (chains, dim)
    # warmup moved the tuning parameters in the right direction
    assert 0.05 < float(eps) < 3.0
    imm = np.asarray(imm)
    assert imm.shape == (dim,)
    # diag mass matrix ordered like the true variances (loose: only 60
    # pooled warmup steps across 8 chains)
    assert imm[3] > imm[0]
    # sampling phase healthy
    assert stats[:, :, 1].mean() > 0.4
    assert np.isfinite(np.asarray(pos)).all()
