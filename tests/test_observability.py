"""Progress logging, profiler spans, finite guards, throughput counters."""

import jax
import jax.numpy as jnp

from aehmc_tpu import nuts, observability
from aehmc_tpu.models import std_normal
from aehmc_tpu.types import Diagnostics


def _info(accept=0.9, diverging=False, steps=3):
    return Diagnostics(
        acceptance_probability=jnp.asarray(accept),
        num_doublings=jnp.asarray(2, jnp.int32),
        is_turning=jnp.asarray(True),
        is_diverging=jnp.asarray(diverging),
        energy=jnp.asarray(1.0),
        num_integration_steps=jnp.asarray(steps, jnp.int32),
    )


def test_progress_callback_fires_on_schedule():
    lines = []

    def printer(step, acceptance, divergences):
        lines.append((int(step), float(acceptance), int(divergences)))

    def body(carry, step):
        observability.progress_callback(step, _info(), every=10, printer=printer)
        return carry, ()

    jax.lax.scan(body, 0, jnp.arange(25))
    jax.effects_barrier()
    steps = sorted(s for s, _, _ in lines)
    assert steps == [0, 10, 20]


def test_guard_finite_flags_nan(capsys):
    ok = observability.guard_finite(jnp.asarray([1.0, 2.0]))
    assert bool(ok)
    ok = observability.guard_finite(jnp.asarray([1.0, jnp.nan]))
    jax.effects_barrier()
    assert not bool(ok)


def test_annotate_span_runs():
    with observability.annotate("warmup"):
        x = jnp.sum(jnp.ones(8))
    assert float(x) == 8.0


def test_grad_evals_counter_consistent():
    logprob_fn = std_normal()
    kernel = nuts.new_kernel(logprob_fn)
    state = nuts.new_state(jnp.zeros(2), logprob_fn)
    _, info = kernel(
        jax.random.PRNGKey(0), state, jnp.asarray(0.5), jnp.ones(2)
    )
    # counter is the sum of subtree lengths: at most 2^d - 1 over d doublings
    assert 1 <= int(info.num_integration_steps) <= 2 ** int(info.num_doublings) - 1
    rate = observability.grad_evals_per_sec(info, 2.0)
    assert rate == int(info.num_integration_steps) / 2.0
