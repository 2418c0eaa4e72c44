"""Effect-handler semantics: trace/seed/substitute/condition/replay/block."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from velocycle_tpu.core import handlers as h
from velocycle_tpu.core import distributions as dist


def model():
    x = h.sample("x", dist.Normal(0.0, 1.0))
    y = h.sample("y", dist.Normal(x, 0.5))
    h.deterministic("z", x + y)
    return y


def test_seed_trace_deterministic():
    key = jax.random.PRNGKey(0)
    tr1 = h.trace(h.seed(model, key)).get_trace()
    tr2 = h.trace(h.seed(model, key)).get_trace()
    assert set(tr1) == {"x", "y", "z"}
    np.testing.assert_array_equal(tr1["x"]["value"], tr2["x"]["value"])
    np.testing.assert_array_equal(tr1["y"]["value"], tr2["y"]["value"])
    assert float(tr1["z"]["value"]) == pytest.approx(
        float(tr1["x"]["value"]) + float(tr1["y"]["value"]), rel=1e-6
    )


def test_seed_distinct_keys_per_site():
    key = jax.random.PRNGKey(0)
    tr = h.trace(h.seed(model, key)).get_trace()
    assert float(tr["x"]["value"]) != float(tr["y"]["value"])


def test_substitute_fixes_values():
    key = jax.random.PRNGKey(0)
    tr = h.trace(
        h.seed(h.substitute(model, data={"x": jnp.asarray(2.0)}), key)
    ).get_trace()
    assert float(tr["x"]["value"]) == 2.0
    assert not tr["x"]["is_observed"]


def test_condition_marks_observed():
    key = jax.random.PRNGKey(0)
    tr = h.trace(
        h.seed(h.condition(model, data={"y": jnp.asarray(1.5)}), key)
    ).get_trace()
    assert float(tr["y"]["value"]) == 1.5
    assert tr["y"]["is_observed"]


def test_replay_reuses_trace():
    key = jax.random.PRNGKey(0)
    guide_tr = h.trace(h.seed(model, key)).get_trace()
    tr = h.trace(
        h.seed(h.replay(model, guide_trace=guide_tr), jax.random.PRNGKey(9))
    ).get_trace()
    np.testing.assert_array_equal(tr["x"]["value"], guide_tr["x"]["value"])
    np.testing.assert_array_equal(tr["y"]["value"], guide_tr["y"]["value"])


def test_block_hides_sites():
    key = jax.random.PRNGKey(0)
    tr = h.trace(h.seed(h.block(model, hide=["x"]), key)).get_trace()
    assert "x" not in tr
    assert "y" in tr


def test_factor_adds_logprob():
    def m():
        h.factor("f", jnp.asarray([1.0, 2.0]))

    tr = h.trace(h.seed(m, jax.random.PRNGKey(0))).get_trace()
    assert float(tr["f"]["fn"].log_prob(tr["f"]["value"])) == 3.0


def test_param_init_and_substitute():
    def guide():
        a = h.param("a", jnp.asarray(1.0))
        b = h.sample("b", dist.Normal(a, 1.0))
        return b

    from velocycle_tpu.infer.svi import init_params

    params, constraints = init_params(guide, jax.random.PRNGKey(0))
    assert float(params["a"]) == 1.0
    tr = h.trace(
        h.seed(h.substitute(guide, data={"a": jnp.asarray(5.0)}),
               jax.random.PRNGKey(0))
    ).get_trace()
    assert float(tr["a"]["value"]) == 5.0


def test_handlers_work_under_jit():
    def loss(mu):
        tr = h.trace(
            h.seed(
                h.condition(model, data={"y": jnp.asarray(0.3)}),
                jax.random.PRNGKey(0),
            )
        ).get_trace()
        return tr["y"]["fn"].log_prob(tr["y"]["value"]).sum() * mu

    g = jax.jit(jax.grad(loss))(jnp.asarray(1.0))
    assert np.isfinite(float(g))
