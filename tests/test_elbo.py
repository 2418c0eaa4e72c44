"""ELBO correctness: closed-form conjugate-Normal check + Delta semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from velocycle_tpu.core import distributions as dist
from velocycle_tpu.core import handlers as h
from velocycle_tpu.core import constraints
from velocycle_tpu.infer import SVI, Trace_ELBO, clipped_adam


def test_svi_recovers_conjugate_normal_posterior():
    """x ~ N(0,1), y_i ~ N(x, 1), observe N draws.  Posterior is
    N(sum y / (N+1), 1/(N+1)).  Mean-field Normal guide must recover it."""
    rng = np.random.default_rng(0)
    true_x = 1.3
    N = 50
    y = (true_x + rng.normal(size=N)).astype(np.float32)
    post_mean = y.sum() / (N + 1)
    post_sd = 1.0 / np.sqrt(N + 1)

    def model(y):
        x = h.sample("x", dist.Normal(0.0, 1.0))
        h.sample("y", dist.Normal(x * jnp.ones(N), 1.0), obs=y)

    def guide(y):
        loc = h.param("loc", jnp.asarray(0.0))
        scale = h.param(
            "scale", jnp.asarray(1.0), constraint=constraints.positive
        )
        h.sample("x", dist.Normal(loc, scale))

    svi = SVI(model, guide, clipped_adam(lr=0.05, lrd=0.999),
              Trace_ELBO(num_particles=4))
    state = svi.init(jax.random.PRNGKey(0), jnp.asarray(y))
    for _ in range(800):
        state, loss = svi.update(state, jnp.asarray(y))
    params = svi.get_params(state)
    assert abs(float(params["loc"]) - post_mean) < 0.05
    assert abs(float(params["scale"]) - post_sd) < 0.05


def test_delta_guide_map_estimate():
    """Delta guide => MAP.  For x~N(0,1), y~N(x,1) with one obs y0, the MAP
    (== posterior mean here) is y0/2."""
    y0 = 2.0

    def model():
        x = h.sample("x", dist.Normal(0.0, 1.0))
        h.sample("y", dist.Normal(x, 1.0), obs=jnp.asarray(y0))

    def guide():
        loc = h.param("loc", jnp.asarray(0.0))
        h.sample("x", dist.Delta(loc))

    svi = SVI(model, guide, clipped_adam(lr=0.1, lrd=0.999))
    state = svi.init(jax.random.PRNGKey(0))
    for _ in range(500):
        state, _ = svi.update(state)
    assert abs(float(svi.get_params(state)["loc"]) - y0 / 2) < 0.02


def test_conditioned_sites_blocked_from_guide():
    """condition(model) + block(guide) — stage-2 pattern of the reference
    fit drivers: pinned sites contribute fixed logp, no log q."""
    pinned = jnp.asarray(0.7)

    def model():
        x = h.sample("x", dist.Normal(0.0, 1.0))
        z = h.sample("z", dist.Normal(1.0, 1.0))
        h.sample("y", dist.Normal(x + z, 0.5), obs=jnp.asarray(2.0))

    def guide():
        locx = h.param("locx", jnp.asarray(0.0))
        h.sample("x", dist.Delta(locx))
        locz = h.param("locz", jnp.asarray(0.0))
        h.sample("z", dist.Delta(locz))

    cond_model = h.condition(model, data={"z": pinned})
    blocked_guide = h.block(guide, hide=["z"])
    svi = SVI(cond_model, blocked_guide, clipped_adam(lr=0.1, lrd=0.999))
    state = svi.init(jax.random.PRNGKey(0))
    for _ in range(600):
        state, _ = svi.update(state)
    # MAP of x given z pinned: argmax -x^2/2 - (2 - x - 0.7)^2/(2*0.25)
    # => x = (1.3/0.25) / (1 + 1/0.25) = 5.2/5 = 1.04
    assert abs(float(svi.get_params(state)["locx"]) - 1.04) < 0.03


def test_elbo_value_closed_form():
    """For model x~N(0,1) (no data) and guide x~N(m,s), ELBO =
    -KL(q||p) = 0.5*(1 + log s^2 - m^2 - s^2).  Check the estimator's
    expectation with many particles."""
    m, s = 0.4, 0.8

    def model():
        h.sample("x", dist.Normal(0.0, 1.0))

    def guide():
        h.sample("x", dist.Normal(jnp.asarray(m), jnp.asarray(s)))

    elbo = Trace_ELBO(num_particles=4096)
    loss = elbo.loss(jax.random.PRNGKey(0), model, guide)
    expected = -0.5 * (1 + np.log(s**2) - m**2 - s**2)
    assert abs(float(loss) - expected) < 0.02
