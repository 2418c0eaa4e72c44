"""Checkpoint round trips (orbax + npz) and profiling utilities."""
import numpy as np
import jax
import jax.numpy as jnp

from velocycle_tpu.checkpoint import Checkpointer, load_state, save_state
from velocycle_tpu.profiling import StepTimer, device_memory_stats


def _toy_state():
    from velocycle_tpu.core import distributions as dist
    from velocycle_tpu.core.handlers import param, sample
    from velocycle_tpu.infer import SVI, Trace_ELBO, adam

    y = jnp.asarray([1.0, 2.0, 1.5])

    def model():
        mu = sample("mu", dist.Normal(0.0, 10.0))
        sample("y", dist.Normal(mu, 1.0).to_event(1), obs=y)

    def guide():
        loc = param("loc", jnp.zeros(()))
        sample("mu", dist.Delta(loc))

    svi = SVI(model, guide, adam(0.1), Trace_ELBO())
    state = svi.init(jax.random.PRNGKey(0))
    for _ in range(5):
        state, _ = svi.update(state)
    return svi, state


def test_npz_roundtrip(tmp_path):
    svi, state = _toy_state()
    path = str(tmp_path / "state.npz")
    save_state(path, state)
    restored = load_state(path, state)
    for a, b in zip(
        jax.tree_util.tree_leaves(state),
        jax.tree_util.tree_leaves(restored),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpointer_resume(tmp_path):
    svi, state = _toy_state()
    ckpt = Checkpointer(str(tmp_path / "run"), use_orbax=False)
    ckpt.save(5, state)
    # continue a few steps, save again
    state2 = state
    for _ in range(3):
        state2, _ = svi.update(state2)
    ckpt.save(8, state2)
    assert ckpt.latest_step() == 8
    restored = ckpt.restore(state_like=state)
    np.testing.assert_allclose(
        np.asarray(restored.params["loc"]),
        np.asarray(state2.params["loc"]),
    )
    old = ckpt.restore(state_like=state, step=5)
    np.testing.assert_allclose(
        np.asarray(old.params["loc"]), np.asarray(state.params["loc"])
    )
    # resuming continues training identically
    resumed = svi.update(restored)[0]
    direct = svi.update(state2)[0]
    np.testing.assert_allclose(
        np.asarray(resumed.params["loc"]),
        np.asarray(direct.params["loc"]),
        rtol=1e-6,
    )


def test_checkpointer_orbax_roundtrip(tmp_path):
    svi, state = _toy_state()
    try:
        ckpt = Checkpointer(str(tmp_path / "orun"), use_orbax=True)
    except ImportError:
        return
    ckpt.save(1, state)
    restored = ckpt.restore(state_like=state)
    np.testing.assert_allclose(
        np.asarray(restored.params["loc"]),
        np.asarray(state.params["loc"]),
    )


def test_step_timer():
    t = StepTimer()
    for _ in range(4):
        with t:
            pass
    s = t.summary()
    assert s["steps"] == 4
    assert s["steps_per_s"] > 0
    assert np.isfinite(s["mean_ms"])


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert len(stats) == len(jax.devices())
