import jax
import jax.numpy as jnp
import numpy as np

from regcn_tpu.utils.profiling import StepTimer, gradient_stats, parameter_count, training_summary


def test_gradient_stats():
    grads = {"a": jnp.ones((3, 4)), "nested": {"b": 2 * jnp.ones((5,))}}
    stats = gradient_stats(grads)
    expected_a = np.sqrt(12.0)
    expected_b = np.sqrt(4 * 5.0)
    np.testing.assert_allclose(stats["global_norm"],
                               np.sqrt(expected_a**2 + expected_b**2), rtol=1e-6)
    assert any("a" in k for k in stats)


def test_parameter_count_and_summary():
    from regcn_tpu.config import ModelConfig

    params = {"w": jnp.zeros((10, 5)), "b": jnp.zeros((5,))}
    assert parameter_count(params) == 55
    s = training_summary(params, ModelConfig(num_ents=3, num_rels=2))
    assert s["num_parameters"] == 55
    assert s["config"]["num_ents"] == 3


def test_step_timer():
    t = StepTimer(window=3)
    for _ in range(5):
        with t:
            pass
    assert len(t.times) == 3 and t.mean_s >= 0
