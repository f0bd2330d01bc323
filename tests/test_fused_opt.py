"""fuse_small_leaves is exact: same updates as the unfused chain."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from regcn_tpu.train.fused_opt import fuse_small_leaves


def _tree(key):
    ks = jax.random.split(key, 6)
    return {
        "table": jax.random.normal(ks[0], (2048, 32)),   # big: stays per-leaf
        "w": jax.random.normal(ks[1], (16, 16)),
        "b": jax.random.normal(ks[2], (16,)),
        "nested": {"scale": jax.random.normal(ks[3], (8,)),
                   "gate": jax.random.normal(ks[4], (4, 4))},
        "scalar": jax.random.normal(ks[5], ()),          # size-1 leaf
    }


def test_fused_updates_match_unfused():
    params = _tree(jax.random.PRNGKey(0))
    grads = _tree(jax.random.PRNGKey(1))
    chain = lambda: optax.chain(optax.clip_by_global_norm(1.0),
                                optax.add_decayed_weights(1e-5),
                                optax.adam(1e-3))
    ref, fused = chain(), fuse_small_leaves(chain(), threshold=1024)
    s_ref, s_f = ref.init(params), fused.init(params)
    for i in range(3):
        u_ref, s_ref = ref.update(grads, s_ref, params)
        u_f, s_f = fused.update(grads, s_f, params)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a, np.float64), np.asarray(b, np.float64),
                rtol=1e-6, atol=1e-7),
            u_ref, u_f)
        params = optax.apply_updates(params, u_ref)


def test_fused_under_jit_donation():
    params = _tree(jax.random.PRNGKey(2))
    grads = _tree(jax.random.PRNGKey(3))
    opt = fuse_small_leaves(optax.adam(1e-3), threshold=1024)
    state = opt.init(params)

    @jax.jit
    def step(p, s, g):
        u, s2 = opt.update(g, s, p)
        return optax.apply_updates(p, u), s2

    p2, s2 = step(params, state, grads)
    assert jax.tree.structure(p2) == jax.tree.structure(params)
