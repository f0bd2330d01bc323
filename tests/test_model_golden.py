"""Full-model golden test: the JAX RecurrentRGCN evolution vs an
independent torch implementation of the same spec (SURVEY.md §2.2,
behavioral parity with ref:src/rrgcn.py:142-180), on fixed shared
parameters in eval mode."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from regcn_tpu.config import ModelConfig
from regcn_tpu.data import build_history
from regcn_tpu.models import recurrent


def _torch_evolve(params, cfg, snapshots, num_rels):
    """Spec implementation with explicit loops (eval mode, no dropout)."""
    def t(x):
        return torch.from_numpy(np.asarray(x)).float()

    h = F.normalize(t(params["dynamic_emb"])) if cfg.layer_norm else t(params["dynamic_emb"])
    emb_rel = t(params["emb_rel"])
    cell = torch.nn.GRUCell(2 * cfg.h_dim, cfg.h_dim)
    with torch.no_grad():
        cell.weight_ih.copy_(t(params["gru"]["w_ih"]))
        cell.weight_hh.copy_(t(params["gru"]["w_hh"]))
        cell.bias_ih.copy_(t(params["gru"]["b_ih"]))
        cell.bias_hh.copy_(t(params["gru"]["b_hh"]))

    h0 = emb_rel
    slope = (1 / 8 + 1 / 3) / 2
    for triples in snapshots:
        # relation context: mean over unique incident entities per relation
        ctx = torch.zeros(2 * num_rels, cfg.h_dim)
        for r in np.unique(triples[:, 1]):
            ents = np.unique(
                np.concatenate([triples[triples[:, 1] == r][:, 0],
                                triples[triples[:, 1] == r][:, 2]])
            )
            m = h[torch.from_numpy(ents)].mean(0)
            ctx[r] = m
            ctx[r + num_rels] = m
        x_input = torch.cat([emb_rel, ctx], dim=1)
        with torch.no_grad():
            h0 = cell(x_input, h0)
        if cfg.layer_norm:
            h0 = F.normalize(h0)

        # edges with inverses
        src = np.concatenate([triples[:, 0], triples[:, 2]])
        dst = np.concatenate([triples[:, 2], triples[:, 0]])
        rel = np.concatenate([triples[:, 1], triples[:, 1] + num_rels])
        in_deg = np.bincount(dst, minlength=cfg.num_ents)
        norm = 1.0 / np.maximum(in_deg, 1)

        x = h
        for li, lp in enumerate(params["rgcn"]["layers"]):
            agg = torch.zeros_like(x)
            msg = (x[torch.from_numpy(src)] + h0[torch.from_numpy(rel)]) @ t(lp["w_neighbor"])
            agg.index_add_(0, torch.from_numpy(dst), msg)
            agg = agg * torch.from_numpy(norm).float()[:, None]
            loop_in = x @ t(lp["loop_w"])
            loop_iso = x @ t(lp["evolve_loop_w"])
            has_in = torch.from_numpy((in_deg > 0).astype(np.float32))[:, None]
            node = agg + has_in * loop_in + (1 - has_in) * loop_iso
            x = torch.where(node >= 0, node, node * slope)
        cur = F.normalize(x) if cfg.layer_norm else x
        gate = torch.sigmoid(h @ t(params["time_gate_w"]) + t(params["time_gate_b"]))
        h = gate * cur + (1 - gate) * h
    return h.numpy(), h0.numpy()


def test_evolve_matches_torch_spec(rng):
    n, r = 40, 5
    cfg = ModelConfig(num_ents=n, num_rels=r, h_dim=16, n_layers=2, dropout=0.0)
    params, _ = recurrent.init_params(jax.random.PRNGKey(3), cfg)

    snapshots = []
    for _ in range(3):
        m = 60
        tr = np.stack(
            [rng.integers(0, n, m), rng.integers(0, r, m), rng.integers(0, n, m)], 1
        )
        snapshots.append(np.unique(tr, axis=0))

    history = build_history(snapshots, n, r, edge_bucket=32, rc_bucket=32)
    h, h0, _, _ = recurrent.evolve(params, cfg, history, rng=None, train=False)

    h_t, h0_t = _torch_evolve(
        jax.tree.map(np.asarray, params), cfg, snapshots, r
    )
    np.testing.assert_allclose(np.asarray(h0), h0_t, rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(h), h_t, rtol=3e-4, atol=3e-4)
