"""Golden parity tests: JAX layers vs independent torch implementations.

The torch models here are written from the behavioral spec in SURVEY.md
(not copied from the reference) purely to validate numerical parity of
the JAX implementations — torch (CPU) is available in the image.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from regcn_tpu.models.layers import gru_cell, init_gru_cell
from regcn_tpu.models import decoders


def test_gru_cell_matches_torch(rng):
    d_in, d_h, b = 12, 8, 5
    params = init_gru_cell(jax.random.PRNGKey(0), d_in, d_h)
    x = rng.normal(size=(b, d_in)).astype(np.float32)
    h = rng.normal(size=(b, d_h)).astype(np.float32)

    cell = torch.nn.GRUCell(d_in, d_h)
    with torch.no_grad():
        cell.weight_ih.copy_(torch.from_numpy(np.asarray(params["w_ih"])))
        cell.weight_hh.copy_(torch.from_numpy(np.asarray(params["w_hh"])))
        cell.bias_ih.copy_(torch.from_numpy(np.asarray(params["b_ih"])))
        cell.bias_hh.copy_(torch.from_numpy(np.asarray(params["b_hh"])))
        expected = cell(torch.from_numpy(x), torch.from_numpy(h)).numpy()

    out = gru_cell(params, jnp.asarray(x), jnp.asarray(h))
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-5)


class _TorchConvTransE(torch.nn.Module):
    """Behavioral spec of ConvTransE (SURVEY.md §2.2 / ref:src/decoder.py:55-100):
    tanh embeddings -> stack [e1; rel] as 2ch signal -> BN -> conv1d(2->C,k)
    -> BN -> relu -> flatten -> fc -> BN -> relu -> @ tanh(E)^T."""

    def __init__(self, d, channels=50, kernel=3):
        super().__init__()
        self.conv = torch.nn.Conv1d(2, channels, kernel, padding=kernel // 2)
        self.bn0 = torch.nn.BatchNorm1d(2)
        self.bn1 = torch.nn.BatchNorm1d(channels)
        self.bn2 = torch.nn.BatchNorm1d(d)
        self.fc = torch.nn.Linear(d * channels, d)

    def forward(self, embedding, emb_rel, triples):
        ent = torch.tanh(embedding)
        e1 = ent[triples[:, 0]].unsqueeze(1)
        r = emb_rel[triples[:, 1]].unsqueeze(1)
        x = self.bn0(torch.cat([e1, r], 1))
        x = F.relu(self.bn1(self.conv(x)))
        x = x.view(len(triples), -1)
        x = F.relu(self.bn2(self.fc(x)))
        return x @ ent.t()


@pytest.mark.parametrize("train", [False, True])
def test_convtranse_matches_torch(rng, train):
    n, r2, d, b, c = 30, 8, 16, 10, 5
    emb = rng.normal(size=(n, d)).astype(np.float32)
    rel = rng.normal(size=(r2, d)).astype(np.float32)
    triples = np.stack(
        [rng.integers(0, n, b), rng.integers(0, r2, b), rng.integers(0, n, b)], 1
    ).astype(np.int32)

    params, state = decoders.init_convtrans(jax.random.PRNGKey(1), d, channels=c, kernel=3)

    tm = _TorchConvTransE(d, channels=c, kernel=3)
    with torch.no_grad():
        tm.conv.weight.copy_(torch.from_numpy(np.asarray(params["conv_w"])))
        tm.conv.bias.copy_(torch.from_numpy(np.asarray(params["conv_b"])))
        tm.fc.weight.copy_(torch.from_numpy(np.asarray(params["fc_w"])))
        tm.fc.bias.copy_(torch.from_numpy(np.asarray(params["fc_b"])))
    tm.train(train)
    expected = tm(
        torch.from_numpy(emb), torch.from_numpy(rel), torch.from_numpy(triples.astype(np.int64))
    ).detach().numpy()

    scores, new_state = decoders.convtranse_score(
        params, state, jnp.asarray(emb), jnp.asarray(rel), jnp.asarray(triples),
        mask=jnp.ones((b,)), train=train,
    )
    np.testing.assert_allclose(scores, expected, rtol=2e-4, atol=2e-4)
    if train:
        # running stats must update like torch (momentum 0.1)
        np.testing.assert_allclose(
            new_state["bn1"]["mean"], tm.bn1.running_mean.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            new_state["bn1"]["var"], tm.bn1.running_var.numpy(), rtol=1e-3, atol=1e-4
        )


def test_convtranse_masked_rows_do_not_change_stats(rng):
    n, r2, d, b = 20, 6, 8, 6
    emb = rng.normal(size=(n, d)).astype(np.float32)
    rel = rng.normal(size=(r2, d)).astype(np.float32)
    triples = np.stack(
        [rng.integers(0, n, b), rng.integers(0, r2, b), rng.integers(0, n, b)], 1
    ).astype(np.int32)
    params, state = decoders.init_convtrans(jax.random.PRNGKey(2), d, channels=4)

    mask_full = jnp.ones((b,))
    s1, st1 = decoders.convtranse_score(
        params, state, jnp.asarray(emb), jnp.asarray(rel), jnp.asarray(triples),
        mask=mask_full, train=True,
    )
    # append garbage padded rows with mask 0: valid-row scores and BN stats
    # must be unchanged
    pad = np.concatenate([triples, np.zeros((3, 3), np.int32)])
    mask_pad = jnp.concatenate([mask_full, jnp.zeros((3,))])
    s2, st2 = decoders.convtranse_score(
        params, state, jnp.asarray(emb), jnp.asarray(rel), jnp.asarray(pad),
        mask=mask_pad, train=True,
    )
    np.testing.assert_allclose(s1, s2[:b], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(st1["bn1"]["mean"], st2["bn1"]["mean"], rtol=1e-5, atol=1e-6)


def _basis_loop_spec(weight, w_comp, h, src, dst, rel, mask, norm, n):
    """Per-edge loop spec of RGCNBasisLayer.propagate (ref:rgcn/layers.py:118-144)."""
    num_bases = weight.shape[0]
    if w_comp is not None:
        full = np.einsum("rb,bio->rio", w_comp, weight)
    else:
        full = weight
    out = np.zeros((n, weight.shape[2]), np.float32)
    for e in range(len(src)):
        if not mask[e]:
            continue
        out[dst[e]] += h[src[e]] @ full[rel[e]]
    return out * norm[:, None]


@pytest.mark.parametrize("num_bases", [-1, 3])
def test_rgcn_basis_layer_matches_loop_spec(rng, tiny_graph, num_bases):
    from regcn_tpu.data import build_snapshot
    from regcn_tpu.models.layers import init_rgcn_basis_layer, rgcn_basis_layer

    n, r, triples = tiny_graph
    d_in, d_out = 8, 10
    snap = build_snapshot(triples, n, r, edge_bucket=512)
    params = init_rgcn_basis_layer(
        jax.random.PRNGKey(1), d_in, d_out, 2 * r, num_bases=num_bases, bias=True)
    h = rng.normal(size=(n, d_in)).astype(np.float32)

    out = rgcn_basis_layer(params, jnp.asarray(h), snap, activation=jax.nn.relu)
    expected = _basis_loop_spec(
        np.asarray(params["weight"]),
        np.asarray(params["w_comp"]) if "w_comp" in params else None,
        h, np.asarray(snap.src), np.asarray(snap.dst), np.asarray(snap.rel),
        np.asarray(snap.edge_mask), np.asarray(snap.in_deg_norm), n)
    expected = np.maximum(expected + np.asarray(params["bias"]), 0.0)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_rgcn_basis_layer_input_mode(rng, tiny_graph):
    """Featureless input mode: message = weight[rel, src] row lookup."""
    from regcn_tpu.data import build_snapshot
    from regcn_tpu.models.layers import init_rgcn_basis_layer, rgcn_basis_layer

    n, r, triples = tiny_graph
    d_out = 8
    snap = build_snapshot(triples, n, r, edge_bucket=512)
    params = init_rgcn_basis_layer(jax.random.PRNGKey(2), n, d_out, 2 * r)
    h_onehot = np.eye(n, dtype=np.float32)

    out_lookup = rgcn_basis_layer(params, jnp.asarray(h_onehot), snap,
                                  input_layer=True)
    out_dense = rgcn_basis_layer(params, jnp.asarray(h_onehot), snap,
                                 input_layer=False)
    np.testing.assert_allclose(np.asarray(out_lookup), np.asarray(out_dense),
                               rtol=1e-4, atol=1e-5)
