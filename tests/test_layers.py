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
