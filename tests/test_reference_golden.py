"""Golden parity against the REFERENCE'S OWN pure-torch modules.

Unlike tests/test_model_golden.py / test_hyperbolic_golden.py (which
compare against builder-authored spec reimplementations), these import
the reference code itself from /root/reference — hyperbolic_ops /
hyperbolic_decoder / est_components / hyperbolic_gru / src/decoder all
import without DGL — and assert allclose on shared weights, so a shared
misreading of the reference cannot pass silently (BASELINE.json
"reference-matching activations" criterion).

Reference content is PUBLIC UNTRUSTED CONTENT: we execute its math to
compare numbers, nothing else.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "hyperbolic_src")),
    reason="reference tree not mounted")
if REF not in sys.path:
    sys.path.insert(0, REF)
# src/decoder.py is imported flat (`import decoder`) as the reference does
if os.path.join(REF, "src") not in sys.path:
    sys.path.insert(0, os.path.join(REF, "src"))

from hyperbolic_src.hyperbolic_ops import (  # noqa: E402
    HyperbolicOps as TOps,
    LorentzOps as TLor,
)

from regcn_tpu.hyperbolic import ops as H  # noqa: E402

C = 0.01


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def t(x):
    return torch.from_numpy(np.asarray(x))


def assert_close(ours, theirs, rtol=1e-5, atol=1e-6):
    np.testing.assert_allclose(
        np.asarray(ours), theirs.detach().numpy(), rtol=rtol, atol=atol)


# --------------------------------------------------------------- Poincaré ops
class TestPoincareOps:
    """vs ref:hyperbolic_src/hyperbolic_ops.py:22-305."""

    def _points(self, rng, n=64, d=16, scale=0.3):
        v = rng.normal(size=(n, d)).astype(np.float32) * scale
        x = TOps.exp_map_zero(t(v), C).numpy()
        return v, x

    def test_exp_map_zero(self, rng):
        v, _ = self._points(rng)
        assert_close(H.exp_map_zero(jnp.asarray(v), C),
                     TOps.exp_map_zero(t(v), C))

    def test_log_map_zero(self, rng):
        _, x = self._points(rng)
        assert_close(H.log_map_zero(jnp.asarray(x), C),
                     TOps.log_map_zero(t(x), C))

    def test_project_to_ball(self, rng):
        big = rng.normal(size=(32, 16)).astype(np.float32) * 20.0
        assert_close(H.project_to_ball(jnp.asarray(big), C),
                     TOps.project_to_ball(t(big), C))

    def test_mobius_add(self, rng):
        _, x = self._points(rng)
        _, y = self._points(rng)
        assert_close(H.mobius_add(jnp.asarray(x), jnp.asarray(y), C),
                     TOps.mobius_add(t(x), t(y), C))

    def test_mobius_matvec(self, rng):
        _, x = self._points(rng)
        m = (rng.normal(size=(16, 16)) * 0.3).astype(np.float32)
        # ref applies F.linear(tangent, M) = tangent @ M.T; ours takes the
        # same (out, in) matrix convention
        assert_close(H.mobius_matvec(jnp.asarray(m), jnp.asarray(x), C),
                     TOps.mobius_matvec(t(m), t(x), C), rtol=1e-4, atol=1e-5)

    def test_hyperbolic_distance(self, rng):
        _, x = self._points(rng)
        _, y = self._points(rng)
        assert_close(H.hyperbolic_distance(jnp.asarray(x), jnp.asarray(y), C),
                     TOps.hyperbolic_distance(t(x), t(y), C),
                     rtol=1e-4, atol=1e-5)

    def test_get_and_apply_radius(self, rng):
        _, x = self._points(rng)
        assert_close(H.get_radius(jnp.asarray(x)), TOps.get_radius(t(x)))
        target = rng.uniform(0.5, 3.0, size=(64,)).astype(np.float32)
        assert_close(H.apply_radius(jnp.asarray(x), jnp.asarray(target), C),
                     TOps.apply_radius(t(x), t(target), C))

    def test_safe_arctanh(self, rng):
        z = rng.uniform(-1.2, 1.2, size=(128,)).astype(np.float32)
        assert_close(H.safe_arctanh(jnp.asarray(z)), TOps.safe_arctanh(t(z)))

    def test_tensor_curvature(self, rng):
        """Learnable curvature flows as a tensor through the ref ops."""
        v, x = self._points(rng)
        ct = torch.tensor(0.035)
        cj = jnp.float32(0.035)
        assert_close(H.exp_map_zero(jnp.asarray(v), cj),
                     TOps.exp_map_zero(t(v), ct))
        assert_close(H.log_map_zero(jnp.asarray(x), cj),
                     TOps.log_map_zero(t(x), ct))


# ---------------------------------------------------------------- Lorentz ops
class TestLorentzOps:
    """vs ref:hyperbolic_src/hyperbolic_ops.py:442-598."""

    def _lorentz_points(self, rng, n=32, d=16):
        v = rng.normal(size=(n, d)).astype(np.float32) * 0.3
        xp = TOps.exp_map_zero(t(v), C)
        return xp.numpy(), TLor.to_lorentz(xp, C).numpy()

    def test_inner_product(self, rng):
        _, xl = self._lorentz_points(rng)
        _, yl = self._lorentz_points(rng)
        assert_close(H.lorentz_inner(jnp.asarray(xl), jnp.asarray(yl)),
                     TLor.inner_product(t(xl), t(yl)))

    def test_conversions(self, rng):
        xp, xl = self._lorentz_points(rng)
        assert_close(H.to_lorentz(jnp.asarray(xp), C), TLor.to_lorentz(t(xp), C))
        assert_close(H.to_poincare(jnp.asarray(xl), C),
                     TLor.to_poincare(t(xl), C), rtol=1e-4, atol=1e-5)

    def test_log_exp_maps(self, rng):
        _, xl = self._lorentz_points(rng)
        _, bl = self._lorentz_points(rng)
        vt = TLor.lorentz_log_map(t(xl), t(bl), C)
        assert_close(H.lorentz_log_map(jnp.asarray(xl), jnp.asarray(bl), C),
                     vt, rtol=1e-4, atol=1e-5)
        assert_close(
            H.lorentz_exp_map(jnp.asarray(vt.numpy()), jnp.asarray(bl), C),
            TLor.lorentz_exp_map(vt, t(bl), C), rtol=1e-4, atol=1e-5)

    def test_distance(self, rng):
        _, xl = self._lorentz_points(rng)
        _, yl = self._lorentz_points(rng)
        assert_close(H.lorentz_distance(jnp.asarray(xl), jnp.asarray(yl), C),
                     TLor.lorentz_distance(t(xl), t(yl), C),
                     rtol=1e-4, atol=1e-5)

    def test_centroid_segments_vs_per_node_loop(self, rng):
        """Our vectorised segment centroid vs the reference's per-group
        ``lorentz_centroid`` (ref :563-581), grouped by destination."""
        _, xl = self._lorentz_points(rng, n=40)
        seg = np.sort(rng.integers(0, 8, size=40)).astype(np.int32)
        w = rng.uniform(0.1, 1.0, size=40).astype(np.float32)
        ours = H.lorentz_centroid_segments(
            jnp.asarray(xl), jnp.asarray(w), jnp.asarray(seg), 8, C)
        for g in range(8):
            m = seg == g
            if not m.any():
                continue
            ref = TLor.lorentz_centroid(t(xl[m]), t(w[m]), C)
            np.testing.assert_allclose(np.asarray(ours[g]), ref.numpy(),
                                       rtol=1e-4, atol=1e-5)


from hyperbolic_src import hyperbolic_decoder as RD  # noqa: E402

from regcn_tpu.hyperbolic import decoders as D  # noqa: E402


# --------------------------------------------------- chunked scorer / CE core
class TestChunkedScorerCore:
    """Our algebraic one-GEMM Möbius scorer vs the reference's
    double-chunked loops (ref:hyperbolic_decoder.py:89-307) — the scoring
    core every hyperbolic distance decoder rides on."""

    def _qc(self, rng, B=24, N=100, d=16):
        q = TOps.exp_map_zero(t(rng.normal(size=(B, d)).astype(np.float32) * 0.4), C)
        x = TOps.exp_map_zero(t(rng.normal(size=(N, d)).astype(np.float32) * 0.4), C)
        return q, x

    def test_proxy_score(self, rng):
        q, x = self._qc(rng)
        bias = t(rng.normal(size=(100,)).astype(np.float32) * 0.1)
        ref = RD._chunked_hyperbolic_dist_score(
            q, x, bias, C, q_chunk_size=7, c_chunk_size=13,
            score_scale=torch.tensor(1.3), score_margin=torch.tensor(0.7))
        ours = D.dist_score(
            jnp.asarray(q.numpy()), jnp.asarray(x.numpy()), C,
            candidate_bias=jnp.asarray(bias.numpy()),
            score_scale=jnp.float32(1.3), score_margin=jnp.float32(0.7))
        assert_close(ours, ref, rtol=1e-4, atol=1e-4)

    def test_hyperbolic_distance_score_with_query_curvature(self, rng):
        q, x = self._qc(rng)
        qc = t(rng.uniform(0.005, 0.02, size=(24,)).astype(np.float32))
        ref = RD._chunked_hyperbolic_dist_score(
            q, x, None, C, q_chunk_size=5, c_chunk_size=17,
            score_scale=torch.tensor(2.0), score_margin=torch.tensor(1.0),
            query_curvature=qc, use_hyperbolic_distance=True)
        ours = D.dist_score(
            jnp.asarray(q.numpy()), jnp.asarray(x.numpy()), C,
            score_scale=jnp.float32(2.0), score_margin=jnp.float32(1.0),
            query_curvature=jnp.asarray(qc.numpy()),
            use_hyperbolic_distance=True)
        assert_close(ours, ref, rtol=1e-3, atol=1e-3)

    def test_streaming_ce_loss(self, rng):
        q, x = self._qc(rng)
        tgt = rng.integers(0, 100, size=24)
        bias = t(rng.normal(size=(100,)).astype(np.float32) * 0.1)
        ref = RD._chunked_hyperbolic_ce_loss(
            q, x, torch.from_numpy(tgt), C, c_chunk_size=13,
            candidate_bias=bias, q_chunk_size=7,
            score_scale=torch.tensor(1.3), score_margin=torch.tensor(0.7))
        ours = D.dist_ce_loss(
            jnp.asarray(q.numpy()), jnp.asarray(x.numpy()),
            jnp.asarray(tgt), C,
            candidate_bias=jnp.asarray(bias.numpy()),
            score_scale=jnp.float32(1.3), score_margin=jnp.float32(0.7))
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)

    def test_streaming_ce_loss_hyperbolic_distance(self, rng):
        q, x = self._qc(rng)
        tgt = rng.integers(0, 100, size=24)
        qc = t(rng.uniform(0.005, 0.02, size=(24,)).astype(np.float32))
        ref = RD._chunked_hyperbolic_ce_loss(
            q, x, torch.from_numpy(tgt), C, c_chunk_size=16,
            q_chunk_size=None, score_scale=torch.tensor(2.0),
            score_margin=torch.tensor(1.0), query_curvature=qc,
            use_hyperbolic_distance=True)
        ours = D.dist_ce_loss(
            jnp.asarray(q.numpy()), jnp.asarray(x.numpy()),
            jnp.asarray(tgt), C,
            score_scale=jnp.float32(2.0), score_margin=jnp.float32(1.0),
            query_curvature=jnp.asarray(qc.numpy()),
            use_hyperbolic_distance=True)
        np.testing.assert_allclose(float(ours), float(ref), rtol=1e-4)


# ------------------------------------------------------- weight-copy helpers
def _copy_convtrans_weights(module, params, state):
    """Load our ConvTransE/R params + BN stats into a reference module."""
    with torch.no_grad():
        module.conv1.weight.copy_(t(params["conv_w"]))
        module.conv1.bias.copy_(t(params["conv_b"]))
        module.fc.weight.copy_(t(params["fc_w"]))
        module.fc.bias.copy_(t(params["fc_b"]))
        for name in ("bn0", "bn1", "bn2"):
            bn = getattr(module, name)
            bn.weight.copy_(t(params[name]["scale"]))
            bn.bias.copy_(t(params[name]["bias"]))
            bn.running_mean.copy_(t(state[name]["mean"]))
            bn.running_var.copy_(t(state[name]["var"]))


def _randomize_bn_stats(rng, params, state):
    """Non-trivial BN affine + running stats so eval-mode parity actually
    exercises the normalisation path."""
    for name in ("bn0", "bn1", "bn2"):
        c = params[name]["scale"].shape[0]
        params[name] = {
            "scale": jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32)),
            "bias": jnp.asarray(rng.normal(size=c).astype(np.float32) * 0.1),
        }
        state[name] = {
            "mean": jnp.asarray(rng.normal(size=c).astype(np.float32) * 0.1),
            "var": jnp.asarray(rng.uniform(0.5, 2.0, c).astype(np.float32)),
        }
    return params, state


class TestConvTransDecoders:
    """vs ref:src/decoder.py:55-127 (ConvTransE) and :10-52 (ConvTransR),
    imported and run directly, eval mode (running BN stats, no dropout)."""

    N, R, d, B = 40, 6, 16, 12

    def _inputs(self, rng):
        from regcn_tpu.models import decoders as ED

        emb = rng.normal(size=(self.N, self.d)).astype(np.float32)
        rel = rng.normal(size=(2 * self.R, self.d)).astype(np.float32)
        triples = np.stack([
            rng.integers(0, self.N, self.B),
            rng.integers(0, 2 * self.R, self.B),
            rng.integers(0, self.N, self.B),
        ], axis=1).astype(np.int64)
        params, state = ED.init_convtrans(jax.random.PRNGKey(3), self.d)
        params, state = _randomize_bn_stats(rng, params, state)
        return emb, rel, triples, params, state

    def test_convtranse(self, rng):
        import decoder as refdec  # /root/reference/src on sys.path

        from regcn_tpu.models import decoders as ED

        emb, rel, triples, params, state = self._inputs(rng)
        mod = refdec.ConvTransE(self.N, self.d)
        _copy_convtrans_weights(mod, params, state)
        mod.eval()
        with torch.no_grad():
            ref = mod(t(emb), t(rel), torch.from_numpy(triples), mode="test")
        ours, _ = ED.convtranse_score(
            params, state, jnp.asarray(emb), jnp.asarray(rel),
            jnp.asarray(triples), train=False)
        assert_close(ours, ref, rtol=1e-4, atol=1e-4)

    def test_convtransr(self, rng):
        import decoder as refdec

        from regcn_tpu.models import decoders as ED

        emb, rel, triples, params, state = self._inputs(rng)
        mod = refdec.ConvTransR(self.R, self.d)
        _copy_convtrans_weights(mod, params, state)
        mod.eval()
        with torch.no_grad():
            ref = mod(t(emb), t(rel), torch.from_numpy(triples), mode="test")
        ours, _ = ED.convtransr_score(
            params, state, jnp.asarray(emb), jnp.asarray(rel),
            jnp.asarray(triples), train=False)
        assert_close(ours, ref, rtol=1e-4, atol=1e-4)

    def test_hyperbolic_convtranse(self, rng):
        emb_ball = TOps.exp_map_zero(
            t(rng.normal(size=(self.N, self.d)).astype(np.float32) * 0.4), C).numpy()
        rel = rng.normal(size=(2 * self.R, self.d)).astype(np.float32)
        triples = np.stack([
            rng.integers(0, self.N, self.B),
            rng.integers(0, 2 * self.R, self.B),
            rng.integers(0, self.N, self.B),
        ], axis=1).astype(np.int64)
        params, state = D.init_hyperbolic_convtranse(
            jax.random.PRNGKey(4), self.N, self.d)
        params, state = _randomize_bn_stats(rng, params, state)
        params["b"] = jnp.asarray(rng.normal(size=self.N).astype(np.float32) * 0.1)
        mod = RD.HyperbolicConvTransE(self.N, self.d, c=C)
        _copy_convtrans_weights(mod, params, state)
        with torch.no_grad():
            mod.b.copy_(t(params["b"]))
        mod.eval()
        with torch.no_grad():
            ref = mod(t(emb_ball), t(rel), torch.from_numpy(triples), mode="test")
        ours, _ = D.hyperbolic_convtranse_score(
            params, state, jnp.asarray(emb_ball), jnp.asarray(rel),
            jnp.asarray(triples), C, train=False)
        assert_close(ours, ref, rtol=1e-4, atol=1e-4)


# ------------------------------------------- MuRP / RotH / AttH entity heads
def _set(param, arr):
    with torch.no_grad():
        param.copy_(t(arr))


def _rand_params(rng, params, keys, scale=0.3):
    out = dict(params)
    for k in keys:
        out[k] = jnp.asarray(rng.normal(size=params[k].shape).astype(np.float32) * scale)
    return out


class TestDistanceDecoders:
    """MuRP / RotH / AttH (+Rel) vs ref:hyperbolic_decoder.py:647-1679,
    all optional flags on (entity Euclidean bias + relation-specific
    curvature), eval mode, weight-copied."""

    N, R, d, B = 40, 6, 16, 10  # R base relations; heads see 2R total

    def _inputs(self, rng):
        ent = TOps.exp_map_zero(
            t(rng.normal(size=(self.N, self.d)).astype(np.float32) * 0.4), C).numpy()
        rel = rng.normal(size=(2 * self.R, self.d)).astype(np.float32) * 0.5
        triples = np.stack([
            rng.integers(0, self.N, self.B),
            rng.integers(0, 2 * self.R, self.B),
            rng.integers(0, self.N, self.B),
        ], axis=1).astype(np.int64)
        return ent, rel, triples

    def _check(self, ours_score, ours_loss, mod, ent, rel, triples):
        mod.eval()
        with torch.no_grad():
            ref_s = mod(t(ent), t(rel), torch.from_numpy(triples), mode="test")
            ref_l = mod.loss(t(ent), t(rel), torch.from_numpy(triples))
        np.testing.assert_allclose(np.asarray(ours_score), ref_s.numpy(),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(float(ours_loss), float(ref_l), rtol=1e-3)

    def test_murp(self, rng):
        ent, rel, triples = self._inputs(rng)
        params = D.init_murp(jax.random.PRNGKey(0), self.N, 2 * self.R, self.d,
                             c_init=C, use_entity_bias=True, use_rel_curvature=True)
        params = _rand_params(rng, params, ["rot_w", "rot_b", "trans_w", "trans_b"])
        params["entity_bias"] = jnp.asarray(rng.normal(size=self.N).astype(np.float32) * 0.1)
        mod = RD.HyperbolicMuRP(self.N, 2 * self.R, self.d, c=C,
                                use_entity_euclidean_bias=True,
                                use_relation_specific_curvature=True)
        _set(mod.rot_proj.weight, params["rot_w"]); _set(mod.rot_proj.bias, params["rot_b"])
        _set(mod.trans_proj.weight, params["trans_w"]); _set(mod.trans_proj.bias, params["trans_b"])
        _set(mod.entity_bias, params["entity_bias"])
        _set(mod.rel_curvature_raw, params["rel_curvature_raw"])
        _set(mod.score_scale_raw, params["score_scale_raw"])
        _set(mod.score_margin, params["score_margin"])
        jt = jnp.asarray(triples)
        ours_s = D.murp_score(params, jnp.asarray(ent), jnp.asarray(rel), jt, C, train=False)
        ours_l = D.murp_loss(params, jnp.asarray(ent), jnp.asarray(rel), jt, C, train=False)
        self._check(ours_s, ours_l, mod, ent, rel, triples)

    def test_roth(self, rng):
        ent, rel, triples = self._inputs(rng)
        params = D.init_roth(jax.random.PRNGKey(0), self.N, 2 * self.R, self.d,
                             c_init=C, use_entity_bias=True, use_rel_curvature=True)
        params = _rand_params(rng, params, [
            "rot_w", "rot_b", "trans_w", "trans_b",
            "reshape_w1", "reshape_b1", "reshape_w2", "reshape_b2"])
        params["entity_bias"] = jnp.asarray(rng.normal(size=self.N).astype(np.float32) * 0.1)
        mod = RD.HyperbolicRotH(self.N, 2 * self.R, self.d, c=C,
                                use_entity_euclidean_bias=True,
                                use_relation_specific_curvature=True)
        _set(mod.rot_proj.weight, params["rot_w"]); _set(mod.rot_proj.bias, params["rot_b"])
        _set(mod.trans_proj.weight, params["trans_w"]); _set(mod.trans_proj.bias, params["trans_b"])
        _set(mod.reshape_fc1.weight, params["reshape_w1"]); _set(mod.reshape_fc1.bias, params["reshape_b1"])
        _set(mod.reshape_fc2.weight, params["reshape_w2"]); _set(mod.reshape_fc2.bias, params["reshape_b2"])
        _set(mod.entity_bias, params["entity_bias"])
        _set(mod.rel_curvature_raw, params["rel_curvature_raw"])
        _set(mod.score_scale_raw, params["score_scale_raw"])
        _set(mod.score_margin, params["score_margin"])
        jt = jnp.asarray(triples)
        ours_s = D.roth_score(params, jnp.asarray(ent), jnp.asarray(rel), jt, C, train=False)
        ours_l = D.roth_loss(params, jnp.asarray(ent), jnp.asarray(rel), jt, C, train=False)
        self._check(ours_s, ours_l, mod, ent, rel, triples)

    def test_atth(self, rng):
        ent, rel, triples = self._inputs(rng)
        params = D.init_atth(jax.random.PRNGKey(0), self.N, 2 * self.R, self.d,
                             c_init=C, use_entity_bias=True, use_rel_curvature=True)
        params = _rand_params(rng, params, [
            "rot_w", "rot_b", "ref_w", "ref_b", "trans_w", "trans_b",
            "attn_w", "attn_b"])
        params["entity_bias"] = jnp.asarray(rng.normal(size=self.N).astype(np.float32) * 0.1)
        mod = RD.HyperbolicAttH(self.N, 2 * self.R, self.d, c=C,
                                use_entity_euclidean_bias=True,
                                use_relation_specific_curvature=True)
        _set(mod.rot_proj.weight, params["rot_w"]); _set(mod.rot_proj.bias, params["rot_b"])
        _set(mod.ref_proj.weight, params["ref_w"]); _set(mod.ref_proj.bias, params["ref_b"])
        _set(mod.trans_proj.weight, params["trans_w"]); _set(mod.trans_proj.bias, params["trans_b"])
        _set(mod.attn_proj.weight, params["attn_w"]); _set(mod.attn_proj.bias, params["attn_b"])
        _set(mod.entity_bias, params["entity_bias"])
        _set(mod.rel_curvature_raw, params["rel_curvature_raw"])
        _set(mod.score_scale_raw, params["score_scale_raw"])
        _set(mod.score_margin, params["score_margin"])
        jt = jnp.asarray(triples)
        ours_s = D.atth_score(params, jnp.asarray(ent), jnp.asarray(rel), jt, C, train=False)
        ours_l = D.atth_loss(params, jnp.asarray(ent), jnp.asarray(rel), jt, C, train=False)
        self._check(ours_s, ours_l, mod, ent, rel, triples)

    def test_murp_rel(self, rng):
        ent, rel, triples = self._inputs(rng)
        params = D.init_murp_rel(jax.random.PRNGKey(0), self.R, self.d)
        params = _rand_params(rng, params, ["w_s", "w_o"])
        params["rel_bias"] = jnp.asarray(rng.normal(size=2 * self.R).astype(np.float32) * 0.1)
        mod = RD.HyperbolicMuRPRel(self.R, self.d, c=C)
        _set(mod.W_s, params["w_s"]); _set(mod.W_o, params["w_o"])
        _set(mod.rel_bias, params["rel_bias"])
        jt = jnp.asarray(triples)
        ours_s = D.murp_rel_score(params, jnp.asarray(ent), jnp.asarray(rel), jt, C, train=False)
        ours_l = D.murp_rel_loss(params, jnp.asarray(ent), jnp.asarray(rel), jt, C, train=False)
        self._check(ours_s, ours_l, mod, ent, rel, triples)

    def test_roth_rel(self, rng):
        ent, rel, triples = self._inputs(rng)
        params = D.init_roth_rel(jax.random.PRNGKey(0), self.R, self.d)
        params = _rand_params(rng, params, [
            "global_rot", "reshape_w1", "reshape_b1", "reshape_w2", "reshape_b2"])
        params["rel_bias"] = jnp.asarray(rng.normal(size=2 * self.R).astype(np.float32) * 0.1)
        mod = RD.HyperbolicRotHRel(self.R, self.d, c=C)
        _set(mod.global_rot, params["global_rot"])
        _set(mod.reshape_fc1.weight, params["reshape_w1"]); _set(mod.reshape_fc1.bias, params["reshape_b1"])
        _set(mod.reshape_fc2.weight, params["reshape_w2"]); _set(mod.reshape_fc2.bias, params["reshape_b2"])
        _set(mod.rel_bias, params["rel_bias"])
        _set(mod.score_scale_raw, params["score_scale_raw"])
        _set(mod.score_margin, params["score_margin"])
        jt = jnp.asarray(triples)
        ours_s = D.roth_rel_score(params, jnp.asarray(ent), jnp.asarray(rel), jt, C, train=False)
        ours_l = D.roth_rel_loss(params, jnp.asarray(ent), jnp.asarray(rel), jt, C, train=False)
        self._check(ours_s, ours_l, mod, ent, rel, triples)

    def test_atth_rel(self, rng):
        ent, rel, triples = self._inputs(rng)
        params = D.init_atth_rel(jax.random.PRNGKey(0), self.R, self.d)
        params = _rand_params(rng, params, ["global_rot", "global_ref", "attn_weight"])
        params["rel_bias"] = jnp.asarray(rng.normal(size=2 * self.R).astype(np.float32) * 0.1)
        mod = RD.HyperbolicAttHRel(self.R, self.d, c=C)
        _set(mod.global_rot, params["global_rot"])
        _set(mod.global_ref, params["global_ref"])
        _set(mod.attn_weight, params["attn_weight"])
        _set(mod.rel_bias, params["rel_bias"])
        _set(mod.score_scale_raw, params["score_scale_raw"])
        _set(mod.score_margin, params["score_margin"])
        jt = jnp.asarray(triples)
        ours_s = D.atth_rel_score(params, jnp.asarray(ent), jnp.asarray(rel), jt, C, train=False)
        ours_l = D.atth_rel_loss(params, jnp.asarray(ent), jnp.asarray(rel), jt, C, train=False)
        self._check(ours_s, ours_l, mod, ent, rel, triples)


# ----------------------------------------------- GRU / EST / radius evolution
from types import SimpleNamespace  # noqa: E402

from hyperbolic_src import est_components as RE  # noqa: E402
from hyperbolic_src import hyperbolic_gru as RG  # noqa: E402

from regcn_tpu.hyperbolic import est as E  # noqa: E402
from regcn_tpu.hyperbolic import gru as G  # noqa: E402


class TestHyperbolicGRU:
    """vs ref:hyperbolic_src/hyperbolic_gru.py:20-94."""

    def test_cell(self, rng):
        d = 16
        params = G.init_hyperbolic_gru_cell(jax.random.PRNGKey(2), d, d)
        mod = RG.HyperbolicGRUCell(d, d, c=C)
        _set(mod.gru_cell.weight_ih, params["w_ih"])
        _set(mod.gru_cell.weight_hh, params["w_hh"])
        _set(mod.gru_cell.bias_ih, params["b_ih"])
        _set(mod.gru_cell.bias_hh, params["b_hh"])
        x = TOps.exp_map_zero(t(rng.normal(size=(8, d)).astype(np.float32) * 0.4), C).numpy()
        h = TOps.exp_map_zero(t(rng.normal(size=(8, d)).astype(np.float32) * 0.4), C).numpy()
        with torch.no_grad():
            ref = mod(t(x), t(h))
        ours = G.hyperbolic_gru_cell(params, jnp.asarray(x), jnp.asarray(h), C)
        assert_close(ours, ref, rtol=1e-4, atol=1e-5)


class TestESTComponents:
    """vs ref:hyperbolic_src/est_components.py (H-PES / H-TDP / QCHHE / TANS)."""

    d = 16

    def _est_cfg(self):
        return SimpleNamespace(h_dim=self.d, est_encoder="gru")

    def test_hpes_inject_and_update(self, rng):
        N, B = 30, 12
        params = E.init_est_params(jax.random.PRNGKey(1), self._est_cfg())
        mod = RE.PersistentEntityState(N, self.d, alpha=0.2)
        slow = rng.normal(size=(N, self.d)).astype(np.float32) * 0.3
        fast = rng.normal(size=(N, self.d)).astype(np.float32) * 0.3
        with torch.no_grad():
            mod.entity_state_slow.copy_(t(slow))
            mod.entity_state_fast.copy_(t(fast))
            mod.slow_threshold.copy_(t(np.float32(0.5)))
            mod.slow_scale.copy_(t(np.float32(2.0)))
        h = TOps.exp_map_zero(t(rng.normal(size=(N, self.d)).astype(np.float32) * 0.4), C).numpy()
        with torch.no_grad():
            ref_inj = mod.inject_slow_state(t(h), C)
        ours_inj = E.inject_slow_state(params, jnp.asarray(h), jnp.asarray(slow), C)
        assert_close(ours_inj, ref_inj, rtol=1e-4, atol=1e-5)

        # writeback on unique ids (the reference indexes rows uniquely)
        ids = rng.permutation(N)[:B].astype(np.int64)
        ctx = rng.normal(size=(B, self.d)).astype(np.float32) * 0.5
        with torch.no_grad():
            mod.update_states(torch.from_numpy(ids), t(ctx))
        state = E.ESTState(fast=jnp.asarray(fast), slow=jnp.asarray(slow))
        new_state = E.update_states(params, state, jnp.asarray(ids),
                                    jnp.ones(B, jnp.float32), jnp.asarray(ctx),
                                    alpha=0.2)
        assert_close(new_state.fast, mod.entity_state_fast, rtol=1e-5, atol=1e-6)
        assert_close(new_state.slow, mod.entity_state_slow, rtol=1e-5, atol=1e-6)

    def test_time_delta_projection(self, rng):
        params = E.init_est_params(jax.random.PRNGKey(1), self._est_cfg())
        mod = RE.TimeDeltaProjection(self.d, curvature=C)
        _set(mod.proj[0].weight, params["tdp_w1"]); _set(mod.proj[0].bias, params["tdp_b1"])
        _set(mod.proj[2].weight, params["tdp_w2"]); _set(mod.proj[2].bias, params["tdp_b2"])
        deltas = rng.integers(0, 100, size=(6, 8)).astype(np.float32)
        with torch.no_grad():
            ref = mod(t(deltas))
        ours = E.time_delta_projection(params, jnp.asarray(deltas), C)
        assert_close(ours, ref, rtol=1e-4, atol=1e-5)

    def test_history_encoder_gru(self, rng):
        B, K = 6, 8
        cfg = self._est_cfg()
        params = E.init_est_params(jax.random.PRNGKey(1), cfg)
        mod = RE.HyperbolicHistoryEncoder(self.d, encoder_type="gru", curvature=C)
        _set(mod.hist_proj.weight, params["hist_proj_w"]); _set(mod.hist_proj.bias, params["hist_proj_b"])
        _set(mod.cond_in.weight, params["cond_in_w"]); _set(mod.cond_in.bias, params["cond_in_b"])
        _set(mod.cond_gate.weight, params["cond_gate_w"]); _set(mod.cond_gate.bias, params["cond_gate_b"])
        _set(mod.attn_proj.weight, params["attn_proj_w"]); _set(mod.attn_proj.bias, params["attn_proj_b"])
        _set(mod.out_norm.weight, params["out_norm_scale"]); _set(mod.out_norm.bias, params["out_norm_bias"])
        _set(mod.temporal_encoder.weight_ih_l0, params["qchhe_gru"]["w_ih"])
        _set(mod.temporal_encoder.weight_hh_l0, params["qchhe_gru"]["w_hh"])
        _set(mod.temporal_encoder.bias_ih_l0, params["qchhe_gru"]["b_ih"])
        _set(mod.temporal_encoder.bias_hh_l0, params["qchhe_gru"]["b_hh"])
        mod.eval()

        def ball(shape, scale=0.4):
            return TOps.exp_map_zero(
                t(rng.normal(size=shape).astype(np.float32) * scale), C).numpy()

        nb, rl, tm = ball((B, K, self.d)), ball((B, K, self.d)), ball((B, K, self.d))
        q = rng.normal(size=(B, self.d)).astype(np.float32) * 0.4
        mask = (rng.uniform(size=(B, K)) > 0.3).astype(np.float32)
        mask[0] = 1.0  # at least one fully-valid row
        with torch.no_grad():
            ref = mod(t(nb), t(rl), t(tm), t(q), t(mask))
        ours = E.history_encoder(params, cfg, jnp.asarray(nb), jnp.asarray(rl),
                                 jnp.asarray(tm), jnp.asarray(q),
                                 jnp.asarray(mask), C)
        assert_close(ours, ref, rtol=1e-3, atol=1e-4)

    def test_history_encoder_transformer(self, rng):
        """QCHHE transformer backbone vs ref:est_components.py:378-391,
        :439-450 (post-LN TransformerEncoder, 4 heads, 4d FF, key-padding
        mask True=ignore). Round-3 verdict weak item #4: this path had
        builder-authored tests only."""
        B, K = 6, 8
        cfg = SimpleNamespace(h_dim=self.d, est_encoder="transformer")
        params = E.init_est_params(jax.random.PRNGKey(1), cfg)
        mod = RE.HyperbolicHistoryEncoder(self.d, encoder_type="transformer",
                                          curvature=C)
        _set(mod.hist_proj.weight, params["hist_proj_w"]); _set(mod.hist_proj.bias, params["hist_proj_b"])
        _set(mod.cond_in.weight, params["cond_in_w"]); _set(mod.cond_in.bias, params["cond_in_b"])
        _set(mod.cond_gate.weight, params["cond_gate_w"]); _set(mod.cond_gate.bias, params["cond_gate_b"])
        _set(mod.attn_proj.weight, params["attn_proj_w"]); _set(mod.attn_proj.bias, params["attn_proj_b"])
        _set(mod.out_norm.weight, params["out_norm_scale"]); _set(mod.out_norm.bias, params["out_norm_bias"])
        for i, lp in enumerate(params["qchhe_transformer"]["layers"]):
            layer = mod.temporal_encoder.layers[i]
            _set(layer.self_attn.in_proj_weight, lp["qkv_w"])
            _set(layer.self_attn.in_proj_bias, lp["qkv_b"])
            _set(layer.self_attn.out_proj.weight, lp["out_w"])
            _set(layer.self_attn.out_proj.bias, lp["out_b"])
            _set(layer.linear1.weight, lp["ff1_w"]); _set(layer.linear1.bias, lp["ff1_b"])
            _set(layer.linear2.weight, lp["ff2_w"]); _set(layer.linear2.bias, lp["ff2_b"])
            _set(layer.norm1.weight, lp["ln1_scale"]); _set(layer.norm1.bias, lp["ln1_bias"])
            _set(layer.norm2.weight, lp["ln2_scale"]); _set(layer.norm2.bias, lp["ln2_bias"])
        mod.eval()  # dropout(0.1) off — deterministic golden

        def ball(shape, scale=0.4):
            return TOps.exp_map_zero(
                t(rng.normal(size=shape).astype(np.float32) * scale), C).numpy()

        nb, rl, tm = ball((B, K, self.d)), ball((B, K, self.d)), ball((B, K, self.d))
        q = rng.normal(size=(B, self.d)).astype(np.float32) * 0.4
        mask = (rng.uniform(size=(B, K)) > 0.3).astype(np.float32)
        mask[:, 0] = 1.0  # torch NaNs on fully-padded rows
        with torch.no_grad():
            ref = mod(t(nb), t(rl), t(tm), t(q), t(mask))
        ours = E.history_encoder(params, cfg, jnp.asarray(nb), jnp.asarray(rl),
                                 jnp.asarray(tm), jnp.asarray(q),
                                 jnp.asarray(mask), C)
        assert_close(ours, ref, rtol=1e-3, atol=1e-4)

    def test_tans_filter(self, rng):
        B, N = 10, 50
        snaps = [np.stack([rng.integers(0, N, 60), rng.integers(0, 4, 60),
                           rng.integers(0, N, 60)], axis=1) for _ in range(3)]
        ours_dict = E.build_true_tails_dict(snaps, num_rels=4)
        ref_dict = RE.build_true_tails_dict(
            [torch.from_numpy(s) for s in snaps], num_rels=4)
        assert set(ours_dict) == set(ref_dict)
        for k in ours_dict:
            assert set(ours_dict[k].tolist()) == set(ref_dict[k])

        triples = np.stack([rng.integers(0, N, B), rng.integers(0, 8, B),
                            rng.integers(0, N, B)], axis=1).astype(np.int64)
        scores = rng.normal(size=(B, N)).astype(np.float32)
        ref_scores = RE.apply_time_aware_filter(
            t(scores).clone(), torch.from_numpy(triples[:, 0]),
            torch.from_numpy(triples[:, 1]), torch.from_numpy(triples[:, 2]),
            ref_dict)
        rows, cols = E.tans_mask_coo(triples, np.ones(B), ours_dict, pad_bucket=64)
        ours_scores = jnp.asarray(scores).at[rows, cols].set(-1e9, mode="drop")
        assert_close(ours_scores, ref_scores, rtol=1e-6, atol=1e-6)


class TestTemporalRadiusEvolution:
    """vs ref:hyperbolic_ops.py:364-439."""

    def test_forward(self, rng):
        from hyperbolic_src.hyperbolic_ops import TemporalRadiusEvolution
        from regcn_tpu.hyperbolic import model as M

        d, N = 16, 24
        cfg = SimpleNamespace(radius_epsilon=0.1, radius_anchor_beta=0.7)
        w = rng.normal(size=(1, d)).astype(np.float32) * 0.1
        b = rng.normal(size=(1,)).astype(np.float32) * 0.01
        params = {"radius_mlp_w": jnp.asarray(w), "radius_mlp_b": jnp.asarray(b)}
        mod = TemporalRadiusEvolution(d, c=C, epsilon=0.1, anchor_beta=0.7)
        _set(mod.radius_mlp.weight, w); _set(mod.radius_mlp.bias, b)
        x = TOps.exp_map_zero(t(rng.normal(size=(N, d)).astype(np.float32) * 0.4), C).numpy()
        static_r = rng.uniform(0.5, 3.0, size=N).astype(np.float32)
        with torch.no_grad():
            ref = mod(t(x), t(static_r))
        ours = M._radius_evolution(params, cfg, jnp.asarray(x),
                                   jnp.asarray(static_r), C)
        assert_close(ours, ref, rtol=1e-4, atol=1e-5)
