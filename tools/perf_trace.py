"""Per-op device-time breakdown of the headline epoch from a profiler trace.

Captures a ``jax.profiler`` trace of one fused training epoch (headline
hyperbolic benchmark config) and aggregates device-plane event durations
by op name, printing the top-N. Uses the xplane protobuf bundled with
``tensorboard_plugin_profile`` — no TensorBoard UI needed.

    PYTHONPATH=/root/repo:$PYTHONPATH python tools/perf_trace.py [top_n]
"""

from __future__ import annotations

import collections
import glob
import os
import sys
import tempfile

import jax


def _trainer(config: str):
    """Build the trainer for a named BASELINE configuration.

    "headline" = config 3-ish flagship (hyperbolic uvrgcn+convtranse,
    ICEWS14s shape, bf16); "static18" = config 2 (RE-GCN + static word
    graph, ICEWS18 shape); "est_gdelt" = config 5 (EST stack, GDELT
    shape). Shapes/configs match tools/bench_configs.py rows."""
    from regcn_tpu.config import TrainConfig
    from regcn_tpu.data import load_data
    from regcn_tpu.data.synthetic import generate

    if config == "static18":
        from regcn_tpu.config import ExperimentConfig, ModelConfig
        from regcn_tpu.train.loop import Trainer

        data = load_data("synthetic-icews18", load_static=True)
        cfg = ExperimentConfig(
            model=ModelConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                              h_dim=200, n_layers=2, use_static=True,
                              num_static_rels=data.num_static_rels,
                              num_words=data.num_words),
            train=TrainConfig(train_history_len=3, test_history_len=3))
        t = Trainer(cfg, data)
        # the euclidean Trainer has no init_state method; adapt. Use the
        # fused-epoch path — it is what fit() and the benchmark rows run
        from regcn_tpu.train.state import create_train_state

        t.init_state = lambda key: create_train_state(key, cfg.model, cfg.train)
        return t, lambda st, ep: t.run_epoch_fused(st, ep)

    from regcn_tpu.hyperbolic.model import HyperbolicConfig
    from regcn_tpu.hyperbolic.train import HyperbolicTrainer

    if config == "est_gdelt":
        data = generate("synthetic-gdelt", seed=123)
        cfg = HyperbolicConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                               h_dim=200, n_layers=2,
                               encoder="hyperbolic_uvrgcn",
                               decoder="hyperbolic_convtranse",
                               use_est=True, use_time_aware_negative=True)
    else:
        data = generate("synthetic-icews14s", seed=123)
        cfg = HyperbolicConfig(num_ents=data.num_nodes, num_rels=data.num_rels,
                               h_dim=200, n_layers=2,
                               encoder="hyperbolic_uvrgcn",
                               decoder="hyperbolic_convtranse",
                               compute_dtype="bfloat16")
    tc = TrainConfig(train_history_len=3, edge_bucket=128, rc_bucket=128,
                     triple_bucket=128)
    tr = HyperbolicTrainer(cfg, tc, data)
    return tr, lambda st, ep: tr.run_epoch(st, ep)


def capture_trace(trace_dir: str, config: str = "headline"):
    from regcn_tpu.utils.prng import use_fast_prng

    use_fast_prng()
    tr, run_epoch = _trainer(config)
    state = tr.init_state(jax.random.PRNGKey(0))
    state, _ = run_epoch(state, 0)  # compile + warmup outside the trace
    with jax.profiler.trace(trace_dir):
        state, losses = run_epoch(state, 1)
        jax.block_until_ready(losses)


def aggregate(trace_dir: str, top_n: int = 30):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    totals = collections.Counter()
    plane_totals = {}
    for path in paths:
        xspace = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xspace.ParseFromString(f.read())
        for plane in xspace.planes:
            # device planes hold the compiled-program op timeline; skip
            # host python/runtime planes
            if "TPU" not in plane.name and "GPU" not in plane.name \
                    and "/device:" not in plane.name:
                continue
            ev_names = {m.id: m.name for m in plane.event_metadata.values()}
            plane_ns = 0
            for line in plane.lines:
                for ev in line.events:
                    name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                    totals[name] += ev.duration_ps
                    plane_ns += ev.duration_ps
            plane_totals[plane.name] = plane_totals.get(plane.name, 0) + plane_ns
    if not totals:
        raise SystemExit("no device-plane events found (profiler may not "
                         "capture device traces through this backend)")
    grand = sum(totals.values())
    print(f"device planes: {list(plane_totals)}")
    print(f"total device-event time: {grand / 1e12:.4f} s "
          f"(sums overlapping lines)")
    print(f"{'op':60s} {'ms':>10s} {'%':>6s}")
    for name, ps in totals.most_common(top_n):
        print(f"{name[:60]:60s} {ps / 1e9:10.3f} {100 * ps / grand:6.2f}")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    config = "headline"
    for a in sys.argv[1:]:
        if a.startswith("--config="):
            config = a.split("=", 1)[1]
    top_n = int(args[0]) if args else 30
    trace_dir = tempfile.mkdtemp(prefix="regcn_trace_")
    capture_trace(trace_dir, config)
    aggregate(trace_dir, top_n)
    print(f"trace kept at {trace_dir}")


if __name__ == "__main__":
    main()
