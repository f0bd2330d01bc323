"""Train state and checkpointing.

The reference checkpoints only ``state_dict`` + epoch on best validation
MRR with no optimizer state and no mid-epoch resume
(ref:src/main.py:266-279; SURVEY.md §5). Here the full train state
(params, optimizer state, BatchNorm stats, PRNG key, step) is an
immutable pytree checkpointed with orbax, so training is resumable.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from regcn_tpu.config import ModelConfig, TrainConfig
from regcn_tpu.models import recurrent


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Dict[str, Any]
    opt_state: Any
    model_state: recurrent.ModelState
    rng: jax.Array
    step: jax.Array  # scalar int32


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    """torch-parity optimizer: clip-by-global-norm, then Adam with coupled
    (pre-moment) L2 weight decay — matching ``torch.optim.Adam(weight_decay=
    1e-5)`` + ``clip_grad_norm_`` (ref:src/main.py:194,244)."""
    return optax.chain(
        optax.clip_by_global_norm(tc.grad_norm),
        optax.add_decayed_weights(tc.weight_decay),
        optax.adam(tc.lr),
    )


def create_train_state(
    rng: jax.Array, cfg: ModelConfig, tc: TrainConfig
) -> TrainState:
    k_init, k_train = jax.random.split(rng)
    params, model_state = recurrent.init_params(k_init, cfg)
    opt = make_optimizer(tc)
    opt_state = opt.init(params)
    return TrainState(
        params=params,
        opt_state=opt_state,
        model_state=model_state,
        rng=k_train,
        step=jnp.zeros((), jnp.int32),
    )


_ASYNC_CKPTR = None
# meta.json promotions deferred until the matching async state save has
# committed: list of (tmp_path, final_path)
_PENDING_META = []


def _async_ckptr():
    """Process-wide async checkpointer: device->host copy is synchronous
    (safe with donated states), disk writes happen in the background —
    per-epoch checkpointing costs ~0 instead of a blocking orbax save."""
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp

        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def _promote_pending_meta():
    """Atomically rename meta.json.tmp -> meta.json for every save whose
    state commit has finished (callers invoke this only after
    ``wait_until_finished``)."""
    while _PENDING_META:
        tmp, final = _PENDING_META.pop(0)
        if os.path.exists(tmp):
            os.replace(tmp, final)


def wait_for_checkpoints():
    """Block until every in-flight async save is committed (and its
    meta.json promoted)."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()
    _promote_pending_meta()


def save_checkpoint(path: str, state: TrainState, meta: Dict[str, Any] | None = None):
    """Async checkpoint with crash-consistent metadata.

    meta.json is promoted (atomic rename from meta.json.tmp) only AFTER
    the orbax state save it describes has committed, so a crash during
    the in-flight window can never leave a meta.json that points at a
    missing or torn state dir. Orbax itself commits via
    write-to-tmp-then-rename, so ``<path>/state`` existing implies a
    complete state; the worst crash outcome is a stale meta.json one
    epoch behind the committed state (resume then conservatively re-runs
    one epoch). ``has_resumable_checkpoint``/``restore_for_resume``
    additionally verify the state dir exists, falling back to the
    best-root checkpoint otherwise.
    """
    import json

    path = os.path.abspath(path)
    ckptr = _async_ckptr()
    # one in-flight save at a time keeps the commit order = call order;
    # the previous save is now committed, so its meta can be promoted
    ckptr.wait_until_finished()
    _promote_pending_meta()
    ckptr.save(os.path.join(path, "state"), state, force=True)
    meta_final = os.path.join(path, "meta.json")
    meta_tmp = meta_final + ".tmp"
    with open(meta_tmp, "w") as f:
        json.dump(meta or {}, f)
    _PENDING_META.append((meta_tmp, meta_final))


def restore_checkpoint(path: str, template: TrainState):
    import json

    import orbax.checkpoint as ocp

    wait_for_checkpoints()
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    state = ckptr.restore(os.path.join(path, "state"), item=template)
    meta = {}
    meta_path = os.path.join(path, "meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def save_last_checkpoint(path: str, state, epoch: int, best_mrr: float,
                         best_epoch: int):
    """Persist the state at the LAST completed epoch under ``<path>/last``.

    The root of ``path`` holds the best-on-valid checkpoint (saved only on
    improvement); resuming from it alone would restart at best_epoch+1 and
    re-run (and re-randomize) every post-best epoch, resetting the early-
    stopping patience counter. The ``last`` sidecar makes resume exact."""
    save_checkpoint(os.path.join(path, "last"), state,
                    {"epoch": int(epoch), "best_mrr": float(best_mrr),
                     "best_epoch": int(best_epoch)})


def restore_for_resume(path: str, template):
    """Restore for ``fit(resume=True)``.

    Returns ``(state, start_epoch, best_mrr, best_epoch)``, preferring the
    per-epoch ``<path>/last`` checkpoint; falls back to the best-only root
    layout (older checkpoints), where last==best by construction."""
    last = os.path.join(path, "last")
    if _complete_checkpoint(last):
        state, meta = restore_checkpoint(last, template)
        return (state, int(meta["epoch"]) + 1,
                float(meta.get("best_mrr", 0.0)),
                int(meta.get("best_epoch", -1)))
    state, meta = restore_checkpoint(path, template)
    ep = int(meta.get("epoch", -1))
    return state, ep + 1, float(meta.get("mrr", 0.0)), ep


def _complete_checkpoint(path: str) -> bool:
    """meta.json AND a committed orbax state dir (orbax renames its tmp
    dir into place only on commit, so existence implies completeness)."""
    return (os.path.exists(os.path.join(path, "meta.json"))
            and os.path.isdir(os.path.join(path, "state")))


def has_resumable_checkpoint(path) -> bool:
    return bool(path) and (
        _complete_checkpoint(path)
        or _complete_checkpoint(os.path.join(path, "last")))


def copy_state(state):
    """Deep device copy of a train-state pytree.

    The train/epoch steps donate their input state
    (``donate_argnums=(0,)``), so stashing a reference to a state that
    will be trained further (e.g. the best-on-valid state) keeps aliases
    to buffers the NEXT step destroys — using them later fails with a
    deleted-array / backend error. Stash a copy instead.
    """
    return jax.tree.map(
        lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, state
    )
