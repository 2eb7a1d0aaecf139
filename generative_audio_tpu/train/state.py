"""Train state: params + optimizer + step (+ mutable batch stats for BN nets).

Reference training semantics being reproduced (SURVEY.md §2.9/§5.4):
  * Adam/AdamW with config args (nppc/auxil.py:257-330, trainers)
  * global-norm gradient clipping (10.0 enhancement trainer.py:352; 5.0
    restoration_trainer.py:135; 1.0 nppc_trainer.py:152)
  * step counting for the NPPC λ ramp.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

__all__ = ["TrainState", "create_train_state", "make_optimizer",
           "jit_init"]


def jit_init(init_fn):
    """jit a model.init for accelerator backends, keep it eager on CPU.

    Eager init over the TPU tunnel is minutes-slow (one roundtrip per
    primitive), so init MUST be jitted there; but XLA-compiling every init
    graph on CPU costs tens of seconds per trainer construction, which
    multiplies across the test suite. Dispatch on the backend once at
    trainer-construction time.
    """
    return jax.jit(init_fn) if jax.default_backend() != "cpu" else init_fn


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    batch_stats: Any = None
    # Optional EMA shadow of params (reference NetWrapper's ema,
    # nppc/auxil.py:370-378); None disables.
    ema_params: Any = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            # reference warmup (auxil.py:376): alpha = max(alpha0, 1/step),
            # i.e. decay = min(decay0, 1 - 1/step) — the EMA tracks a plain
            # running average until 1/step falls below the update weight
            step = (self.step + 1).astype(jnp.float32)
            d = jnp.minimum(self.ema_decay, 1.0 - 1.0 / step)
            new_ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, new_ema, new_params)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state,
            ema_params=new_ema,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats))


def make_optimizer(learning_rate: float = 1e-3, betas=(0.9, 0.999),
                   weight_decay: float = 0.0, clip_norm: Optional[float] = None,
                   optimizer: str = "Adam") -> optax.GradientTransformation:
    if optimizer.lower() == "adamw":
        tx = optax.adamw(learning_rate, b1=betas[0], b2=betas[1],
                         weight_decay=weight_decay)
    else:
        tx = optax.adam(learning_rate, b1=betas[0], b2=betas[1])
    if clip_norm is not None:
        tx = optax.chain(optax.clip_by_global_norm(clip_norm), tx)
    return tx


def create_train_state(params, tx: optax.GradientTransformation,
                       batch_stats=None, ema_decay: float = 0.0) -> TrainState:
    # a REAL copy, not an identity tree_map: ema leaves must be distinct
    # buffers from params or a donated train step would donate the same
    # buffer twice (params and its alias)
    ema = (jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params)
           if ema_decay > 0 else None)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), batch_stats=batch_stats,
                      ema_params=ema, ema_decay=ema_decay, tx=tx)
