"""Train-state bundles and optimizers.

The reference uses `torch.optim.Adam(weight_decay=...)` — classic *coupled*
L2 (gradient += wd * param), not AdamW (`train_nn_patch.py:147-152`). The
optax chain reproduces that: add_decayed_weights before scale_by_adam.
StepLR(step_size=10, gamma=0.8) for CRNN warmup (`train_crnn.py:133-135`)
and cosine annealing for the area trainer (`train_nn_area.py:157-161`) are
optax schedules driven by the epoch counter via inject_hyperparams.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class ModelState(struct.PyTreeNode):
    """Params + batch stats + optimizer state for one model."""
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "ModelState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )

    @classmethod
    def create(cls, variables, tx: optax.GradientTransformation) -> "ModelState":
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
        )

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def adam_l2(
    learning_rate: float | Callable,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """torch-Adam parity: coupled L2 weight decay, then Adam, then -lr."""
    return optax.inject_hyperparams(_adam_l2_inner)(learning_rate=learning_rate,
                                                    weight_decay=weight_decay)


def _adam_l2_inner(learning_rate, weight_decay):
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(learning_rate),
    )


def set_learning_rate(state: ModelState, lr: float) -> ModelState:
    """Update the injected learning-rate hyperparameter (host-side schedule
    step, mirroring torch schedulers stepping per epoch)."""
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state)


def step_lr(base_lr: float, epoch: int, step_size: int = 10, gamma: float = 0.8) -> float:
    """torch StepLR parity."""
    return base_lr * (gamma ** (epoch // step_size))


def cosine_lr(base_lr: float, epoch: int, t_max: int) -> float:
    """torch CosineAnnealingLR parity (eta_min=0)."""
    import math
    return base_lr * (1 + math.cos(math.pi * epoch / t_max)) / 2
