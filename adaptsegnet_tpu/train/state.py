"""Train-state pytrees (flax.struct dataclasses).

Unlike the reference — which snapshots only model weights
(train_gta2cityscapes_multi.py:311: optimizer/LR/RNG state is lost on
restart, SURVEY.md §5.3-5.4) — the full state here (params, both optimizer
states, warper stats, step) is one pytree, checkpointable with orbax for
exact resume.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from flax import struct
import optax


@struct.dataclass
class GeneratorState:
    params: Any
    batch_stats: Any
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(
            params=params, batch_stats=batch_stats,
            opt_state=tx.init(params), tx=tx,
        )


@struct.dataclass
class DiscriminatorState:
    params: Any
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )

    @classmethod
    def create(cls, params, tx):
        return cls(params=params, opt_state=tx.init(params), tx=tx)


@struct.dataclass
class WarperState:
    """Warper params are NOT optimized (the reference never adds WarpModel
    parameters to any optimizer — train_gta2cityscapes_multi.py:244 only
    passes model.optim_parameters — so the warper stays at its random init);
    its live stats (BN running stats for norm='Batch', spectral-norm u
    vectors for norm='Spectral') do update during training. `stats` maps
    collection name -> tree (may be empty for norm='Instance')."""

    params: Any
    stats: Any


@struct.dataclass
class TrainState:
    step: jax.Array
    generator: GeneratorState
    d1: Optional[DiscriminatorState] = None
    d2: Optional[DiscriminatorState] = None
    warper: Optional[WarperState] = None
