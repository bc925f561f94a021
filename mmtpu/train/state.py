"""TrainState: params + batch_stats + optimizer state as one pytree.

The reference keeps mutable state on nn.Module/Optimizer objects; here the
entire training state is an immutable pytree threaded through pure jitted
steps (donated, so XLA updates buffers in place on device).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import optax
from flax import core, struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, *, grads, batch_stats=None, **kwargs) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=batch_stats if batch_stats is not None else self.batch_stats,
            opt_state=new_opt_state,
            **kwargs,
        )

    @classmethod
    def create(
        cls,
        *,
        apply_fn: Callable,
        params: Any,
        tx: optax.GradientTransformation,
        batch_stats: Optional[Any] = None,
    ) -> "TrainState":
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats if batch_stats is not None else core.freeze({}),
            opt_state=tx.init(params),
            tx=tx,
            apply_fn=apply_fn,
        )

    @property
    def variables(self) -> Dict[str, Any]:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v
