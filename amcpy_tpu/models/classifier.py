"""Flax MLP classifier for AMC.

Same architecture family as the reference model
(``/root/reference/src/amcpy/nn_model.py:28-75``): Dense->BatchNorm->act->
Dropout blocks over configurable hidden sizes, final Dense to n_classes.
Two deliberate departures, both documented parity decisions:

* **logits out** — the reference stacks ``nn.Softmax`` *and* trains with
  ``CrossEntropyLoss`` (which applies log-softmax again; SURVEY.md
  section 3 defect 3). Training here uses
  ``optax.softmax_cross_entropy_with_integer_labels`` on logits.
* BatchNorm/Dropout semantics follow the torch defaults the reference used
  (momentum 0.1 torch == 0.9 flax, eps 1e-5), so learned statistics are
  comparable.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["AMCClassifier"]

_ACTIVATIONS: dict[str, Callable] = {
    "relu": nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": nn.sigmoid,
    "gelu": nn.gelu,
}


class AMCClassifier(nn.Module):
    """MLP over per-frame feature vectors. Returns logits."""

    n_classes: int
    hidden_sizes: Sequence[int] = (26, 29, 30)
    dropout: float = 0.4
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        act = _ACTIVATIONS.get(self.activation, nn.relu)
        for h in self.hidden_sizes:
            x = nn.Dense(h)(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5
            )(x)
            x = act(x)
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        return nn.Dense(self.n_classes)(x)
