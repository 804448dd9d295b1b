"""Optimizer: torch-parity Adam + StepLR.

Reference: ``optim.Adam(model.parameters(), lr=0.001, weight_decay=1e-4)``
(pcs.py:217) and ``StepLR(step_size=20, gamma=0.5)`` stepped per epoch
(pcs.py:218, :349).

Parity details (SURVEY.md §7 item 5):
- torch Adam's ``weight_decay`` is COUPLED L2: ``g += wd * p`` happens
  before the moment updates — i.e. ``optax.add_decayed_weights`` placed
  BEFORE ``scale_by_adam`` in the chain, not AdamW's decoupled decay.
- decay applies to every parameter (conv kernels, biases, and BN
  scale/bias), exactly like ``model.parameters()``.
- the learning rate enters as a run-time scalar (the epoch schedule is host
  logic, mirroring ``scheduler.step()``), so LR changes never recompile.
"""

from __future__ import annotations

import jax
import optax


def make_optimizer(
    weight_decay: float = 1e-4,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Adam-with-L2 producing an UNSCALED update direction.

    The caller multiplies by ``-lr`` (see ``apply_updates_with_lr``); this
    keeps the StepLR schedule outside the compiled graph.
    """
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
    )


def apply_updates_with_lr(params, updates, lr):
    """params - lr * update (update is the Adam direction)."""
    return optax.apply_updates(
        params, jax.tree.map(lambda u: -lr * u, updates)
    )


def step_lr(base_lr: float, epoch: int, step_epochs: int = 20, gamma: float = 0.5) -> float:
    """torch StepLR: lr = base * gamma^(epoch // step_epochs)."""
    return float(base_lr * (gamma ** (epoch // step_epochs)))
