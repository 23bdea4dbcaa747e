"""Adversarial input perturbations (config 5, ``BASELINE.json:11``).

FGSM-style gradient-sign jitter on input point coordinates, used as
adversarial data augmentation: ``x_adv = x + eps * sign(dL/dx)`` (SURVEY.md
§2.5/§3.4). In JAX this is one extra ``jax.grad`` with respect to the
*input* inside the same jitted train step — no separate attack loop.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def fgsm_points(loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
                points: jnp.ndarray, epsilon: float) -> jnp.ndarray:
    """One-step FGSM on point coordinates.

    ``loss_fn`` maps ``points -> scalar loss`` (closing over params/labels).
    Returns the perturbed cloud; gradients do not flow back through the
    attack (the perturbation is treated as data, matching the reference's
    detached attack tensor).
    """
    grad = jax.grad(loss_fn)(points)
    x_adv = points + epsilon * jnp.sign(grad)
    return jax.lax.stop_gradient(x_adv)


def iterated_fgsm_points(loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
                         points: jnp.ndarray, epsilon: float, steps: int,
                         step_size: float | None = None) -> jnp.ndarray:
    """PGD-style iterated variant with an L-inf ball projection.

    Not present in the reference lineage as a separate trainer; provided
    as the natural generalization (``steps=1`` == FGSM). Uses
    ``lax.fori_loop`` so the attack stays inside one compiled program.
    """
    alpha = step_size if step_size is not None else epsilon / max(steps, 1)
    x0 = points

    def body(_, x):
        g = jax.grad(loss_fn)(x)
        x = x + alpha * jnp.sign(g)
        return x0 + jnp.clip(x - x0, -epsilon, epsilon)

    x_adv = jax.lax.fori_loop(0, steps, body, points)
    return jax.lax.stop_gradient(x_adv)
