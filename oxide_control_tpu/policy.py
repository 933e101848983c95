"""Policies over observations: the consumer side of the environment API.

The reference leaves the RL loop to the caller (`/root/reference/src/lib.rs`
stops at `Environment::step`); this module provides the minimum the TPU
engine needs to close that loop *on device*: a tanh-MLP policy whose
forward pass runs either as plain JAX (general pipeline, training code) or
inside the Pallas rollout megakernel (ops/megakernel.py), where the layer
matmuls ride the MXU against the whole (n_obs, TILE) observation tile.

Params are ordinary pytrees (list of (W, b) pairs), so any optimizer
(optax) trains them; the kernel takes them as runtime inputs — updating the
policy between rollout calls does NOT recompile the kernel.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MLPPolicy:
    """Deterministic tanh MLP: obs -> tanh(W_n ... tanh(W_1 obs + b_1) + b_n).

    The final tanh bounds actions in [-1, 1] (suite actuators are unit
    ctrlrange; the step clips to ctrlrange regardless).  ``explore_sigma``
    adds N(0, sigma^2) exploration noise to the ctrl *inside the kernel*
    (hardware PRNG; Box-Muller), matching ``apply(..., noise_key=...)`` on
    the general path in distribution.
    """

    hidden: Sequence[int] = (64, 64)
    explore_sigma: float = 0.0

    def layer_sizes(self, n_obs: int, nu: int) -> list[tuple[int, int]]:
        dims = [n_obs, *self.hidden, nu]
        return [(dims[i + 1], dims[i]) for i in range(len(dims) - 1)]

    def init_params(self, rng: jax.Array, n_obs: int, nu: int,
                    dtype=jnp.float32):
        """Xavier-uniform weights, zero biases.  b is (out, 1) so the kernel
        broadcast over the env tile needs no reshape."""
        params = []
        for (out, inp) in self.layer_sizes(n_obs, nu):
            rng, k = jax.random.split(rng)
            lim = math.sqrt(6.0 / (inp + out))
            w = jax.random.uniform(k, (out, inp), minval=-lim, maxval=lim,
                                   dtype=dtype)
            params.append((w, jnp.zeros((out, 1), dtype=dtype)))
        return params

    def apply(self, params, obs, noise_key: jax.Array | None = None):
        """General-path forward: obs (..., n_obs) -> ctrl (..., nu).

        Bit-identical to the kernel's math (same op order: dot, +b, tanh),
        so kernel-vs-general parity tests compare exactly.
        """
        x = obs
        for (w, b) in params[:-1]:
            x = jnp.tanh(x @ w.T + b[:, 0])
        w, b = params[-1]
        ctrl = jnp.tanh(x @ w.T + b[:, 0])
        if self.explore_sigma > 0.0 and noise_key is not None:
            ctrl = ctrl + self.explore_sigma * jax.random.normal(
                noise_key, ctrl.shape, dtype=ctrl.dtype
            )
        return ctrl
