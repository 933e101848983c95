#!/usr/bin/env python
"""PPO on the megakernel's collected trajectories (VERDICT r4 next #4).

The kernel rollout (`FastRollout(policy=..., collect=True)`) returns the
full per-step (obs, action, reward, done) trajectory; this script is the
gradient-based consumer that proves those semantics: GAE advantages
bootstrap-masked by ``traj.dones`` (auto-reset boundaries inside the
kernel), a Gaussian log-prob over the kernel's exploration noise
(action = tanh-MLP(obs) + sigma * eps, recorded post-noise), and optax
Adam updates on actor + critic between rollout calls — policy parameters
are runtime kernel inputs, so the loop never recompiles.

Writes the learning curve to TRAIN_r05.json (key "ppo").

Usage:
    python examples/train_ppo.py                    # cheetah-run
    PPO_ITERS=3 PPO_BATCH=512 python examples/train_ppo.py   # smoke
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp
import optax

from oxide_control_tpu import suite
from oxide_control_tpu.parallel.rollout import FastRollout
from oxide_control_tpu.policy import MLPPolicy

ITERS = int(os.environ.get("PPO_ITERS", "60"))
BATCH = int(os.environ.get("PPO_BATCH", "2048"))
STEPS = int(os.environ.get("PPO_STEPS", "200"))
SIGMA = float(os.environ.get("PPO_SIGMA", "0.1"))
GAMMA, LAM = 0.99, 0.95
CLIP = 0.2
EPOCHS = int(os.environ.get("PPO_EPOCHS", "4"))
MINIBATCHES = 8
LR = 3e-4
ARTIFACT = os.path.join(os.path.dirname(__file__), "..", "TRAIN_r05.json")


def critic_init(rng, n_obs, hidden=(64, 64)):
    import math

    dims = [n_obs, *hidden, 1]
    params = []
    for i in range(len(dims) - 1):
        rng, k = jax.random.split(rng)
        lim = math.sqrt(6.0 / (dims[i] + dims[i + 1]))
        w = jax.random.uniform(k, (dims[i + 1], dims[i]), minval=-lim,
                               maxval=lim, dtype=jnp.float32)
        params.append((w, jnp.zeros((dims[i + 1],), jnp.float32)))
    return params


def critic_apply(params, obs):
    # clip: a lane that is heading for divergence (pre-auto-reset) can
    # emit huge observations; the actor's tanh saturates harmlessly but a
    # linear-output critic would poison the value loss
    x = jnp.clip(obs, -100.0, 100.0)
    for (w, b) in params[:-1]:
        x = jnp.tanh(x @ w.T + b)
    w, b = params[-1]
    return (x @ w.T + b)[..., 0]


def gaussian_logp(mu, a, sigma):
    return -0.5 * jnp.sum(((a - mu) / sigma) ** 2, axis=-1)  # + const


def main():
    benv = suite.load_batched("cheetah", "run", BATCH, dtype=np.float32)
    policy = MLPPolicy(hidden=(64, 64), explore_sigma=SIGMA)
    roll = FastRollout(benv, steps_per_call=STEPS, policy=policy,
                       collect=True)
    n_obs, nu = roll.n_obs, benv.model.nu

    rng = jax.random.PRNGKey(0)
    rng, ka, kc, ks = jax.random.split(rng, 4)
    actor = roll.init_params(ka)
    critic = critic_init(kc, n_obs)
    state = roll.init(ks)

    # gradient clipping keeps the raw-scale value loss from blowing up the
    # shared Adam state (observed: un-clipped runs go NaN ~iter 40)
    opt = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(LR))
    opt_state = opt.init((actor, critic))

    def mu_apply(params, obs):
        # deterministic part of the kernel policy (same op order)
        x = obs
        for (w, b) in params:
            x = jnp.tanh(x @ w.T + b[:, 0])
        return x

    def gae(rewards, dones, values):
        # rewards/dones/values: (K, B); bootstrap the final step from its
        # own value (truncation, not termination)
        nonterm = 1.0 - dones
        v_next = jnp.concatenate([values[1:], values[-1:]], axis=0)

        def bwd(adv, x):
            r, nt, v, vn = x
            delta = r + GAMMA * vn * nt - v
            adv = delta + GAMMA * LAM * nt * adv
            return adv, adv

        _, advs = jax.lax.scan(
            bwd, jnp.zeros_like(values[0]),
            (rewards, nonterm, values, v_next), reverse=True,
        )
        return advs

    def loss_fn(params, mb):
        actor_p, critic_p = params
        obs, act, adv, target, logp_old = mb
        mu = mu_apply(actor_p, obs)
        logp = gaussian_logp(mu, act, SIGMA)
        # clamp the log-ratio: with a small fixed sigma a few epochs of
        # drift can push exp() to inf on off-policy samples
        ratio = jnp.exp(jnp.clip(logp - logp_old, -20.0, 20.0))
        surr = jnp.minimum(
            ratio * adv,
            jnp.clip(ratio, 1.0 - CLIP, 1.0 + CLIP) * adv,
        )
        v = critic_apply(critic_p, obs)
        v_loss = jnp.mean((v - target) ** 2)
        return -jnp.mean(surr) + 0.5 * v_loss

    @jax.jit
    def prepare(actor_p, critic_p, obs, act, rewards, dones):
        # obs (K, n_obs, B) -> (K, B, n_obs); act (K, nu, B) -> (K, B, nu)
        obs = jnp.swapaxes(obs, 1, 2)
        act = jnp.swapaxes(act, 1, 2)
        values = critic_apply(critic_p, obs)            # (K, B)
        adv = gae(rewards, dones, values)
        target = adv + values
        adv = (adv - adv.mean()) / (adv.std() + 1e-8)
        logp_old = gaussian_logp(mu_apply(actor_p, obs), act, SIGMA)
        flat = lambda x: x.reshape((STEPS * BATCH,) + x.shape[2:])
        return tuple(map(flat, (obs, act, adv, target, logp_old)))

    @jax.jit
    def epoch(params, opt_state, data, key):
        n = STEPS * BATCH
        perm = jax.random.permutation(key, n)
        mbs = jax.tree.map(
            lambda x: x[perm].reshape((MINIBATCHES, n // MINIBATCHES)
                                      + x.shape[1:]), data)

        def one(carry, mb):
            params, opt_state = carry
            g = jax.grad(loss_fn)(params, mb)
            updates, opt_state = opt.update(g, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), 0.0

        (params, opt_state), _ = jax.lax.scan(one, (params, opt_state), mbs)
        return params, opt_state

    print(f"[ppo] cheetah-run  batch={BATCH} steps/call={STEPS} "
          f"sigma={SIGMA} iters={ITERS}", flush=True)
    history = []
    t0 = time.perf_counter()
    for it in range(ITERS):
        rng, kr = jax.random.split(rng)
        state, traj = roll.run(state, kr, actor)
        ret = float(jnp.mean(traj.reward_sum))
        assert np.isfinite(ret), f"training diverged at iter {it}"
        history.append(ret)
        data = prepare(actor, critic, traj.obs, traj.ctrls, traj.rewards,
                       traj.dones)
        for name, x in zip(("obs", "act", "adv", "target", "logp"), data):
            assert bool(jnp.isfinite(x).all()), (
                f"non-finite {name} in update data at iter {it}"
            )
        params = (actor, critic)
        for _ in range(EPOCHS):
            rng, ke = jax.random.split(rng)
            params, opt_state = epoch(params, opt_state, data, ke)
        actor, critic = params
        assert all(bool(jnp.isfinite(leaf).all())
                   for wb in actor for leaf in wb), (
            f"actor params non-finite after iter {it} update"
        )
        div = int(np.sum(np.asarray(traj.diverged)))
        print(f"[ppo] iter {it:3d}  mean return/call {ret:9.2f}"
              f"  diverged {div}", flush=True)

    wall = time.perf_counter() - t0
    env_steps = ITERS * BATCH * STEPS
    rate = env_steps / wall
    print(f"[ppo] {env_steps:.3g} env-steps in {wall:.1f}s "
          f"({rate:.3g} steps/s incl. optimization)")
    first = float(np.mean(history[:3]))
    last = float(np.mean(history[-3:]))
    print(f"[ppo] mean return/call: first-3 {first:.2f} -> last-3 {last:.2f}")

    # learning-curve artifact (VERDICT r4 next #4: assert on a margin, log
    # the curve)
    try:
        art = json.load(open(ARTIFACT))
    except (OSError, ValueError):
        art = {}
    art["ppo"] = {
        "domain": "cheetah-run", "batch": BATCH, "steps_per_call": STEPS,
        "iters": ITERS, "sigma": SIGMA, "curve": [round(h, 3) for h in
                                                  history],
        "env_steps": env_steps, "wall_s": round(wall, 1),
        "steps_per_s": round(rate, 1),
    }
    with open(ARTIFACT, "w") as f:
        json.dump(art, f, indent=1)
    if ITERS >= 20:
        margin = 0.25 * abs(first) + 1.0
        assert last > first + margin, (
            f"PPO did not clear the improvement margin: {first:.2f} -> "
            f"{last:.2f} (needed +{margin:.2f})"
        )
    return history


if __name__ == "__main__":
    main()
