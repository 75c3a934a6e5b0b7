"""n-step PPO for improvement models (DACT / NeuOpt / N2S).

Reference `rl4co/models/rl/ppo/n_step_ppo.py:28-276`: rollout ``n_step``
improvement moves storing (state, action, logprob, reward), bootstrap
returns from the critic at the segment end, then K clipped-PPO epochs with
value clipping; a curriculum (CL) warm-start rolls the policy a growing
number of no-grad steps before training segments each epoch.

Here one *segment* (rollout + K epochs of updates) is a single jitted
function; the T_train loop and the CL counter stay host-side.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.models.zoo.dact import ImprovementCritic, dact_act
from rl4co_tpu.rl.reinforce import TrainState


@dataclasses.dataclass(frozen=True)
class NStepPPO:
    env: Any                      # improvement env (e.g. TSPkopt)
    policy: Any                   # improvement policy module (e.g. DACTPolicy)
    critic: Optional[ImprovementCritic] = None
    act_fn: Any = dact_act        # (policy, params, state, key, spec, prev, replay)
    clip_range: float = 0.1
    ppo_epochs: int = 3
    vf_lambda: float = 1.0
    max_grad_norm: float = 0.05
    gamma: float = 0.999
    n_step: int = 5
    T_train: int = 250
    T_test: int = 1000
    lr_policy: float = 8e-5
    lr_critic: float = 2e-5
    CL_scalar: float = 2.0
    CL_best: bool = False
    action_dim: int = 2  # packed action width (DACT 2, N2S 3, NeuOpt 3*k_max)
    train_spec: DecodeSpec = DecodeSpec(kind="sampling", tanh_clipping=6.0)
    # CL curriculum pacing for the Trainer adapter (`make_train_step`):
    # when > 0, cl_num = ceil(CL_scalar * epoch) with epoch = calls // hint
    # (reference increments CL per epoch, `n_step_ppo.py:131-139`).
    steps_per_epoch_hint: int = 0
    eval_t_max: int = 0  # 0 = T_test

    def __post_init__(self):
        if self.critic is None:
            object.__setattr__(
                self, "critic", ImprovementCritic(embed_dim=2 * self.policy.embed_dim)
            )

    def make_optimizer(self):
        tx = optax.multi_transform(
            {"policy": optax.adam(self.lr_policy), "critic": optax.adam(self.lr_critic)},
            param_labels={"policy": "policy", "critic": "critic"},
        )
        if self.max_grad_norm and self.max_grad_norm > 0:
            tx = optax.chain(optax.clip_by_global_norm(self.max_grad_norm), tx)
        return tx

    def init(self, key: jax.Array) -> TrainState:
        kg, kp, kc = jax.random.split(key, 3)
        instances = self.env.generate_batch(kg, 2)
        state0 = self.env.reset_batch(instances, kg)
        policy_params = self.policy.init(kp, state0)
        _, embeds = self.policy.apply(policy_params, state0)
        critic_params = self.critic.init(kc, embeds)
        params = {"policy": policy_params, "critic": critic_params}
        opt_state = self.make_optimizer().init(params)
        return TrainState(
            params=params, opt_state=opt_state, baseline_state=None, step=jnp.int32(0)
        )

    # ---- rollout helpers ----

    def _rollout_segment(self, params, env_state, prev_action, key):
        """Scan ``n_step`` policy moves; returns stacked memory."""

        def body(carry, k):
            st, prev = carry
            ka, _ = jax.random.split(k)
            action, logprob, embeds = self.act_fn(
                self.policy, params["policy"], st, ka, self.train_spec, prev
            )
            next_st, reward = self.env.step_batch(st, action)
            return (next_st, action), (st, action, logprob, reward)

        (env_state, prev_action), memory = jax.lax.scan(
            body, (env_state, prev_action), jax.random.split(key, self.n_step)
        )
        return env_state, prev_action, memory

    def _evaluate(self, params, states, actions):
        """Recompute logprobs + values for stored (state, action) pairs.

        states: stacked pytree [n_step, B, ...]; actions: [n_step, B, 2].
        """
        spec_eval = dataclasses.replace(self.train_spec, kind="evaluate")

        def one(st, act):
            _, logprob, embeds = self.act_fn(
                self.policy, params["policy"], st, jax.random.PRNGKey(0),
                spec_eval, None, act,
            )
            value = self.critic.apply(params["critic"], embeds)
            return logprob, value

        return jax.vmap(one)(states, actions)  # [n_step, B] each

    def make_segment_step(self, donate: bool = False):
        tx = self.make_optimizer()

        def segment(train_state: TrainState, env_state, prev_action, key):
            kroll, kboot = jax.random.split(key)
            env_state, prev_action, memory = self._rollout_segment(
                train_state.params, env_state, prev_action, kroll
            )
            states, actions, old_ll, rewards = memory

            # bootstrap: R = V(final state) (reference `n_step_ppo.py:196-206`)
            _, _, embeds_T = self.act_fn(
                self.policy, train_state.params["policy"], env_state, kboot,
                self.train_spec, None,
            )
            v_T = jax.lax.stop_gradient(
                self.critic.apply(train_state.params["critic"], embeds_T)
            )

            def compute_returns(v_last):
                def body(r_next, r_t):
                    r = r_next * self.gamma + r_t
                    return r, r

                _, returns = jax.lax.scan(body, v_last, rewards, reverse=True)
                return returns  # [n_step, B]

            returns = compute_returns(v_T)
            old_ll = jax.lax.stop_gradient(old_ll)

            def loss_fn(params, old_value):
                ll, value = self._evaluate(params, states, actions)
                ratio = jnp.exp(ll - old_ll)
                adv = returns - jax.lax.stop_gradient(value)
                surrogate = -jnp.minimum(
                    ratio * adv,
                    jnp.clip(ratio, 1 - self.clip_range, 1 + self.clip_range) * adv,
                ).mean()
                if old_value is None:
                    value_loss = jnp.square(value - returns).mean()
                else:
                    clipped = jnp.clip(
                        value - old_value, -self.clip_range, self.clip_range
                    ) + old_value
                    value_loss = jnp.maximum(
                        jnp.square(value - returns), jnp.square(clipped - returns)
                    ).mean()
                loss = surrogate + self.vf_lambda * value_loss
                return loss, {
                    "loss": loss,
                    "surrogate_loss": surrogate,
                    "value_loss": value_loss,
                    "value": value.mean(),
                }

            params, opt_state = train_state.params, train_state.opt_state
            old_value = None
            metrics = {}
            for k in range(self.ppo_epochs):
                grads, metrics = jax.grad(loss_fn, has_aux=True)(params, old_value)
                if k == 0:
                    _, v0 = self._evaluate(params, states, actions)
                    old_value = jax.lax.stop_gradient(v0)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)

            metrics["reward"] = rewards.sum(axis=0).mean()
            metrics["cost_bsf"] = env_state.cost_bsf.mean()
            new_train_state = TrainState(
                params=params, opt_state=opt_state,
                baseline_state=None, step=train_state.step + 1,
            )
            return new_train_state, env_state, prev_action, metrics

        return jax.jit(segment, donate_argnums=(0,) if donate else ())

    def make_warmup(self):
        """CL warm-start: roll the policy ``cl_num`` no-grad steps
        (dynamic trip count; reference `n_step_ppo.py:131-139`)."""

        def warmup(params, env_state, key, cl_num):
            def body(i, carry):
                st, prev = carry
                k = jax.random.fold_in(key, i)
                action, _, _ = self.act_fn(
                    self.policy, params["policy"], st, k, self.train_spec, prev
                )
                st, _ = self.env.step_batch(st, action)
                return st, action

            b = env_state.cost_bsf.shape[0]
            prev0 = jnp.zeros((b, self.action_dim), dtype=jnp.int32)
            env_state, prev = jax.lax.fori_loop(0, cl_num, body, (env_state, prev0))
            return env_state, prev

        return jax.jit(warmup)

    def train_on_batch(
        self, train_state: TrainState, instances, key: jax.Array,
        cl_num: int = 0, segment_step=None, warmup=None,
    ):
        """Host-side driver: reset → CL warmup → T_train/n_step jitted segments."""
        kreset, kwarm, krun = jax.random.split(key, 3)
        env_state = self.env.reset_batch(instances, kreset)
        warmup = warmup or self.make_warmup()
        env_state, prev_action = warmup(
            train_state.params, env_state, kwarm, jnp.int32(cl_num)
        )
        if self.CL_best:
            env_state, _ = jax.vmap(self.env.step_to_solution)(
                env_state, env_state.rec_best
            )
        segment_step = segment_step or self.make_segment_step()
        metrics = {}
        for seg in range(self.T_train // self.n_step):
            train_state, env_state, prev_action, metrics = segment_step(
                train_state, env_state, prev_action, jax.random.fold_in(krun, seg)
            )
        return train_state, env_state, metrics

    # ---- Trainer-protocol adapters (so improvement models train through the
    # generic `rl4co_tpu.trainer.Trainer` / train CLI like every other algo) --

    def make_train_step(self, batch_size: int, mesh=None, donate: bool = False):
        """One Trainer step = one fresh instance batch improved for T_train
        moves with n-step PPO updates (host-driven segments)."""
        segment_step = self.make_segment_step()
        warmup = self.make_warmup()
        counter = {"calls": 0}

        def step(train_state: TrainState, key: jax.Array):
            cl_num = 0
            if self.steps_per_epoch_hint > 0:
                import math

                epoch = counter["calls"] // self.steps_per_epoch_hint
                cl_num = int(math.ceil(epoch * self.CL_scalar))
            counter["calls"] += 1
            kd, kt = jax.random.split(jax.random.fold_in(key, train_state.step))
            instances = self.env.generate_batch(kd, batch_size)
            train_state, _, metrics = self.train_on_batch(
                train_state, instances, kt, cl_num=cl_num,
                segment_step=segment_step, warmup=warmup,
            )
            metrics = dict(metrics)
            metrics["reward"] = -metrics.pop("cost_bsf")
            return train_state, metrics

        return step

    def make_eval_step(self, spec=None):
        t_max = self.eval_t_max or self.T_test

        def eval_step(params, instances, key):
            m = self.evaluate(params, instances, key, t_max=t_max)
            return {"reward": -m["cost_bsf"], "cost_init": m["cost_init"]}

        return eval_step

    def epoch_end(self, state: TrainState, host: dict):
        return state, host

    def evaluate(self, params, instances, key: jax.Array, t_max: Optional[int] = None):
        """Greedy-free eval: sample T_test improvement steps, report best cost."""
        t_max = t_max or self.T_test
        kreset, krun = jax.random.split(key)
        env_state = self.env.reset_batch(instances, kreset)
        cost_init = env_state.cost_current

        @jax.jit
        def run(params, env_state, key):
            b = env_state.cost_bsf.shape[0]

            def body(carry, k):
                st, prev = carry
                action, _, _ = self.act_fn(
                    self.policy, params["policy"], st, k, self.train_spec, prev
                )
                st, _ = self.env.step_batch(st, action)
                return (st, action), None

            prev0 = jnp.zeros((b, self.action_dim), dtype=jnp.int32)
            (env_state, _), _ = jax.lax.scan(
                body, (env_state, prev0), jax.random.split(key, t_max)
            )
            return env_state

        env_state = run(params, env_state, krun)
        return {
            "cost_init": cost_init.mean(),
            "cost_bsf": env_state.cost_bsf.mean(),
        }
