"""DACT + n-step PPO tests (reference `tests/test_training.py:237-263`)."""

import jax
import jax.numpy as jnp
import numpy as np

from rl4co_tpu.envs.routing.tsp_kopt import TSPkopt
from rl4co_tpu.models.zoo.dact import DACTPolicy, dact_act
from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.rl.n_step_ppo import NStepPPO


def small_setup():
    env = TSPkopt(num_loc=8, k_max=2)
    policy = DACTPolicy(embed_dim=16, num_heads=2, num_encoder_layers=1,
                        feedforward_hidden=16)
    algo = NStepPPO(env=env, policy=policy, n_step=2, T_train=4, T_test=6,
                    ppo_epochs=2)
    return env, policy, algo


def test_dact_act_produces_valid_moves():
    env, policy, algo = small_setup()
    instances = env.generate_batch(jax.random.PRNGKey(0), 3)
    state = env.reset_batch(instances, jax.random.PRNGKey(1))
    params = policy.init(jax.random.PRNGKey(2), state)
    spec = DecodeSpec(kind="sampling", tanh_clipping=6.0)
    action, logprob, embeds = dact_act(policy, params, state,
                                       jax.random.PRNGKey(3), spec)
    a = np.asarray(action)
    assert a.shape == (3, 2)
    assert (a[:, 0] != a[:, 1]).all()  # self-pairs masked
    assert embeds.shape == (3, 8, 32)
    # applying the move keeps valid tours
    state2, reward = env.step_batch(state, jnp.asarray(action))
    for b in range(3):
        env.check_solution_validity(None, np.asarray(state2.rec_current)[b])


def test_nstep_ppo_trains():
    env, policy, algo = small_setup()
    train_state = algo.init(jax.random.PRNGKey(0))
    instances = env.generate_batch(jax.random.PRNGKey(1), 4)
    train_state, env_state, metrics = algo.train_on_batch(
        train_state, instances, jax.random.PRNGKey(2), cl_num=1
    )
    assert int(train_state.step) == 2  # T_train/n_step segments
    for k in ("loss", "surrogate_loss", "value_loss"):
        assert np.isfinite(float(metrics[k])), k
    # improvement: bsf cost must be <= initial cost
    m = algo.evaluate(train_state.params, instances, jax.random.PRNGKey(3))
    assert float(m["cost_bsf"]) <= float(m["cost_init"]) + 1e-6


def test_n2s_on_pdp_ruin_repair():
    from rl4co_tpu.envs.routing.pdp_ruin_repair import PDPRuinRepair
    from rl4co_tpu.models.zoo.dact import ImprovementCritic
    from rl4co_tpu.models.zoo.n2s import N2SPolicy, n2s_act

    env = PDPRuinRepair(num_loc=8)
    policy = N2SPolicy(embed_dim=16, num_heads=2, num_encoder_layers=1,
                       feedforward_hidden=16)
    algo = NStepPPO(env=env, policy=policy, act_fn=n2s_act, n_step=2, T_train=4,
                    ppo_epochs=2, action_dim=3,
                    critic=ImprovementCritic(embed_dim=16))
    ts = algo.init(jax.random.PRNGKey(0))
    instances = env.generate_batch(jax.random.PRNGKey(1), 3)
    ts, env_state, m = algo.train_on_batch(ts, instances, jax.random.PRNGKey(3),
                                           cl_num=1)
    assert np.isfinite(float(m["loss"]))
    for b in range(3):
        env.check_solution_validity(None, np.asarray(env_state.rec_best)[b])


def test_neuopt_act_on_kopt_env():
    from rl4co_tpu.models.zoo.neuopt import NeuOptPolicy, neuopt_act

    env = TSPkopt(num_loc=10, k_max=4)
    policy = NeuOptPolicy(embed_dim=16, num_heads=2, num_encoder_layers=1,
                          feedforward_hidden=16)
    instances = env.generate_batch(jax.random.PRNGKey(0), 3)
    state = env.reset_batch(instances, jax.random.PRNGKey(1))
    params = policy.init(jax.random.PRNGKey(2), state)
    spec = DecodeSpec(kind="sampling", tanh_clipping=6.0)
    action, ll, h = neuopt_act(policy, params, state, jax.random.PRNGKey(3),
                               spec, k_max=4)
    assert action.shape == (3, 12)
    state2, reward = env.step_batch(state, jnp.asarray(action))
    assert (np.asarray(reward) >= -1e-6).all()
    for b in range(3):
        env.check_solution_validity(None, np.asarray(state2.rec_current)[b])
