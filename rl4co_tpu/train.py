"""Training entrypoint + static workload specs.

TPU-native replacement for the reference's Hydra stack
(`rl4co/tasks/train.py:19-111`, `configs/main.yaml`): instead of runtime
config composition, a :class:`WorkloadSpec` dataclass is a static,
jit-specialization-friendly description of one training run. Usable as a
library (`build(spec)`) or CLI:

    python -m rl4co_tpu.train --env tsp --model am --num-loc 20 \
        --epochs 3 --batch-size 512 --train-size 10000
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Any, Optional

import jax

from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.envs import get_env
from rl4co_tpu.trainer import Trainer, TrainerConfig


@dataclasses.dataclass(frozen=True)
class WorkloadSpec:
    """One training workload (compare `configs/experiment/base.yaml`)."""

    env_name: str = "tsp"
    env_kwargs: tuple = ()         # tuple of (key, value) pairs — hashable
    # any name in MODEL_BUILDERS (the full zoo; reference configs/model/*.yaml)
    model: str = "am"
    policy_kwargs: tuple = ()
    lr: float = 1e-4
    baseline: str = "rollout"
    epochs: int = 100
    batch_size: int = 512
    train_data_size: int = 1_280_000
    val_data_size: int = 10_000
    seed: int = 1234
    tanh_clipping: float = 10.0
    # TPU analog of the reference default precision="16-mixed"
    # (`rl4co/utils/trainer.py:57`): bf16 forward compute, f32 master params.
    precision: str = "bf16-mixed"     # bf16-mixed | f32
    ckpt_dir: Optional[str] = None

    def env(self):
        return get_env(self.env_name, **dict(self.env_kwargs))


def build(spec: WorkloadSpec, mesh=None, logger=None):
    """Build (algorithm, trainer) from a workload spec."""
    # am-multienv takes a comma env list and builds its own env dict
    env = spec.env() if "," not in spec.env_name else None
    pkw = dict(spec.policy_kwargs)
    compute_dtype = "bfloat16" if spec.precision == "bf16-mixed" else None
    train_spec = DecodeSpec(
        kind="sampling",
        tanh_clipping=spec.tanh_clipping,
        compute_dtype=compute_dtype,
    )

    algo = _build_model(spec, env, pkw, train_spec)

    cfg = TrainerConfig(
        epochs=spec.epochs,
        batch_size=spec.batch_size,
        train_data_size=spec.train_data_size,
        val_data_size=spec.val_data_size,
        seed=spec.seed,
        ckpt_dir=spec.ckpt_dir,
    )
    trainer = Trainer(algo, cfg, mesh=mesh, logger=logger)
    return algo, trainer


# Every zoo training method launchable by name (reference: one Hydra config
# per model under configs/model/*.yaml; VERDICT r1 #9). Improvement models
# (dact/n2s/neuopt) ignore --env (they own their improvement MDP); scheduling
# models default their env when --env is a routing default.
MODEL_NAMES = (
    "am", "am-xl", "pomo", "symnco", "ppo", "a2c", "polynet", "deepaco",
    "gfacs", "mdam", "ptrnet", "ham", "matnet", "mvmoe", "mvmoe-pomo",
    "l2d", "l2d-attn", "l2d-ppo", "dact", "n2s", "neuopt", "am-multienv",
)


def _build_model(spec: WorkloadSpec, env, pkw: dict, train_spec):
    name = spec.model
    lr = spec.lr

    if name in ("am", "am-xl"):
        from rl4co_tpu.models import AttentionModelPolicy
        from rl4co_tpu.rl.reinforce import REINFORCE

        if name == "am-xl":
            # reference `configs/experiment/routing/am-xl.yaml:22-27`:
            # 6 encoder layers, instance norm, batch 2048
            pkw = {"num_encoder_layers": 6, "normalization": "instance", **pkw}
        policy = AttentionModelPolicy(env_name=env.name, **pkw)
        return REINFORCE(env=env, policy=policy, baseline=spec.baseline,
                         train_spec=train_spec, lr=lr)
    if name == "pomo":
        from rl4co_tpu.models.zoo.pomo import POMO, make_pomo_policy

        return POMO(env=env, policy=make_pomo_policy(env.name, **pkw),
                    train_spec=train_spec, lr=lr)
    if name == "symnco":
        from rl4co_tpu.models.zoo.symnco import SymNCO, SymNCOPolicy

        return SymNCO(env=env, policy=SymNCOPolicy(env_name=env.name, **pkw),
                      train_spec=train_spec, lr=lr)
    if name == "ppo":
        from rl4co_tpu.models import AttentionModelPolicy
        from rl4co_tpu.rl.ppo import PPO

        return PPO(env=env, policy=AttentionModelPolicy(env_name=env.name, **pkw),
                   train_spec=train_spec, lr=lr)
    if name == "a2c":
        from rl4co_tpu.models import AttentionModelPolicy
        from rl4co_tpu.rl.a2c import A2C

        return A2C(env=env, policy=AttentionModelPolicy(env_name=env.name, **pkw),
                   train_spec=train_spec, lr=lr)
    if name == "polynet":
        from rl4co_tpu.models.zoo.polynet import PolyNet, PolyNetPolicy

        return PolyNet(env=env, policy=PolyNetPolicy(env_name=env.name, **pkw),
                       train_spec=train_spec, lr=lr)
    if name == "deepaco":
        from rl4co_tpu.models.zoo.deepaco import DeepACO

        return DeepACO(env=env, lr=lr)
    if name == "gfacs":
        from rl4co_tpu.models.zoo.gfacs import GFACS

        return GFACS(env=env, lr=lr)
    if name == "mdam":
        from rl4co_tpu.models.zoo.mdam import MDAM, MDAMPolicy

        return MDAM(env=env, policy=MDAMPolicy(env_name=env.name, **pkw),
                    baseline=spec.baseline, train_spec=train_spec, lr=lr)
    if name == "ptrnet":
        from rl4co_tpu.models.zoo.ptrnet import PointerNetwork, PointerNetworkModel

        return PointerNetworkModel(env=env, policy=PointerNetwork(**pkw),
                                   train_spec=train_spec, lr=lr)
    if name == "ham":
        from rl4co_tpu.envs import get_env
        from rl4co_tpu.models.zoo.ham import HeterogeneousAttentionModel

        if env.name not in ("pdp", "mpdp", "mdcpdp"):
            env = get_env("pdp", **dict(spec.env_kwargs))  # HAM is a PDP method
        return HeterogeneousAttentionModel(env, policy_kwargs=pkw,
                                           train_spec=train_spec, lr=lr)
    if name == "matnet":
        from rl4co_tpu.envs import get_env
        from rl4co_tpu.models.zoo.matnet import MatNet

        if env.name != "atsp":
            env = get_env("atsp", **dict(spec.env_kwargs))
        return MatNet(env, policy_kwargs=pkw, train_spec=train_spec, lr=lr)
    if name in ("mvmoe", "mvmoe-pomo"):
        from rl4co_tpu.models.zoo.mvmoe import MVMoE_AM, MVMoE_POMO

        ctor = MVMoE_POMO if name == "mvmoe-pomo" else MVMoE_AM
        return ctor(env, policy_kwargs=pkw, train_spec=train_spec, lr=lr)
    if name in ("l2d", "l2d-attn", "l2d-ppo"):
        from rl4co_tpu.envs import get_env

        if env.name not in ("fjsp", "jssp"):
            # L2DAttn's pointer head is the JSSP variant (machine-of-op fixed)
            env = get_env("jssp" if name == "l2d-attn" else "fjsp")
        if name == "l2d":
            from rl4co_tpu.models.zoo.l2d import L2DModel, L2DPolicy

            return L2DModel(env=env, policy=L2DPolicy(**pkw), lr=lr)
        if name == "l2d-attn":
            from rl4co_tpu.models.zoo.l2d import L2DAttnModel, L2DAttnPolicy

            return L2DAttnModel(env=env, policy=L2DAttnPolicy(**pkw), lr=lr)
        from rl4co_tpu.models.zoo.l2d import L2DPolicy
        from rl4co_tpu.rl.stepwise_ppo import StepwisePPO

        policy = L2DPolicy(**{"with_critic": True, **pkw})
        return StepwisePPO(env=env, policy=policy, lr=lr)
    if name == "am-multienv":
        # mixed-env training: one shared-trunk policy over several envs
        # (BASELINE.json OP+PCTSP config); --env takes a comma list
        from rl4co_tpu.envs import get_env
        from rl4co_tpu.rl.multi_env import MultiEnvREINFORCE

        env_names = tuple(spec.env_name.split(","))
        envs = {n: get_env(n, **dict(spec.env_kwargs)) for n in env_names}
        return MultiEnvREINFORCE(envs=envs, train_spec=train_spec, lr=lr)
    if name in ("dact", "n2s", "neuopt"):
        # improvement trio on their own MDPs via n-step PPO + CL
        kw = dict(lr_policy=lr, policy_kwargs=pkw)
        if name == "dact":
            from rl4co_tpu.models.zoo.dact import DACT

            return DACT(**kw)
        if name == "n2s":
            from rl4co_tpu.models.zoo.n2s import N2S

            return N2S(**kw)
        from rl4co_tpu.models.zoo.neuopt import NeuOpt

        return NeuOpt(**kw)
    raise ValueError(f"Unknown model {name}. Available: {MODEL_NAMES}")


def run_search(search: str, algo, state, instances, key):
    """Post-train transductive / hierarchical search (reference transductive
    zoo + GLOP; VERDICT r1 #9 '--search flag')."""
    if search == "active_search":
        from rl4co_tpu.models.zoo.eas import ActiveSearch

        return ActiveSearch(env=algo.env, policy=algo.policy).search(
            state.params, instances, key)
    if search == "eas-emb":
        from rl4co_tpu.models.zoo.eas import EASEmb

        return EASEmb(env=algo.env, policy=algo.policy).search(
            state.params, instances, key)
    if search == "eas-lay":
        from rl4co_tpu.models.zoo.eas import EASLay

        return EASLay(env=algo.env, policy=algo.policy).search(
            state.params, instances, key)
    raise ValueError(f"Unknown search {search!r}")


def main(argv: Optional[list] = None):
    p = argparse.ArgumentParser(description="rl4co-tpu training")
    p.add_argument("--env", default="tsp")
    p.add_argument("--model", default="am", choices=MODEL_NAMES)
    p.add_argument("--search", default=None,
                   choices=["active_search", "eas-emb", "eas-lay"],
                   help="post-train transductive search on the test set")
    p.add_argument("--search-size", type=int, default=64)
    p.add_argument("--search-iters", type=int, default=0,
                   help="override search max_iters (0 = method default)")
    p.add_argument("--num-loc", type=int, default=20)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--train-size", type=int, default=100_000)
    p.add_argument("--val-size", type=int, default=1_000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--baseline", default="rollout")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--log-file", default=None, help="JSONL metrics file")
    p.add_argument("--tensorboard", default=None, metavar="LOGDIR",
                   help="also write TensorBoard event files to LOGDIR")
    p.add_argument("--mlflow", default=None, metavar="MLRUNS_DIR",
                   help="also write an MLflow file-store run (mlruns layout)")
    p.add_argument("--ckpt-dir", default=None,
                   help="save best (val/reward max) + last checkpoints here")
    p.add_argument("--resume-from", default=None,
                   help="checkpoint dir written by a previous run (…/last or …/best)")
    p.add_argument("--precision", default="bf16-mixed",
                   choices=["bf16-mixed", "f32"])
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel mesh size (0 = all local devices when >1)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize() first "
                        "(reads JAX coordinator env vars / TPU metadata)")
    args = p.parse_args(argv)

    if args.distributed:
        # Multi-host entry (reference: Lightning spawns DDP ranks,
        # `utils/trainer.py:73-86`): each host runs this same script; JAX
        # discovers coordinator/world from env or TPU metadata.
        jax.distributed.initialize()

    spec = WorkloadSpec(
        env_name=args.env,
        env_kwargs=(("num_loc", args.num_loc),),
        model=args.model,
        lr=args.lr,
        baseline=args.baseline,
        epochs=args.epochs,
        batch_size=args.batch_size,
        train_data_size=args.train_size,
        val_data_size=args.val_size,
        seed=args.seed,
        precision=args.precision,
        ckpt_dir=args.ckpt_dir,
    )
    mesh = None
    n_dev = len(jax.devices())
    if args.dp > 1 or (args.dp == 0 and n_dev > 1):
        from rl4co_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=args.dp if args.dp > 1 else n_dev)
        print(f"Data-parallel mesh: dp={mesh.shape['dp']} over {n_dev} devices")
    logger = None
    if args.log_file or args.tensorboard or args.mlflow:
        from rl4co_tpu.loggers import (JSONLLogger, MLflowFileLogger,
                                       MultiLogger, TensorBoardLogger)

        parts = [lambda m: print(json.dumps({k: str(v) for k, v in m.items()}))]
        if args.log_file:
            parts.append(JSONLLogger(args.log_file))
        if args.tensorboard:
            parts.append(TensorBoardLogger(args.tensorboard))
        if args.mlflow:
            parts.append(MLflowFileLogger(root=args.mlflow,
                                          run_name=f"{args.model}-{args.env}"))
        logger = MultiLogger(*parts)
    print(f"Workload: {spec}")
    algo, trainer = build(spec, mesh=mesh, logger=logger)
    state = trainer.fit(resume_from=args.resume_from)
    if args.search:
        key = jax.random.PRNGKey(spec.seed + 1)
        instances = algo.env.generate_batch(key, args.search_size)
        search_obj = run_search(args.search, algo, state, instances, key) \
            if not args.search_iters else _run_search_iters(
                args.search, algo, state, instances, key, args.search_iters)
        best = search_obj["best_reward"]
        print(json.dumps({"search": args.search,
                          "best_reward": float(best.mean())}))
    return state


def _run_search_iters(search, algo, state, instances, key, iters):
    import dataclasses as _dc

    from rl4co_tpu.models.zoo.eas import EASEmb, EASLay, ActiveSearch

    cls = {"active_search": ActiveSearch, "eas-emb": EASEmb,
           "eas-lay": EASLay}[search]
    return cls(env=algo.env, policy=algo.policy, max_iters=iters).search(
        state.params, instances, key)


if __name__ == "__main__":
    main()
