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
    model: str = "am"              # am | pomo | symnco | ppo | a2c | polynet | deepaco | gfacs
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
    env = spec.env()
    pkw = dict(spec.policy_kwargs)
    compute_dtype = "bfloat16" if spec.precision == "bf16-mixed" else None
    train_spec = DecodeSpec(
        kind="sampling",
        tanh_clipping=spec.tanh_clipping,
        compute_dtype=compute_dtype,
    )

    if spec.model in ("am", "am-xl"):
        from rl4co_tpu.models import AttentionModelPolicy
        from rl4co_tpu.rl.reinforce import REINFORCE

        if spec.model == "am-xl":
            # reference `configs/experiment/routing/am-xl.yaml:22-27`:
            # 6 encoder layers, instance norm, batch 2048
            pkw = {"num_encoder_layers": 6, "normalization": "instance", **pkw}
        policy = AttentionModelPolicy(env_name=env.name, **pkw)
        algo = REINFORCE(env=env, policy=policy, baseline=spec.baseline,
                         train_spec=train_spec, lr=spec.lr)
    elif spec.model == "pomo":
        from rl4co_tpu.models.zoo.pomo import POMO, make_pomo_policy

        policy = make_pomo_policy(env.name, **pkw)
        algo = POMO(env=env, policy=policy, train_spec=train_spec, lr=spec.lr)
    elif spec.model == "symnco":
        from rl4co_tpu.models.zoo.symnco import SymNCO, SymNCOPolicy

        policy = SymNCOPolicy(env_name=env.name, **pkw)
        algo = SymNCO(env=env, policy=policy, train_spec=train_spec, lr=spec.lr)
    elif spec.model == "ppo":
        from rl4co_tpu.models import AttentionModelPolicy
        from rl4co_tpu.rl.ppo import PPO

        policy = AttentionModelPolicy(env_name=env.name, **pkw)
        algo = PPO(env=env, policy=policy, train_spec=train_spec, lr=spec.lr)
    elif spec.model == "a2c":
        from rl4co_tpu.models import AttentionModelPolicy
        from rl4co_tpu.rl.a2c import A2C

        policy = AttentionModelPolicy(env_name=env.name, **pkw)
        algo = A2C(env=env, policy=policy, train_spec=train_spec, lr=spec.lr)
    elif spec.model == "polynet":
        from rl4co_tpu.models.zoo.polynet import PolyNet, PolyNetPolicy

        policy = PolyNetPolicy(env_name=env.name, **pkw)
        algo = PolyNet(env=env, policy=policy, train_spec=train_spec, lr=spec.lr)
    elif spec.model == "deepaco":
        from rl4co_tpu.models.zoo.deepaco import DeepACO

        algo = DeepACO(env=env, lr=spec.lr)
    elif spec.model == "gfacs":
        from rl4co_tpu.models.zoo.gfacs import GFACS

        algo = GFACS(env=env, lr=spec.lr)
    else:
        raise ValueError(f"Unknown model {spec.model}")

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


def main(argv: Optional[list] = None):
    p = argparse.ArgumentParser(description="rl4co-tpu training")
    p.add_argument("--env", default="tsp")
    p.add_argument("--model", default="am")
    p.add_argument("--num-loc", type=int, default=20)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--train-size", type=int, default=100_000)
    p.add_argument("--val-size", type=int, default=1_000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--baseline", default="rollout")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--log-file", default=None, help="JSONL metrics file")
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
    if args.log_file:
        from rl4co_tpu.loggers import JSONLLogger, MultiLogger

        logger = MultiLogger(JSONLLogger(args.log_file),
                             lambda m: print(json.dumps({k: str(v) for k, v in m.items()})))
    print(f"Workload: {spec}")
    algo, trainer = build(spec, mesh=mesh, logger=logger)
    state = trainer.fit(resume_from=args.resume_from)
    return state


if __name__ == "__main__":
    main()
