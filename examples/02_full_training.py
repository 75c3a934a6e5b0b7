"""Full training workflow: bf16-mixed, checkpointing, resume, named val sets.

Reference counterpart: `examples/2-full-training.ipynb` (ModelCheckpoint
best+last via `configs/callbacks/default.yaml:9-17`, resume via
`trainer.fit(ckpt_path=...)`, multiple named dataloaders
`rl/common/base.py:281-316`, precision="16-mixed").
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tempfile

import jax

from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.envs import get_env
from rl4co_tpu.models import AttentionModelPolicy
from rl4co_tpu.rl.reinforce import REINFORCE
from rl4co_tpu.trainer import Trainer, TrainerConfig


def main(num_loc=10):
    env = get_env("tsp", num_loc=num_loc)
    policy = AttentionModelPolicy(env_name=env.name)
    # bf16 forward pass with f32 master params = reference "16-mixed"
    algo = REINFORCE(env=env, policy=policy, baseline="rollout",
                     train_spec=DecodeSpec(kind="sampling", tanh_clipping=10.0,
                                           compute_dtype="bfloat16"),
                     lr=1e-4)

    ckpt_dir = os.path.join(tempfile.mkdtemp(), "ckpt")
    cfg = TrainerConfig(epochs=2, batch_size=64, train_data_size=1_024,
                        val_data_size=128, val_batch_size=128,
                        ckpt_dir=ckpt_dir, monitor="reward")

    # named validation sets, evaluated every epoch (logged as val/<name>/...)
    # named sets must share the env's static shape (num_loc); vary the
    # instance distribution, not the size
    val_sets = {
        "uniform": env.generate_batch(jax.random.PRNGKey(10), 128),
        "clustered": get_env("tsp", num_loc=num_loc,
                             loc_distribution="cluster").generate_batch(
            jax.random.PRNGKey(11), 128),
    }
    trainer = Trainer(algo, cfg)
    trainer.fit(val_datasets=val_sets)
    print("checkpoints written:", sorted(os.listdir(ckpt_dir)))

    # resume: continues epochs + optimizer/baseline state from `last`
    cfg2 = TrainerConfig(**{**cfg.__dict__, "epochs": 3})
    trainer2 = Trainer(algo, cfg2)
    state = trainer2.fit(resume_from=os.path.join(ckpt_dir, "last"),
                         val_datasets=val_sets)

    # post-fit test phase over named datasets (reference trainer.test)
    results = trainer2.test(state, datasets={
        "test_uniform": env.generate_batch(jax.random.PRNGKey(12), 128),
    })
    print("test:", {k: round(float(v), 4) for k, v in results.items()})


if __name__ == "__main__":
    main()
