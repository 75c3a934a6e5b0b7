"""Creating a new environment + wiring a model to it.

Reference counterpart: `examples/3-creating-new-env-model.ipynb`. Here we
define a **k-center** problem (choose k facilities minimizing the MAXIMUM
distance of any point to its nearest facility — the minimax sibling of the
built-in FLP), register it plus its init/context embeddings, and train
AttentionModel on it end to end.

The recipe for any new env:
1. a `flax.struct` state pytree,
2. a frozen `Env` dataclass with pure per-instance
   `generate/reset/step/action_mask/reward` (+ `num_actions`/`max_steps`),
3. `register_env(name, cls)`,
4. an init embedding + context embedding in the registries (the AM decoder
   query is built from these).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import math

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from rl4co_tpu.envs import get_env, register_env
from rl4co_tpu.envs.base import Env, Instance
from rl4co_tpu.models import AttentionModelPolicy
from rl4co_tpu.models.nn.env_embeddings.context import CONTEXT_EMBEDDING_REGISTRY
from rl4co_tpu.models.nn.env_embeddings.init import INIT_EMBEDDING_REGISTRY
from rl4co_tpu.rl.reinforce import REINFORCE
from rl4co_tpu.trainer import Trainer, TrainerConfig
from rl4co_tpu.utils.ops import get_distance_matrix, set_at


# ---- 1+2: state + env -------------------------------------------------------

@struct.dataclass
class KCenterState:
    locs: jax.Array            # [N, 2]
    orig_distances: jax.Array  # [N, N]
    distances: jax.Array       # [N] running min distance to chosen set
    chosen: jax.Array          # bool [N]
    i: jax.Array
    done: jax.Array


@dataclasses.dataclass(frozen=True)
class KCenter(Env):
    name = "kcenter"
    num_loc: int = 20
    k: int = 4

    def generate(self, key: jax.Array) -> Instance:
        return {"locs": jax.random.uniform(key, (self.num_loc, 2))}

    def reset(self, instance: Instance) -> KCenterState:
        return KCenterState(
            locs=instance["locs"],
            orig_distances=get_distance_matrix(instance["locs"]),
            distances=jnp.full((self.num_loc,), math.sqrt(2.0)),
            chosen=jnp.zeros((self.num_loc,), dtype=bool),
            i=jnp.int32(0),
            done=jnp.bool_(False),
        )

    def step(self, state: KCenterState, action: jax.Array) -> KCenterState:
        action = action.astype(jnp.int32)
        new = state.replace(
            chosen=set_at(state.chosen, action, True),
            distances=jnp.minimum(state.distances,
                                  state.orig_distances[action]),
            i=state.i + 1,
            done=state.i >= self.k - 1,
        )
        # absorbing once done (padded scan steps must not change anything)
        return jax.tree_util.tree_map(
            lambda n_, o: jnp.where(state.done, o, n_), new, state)

    def action_mask(self, state: KCenterState) -> jax.Array:
        pad = jnp.zeros_like(state.chosen).at[0].set(True)
        return jnp.where(state.done, pad, ~state.chosen)

    def reward(self, state: KCenterState, actions: jax.Array) -> jax.Array:
        return -state.distances.max()   # minimax objective

    @property
    def num_actions(self) -> int:
        return self.num_loc

    @property
    def max_steps(self) -> int:
        return self.k

    def check_solution_validity(self, instance, actions) -> None:
        import numpy as np
        a = np.asarray(actions)[: self.k]
        assert len(np.unique(a)) == self.k, "duplicate facilities"


# ---- 4: embeddings -----------------------------------------------------------

class KCenterInitEmbedding(nn.Module):
    """Node features -> d-dim tokens for the encoder."""

    embed_dim: int

    @nn.compact
    def __call__(self, instance: Instance) -> jax.Array:
        return nn.Dense(self.embed_dim, name="init_embed")(instance["locs"])


class KCenterContext(nn.Module):
    """Decoder query: embedding of the current worst-covered point."""

    embed_dim: int

    @nn.compact
    def __call__(self, embeddings: jax.Array, state) -> jax.Array:
        worst = jnp.argmax(state.distances, axis=-1)               # [B]
        ctx = jnp.take_along_axis(
            embeddings, worst[:, None, None].repeat(embeddings.shape[-1], -1),
            axis=-2,
        )[:, 0]
        return nn.Dense(self.embed_dim, use_bias=False,
                        name="project_context")(ctx)


# ---- 3: registration + training ---------------------------------------------

def main():
    register_env("kcenter", KCenter)
    INIT_EMBEDDING_REGISTRY["kcenter"] = KCenterInitEmbedding
    CONTEXT_EMBEDDING_REGISTRY["kcenter"] = KCenterContext

    env = get_env("kcenter", num_loc=20, k=4)
    policy = AttentionModelPolicy(env_name="kcenter", embed_dim=64,
                                  num_encoder_layers=2,
                                  use_graph_context=False)
    algo = REINFORCE(env=env, policy=policy, baseline="exponential", lr=1e-4)
    trainer = Trainer(algo, TrainerConfig(
        epochs=2, batch_size=64, train_data_size=2_048,
        val_data_size=128, val_batch_size=128,
    ))
    trainer.fit()
    last_val = [r for r in trainer.history if "val/reward" in r][-1]
    print(f"k-center val max-distance after training: "
          f"{-last_val['val/reward']:.4f} (random k points ~0.35-0.45)")


if __name__ == "__main__":
    main()
