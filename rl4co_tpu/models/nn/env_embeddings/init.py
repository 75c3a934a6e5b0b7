"""Initial (node-feature → embedding) modules per environment.

Reference: registry `rl4co/models/nn/env_embeddings/init.py:10-52` and the
per-env classes below it. Each module maps a **batched instance dict** to
node embeddings ``[B, N_actions, D]`` (for routing envs with a depot the
depot is row 0, matching the env's action indexing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class TSPInitEmbedding(nn.Module):
    """xy coords → embedding (reference `init.py:55-68`)."""

    embed_dim: int

    @nn.compact
    def __call__(self, instance) -> jax.Array:
        return nn.Dense(self.embed_dim, name="init_embed")(instance["locs"])


class MatNetInitEmbedding(nn.Module):
    """Initial row/column embeddings for MatNet (reference `init.py:71-112`):
    rows start at zero; columns get a random permutation one-hot (mode
    'RandomOneHot') or uniform noise (mode 'Random'). Returns
    ``(row_emb [B,R,D], col_emb [B,C,D], cost_matrix [B,R,C])``.

    The MatNet encoder in this framework (`models/zoo/matnet.py`) builds
    these internally from the cost matrix; this module exists for API parity
    and for composing MatNet-style encoders over the generic registry.
    """

    embed_dim: int
    mode: str = "RandomOneHot"

    @nn.compact
    def __call__(self, instance):
        assert self.mode in ("RandomOneHot", "Random"), self.mode
        dmat = instance["cost_matrix"]
        b, r, c = dmat.shape
        row_emb = jnp.zeros((b, r, self.embed_dim), dtype=dmat.dtype)
        key = self.make_rng("embed")
        if self.mode == "RandomOneHot":
            assert c <= self.embed_dim, (
                f"RandomOneHot needs embed_dim >= num columns ({c})"
            )
            # random one-hot: column j of instance i lights a distinct slot
            slots = jax.vmap(
                lambda k: jax.random.permutation(k, self.embed_dim)[:c]
            )(jax.random.split(key, b))                     # [B, C]
            col_emb = jax.nn.one_hot(slots, self.embed_dim, dtype=dmat.dtype)
        else:
            col_emb = jax.random.uniform(key, (b, c, self.embed_dim),
                                         dtype=dmat.dtype)
        return row_emb, col_emb, dmat


class VRPInitEmbedding(nn.Module):
    """Depot (xy) and customers (xy+demand) embedded separately
    (reference `init.py:115-141`)."""

    embed_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, instance) -> jax.Array:
        depot = instance["depot"][:, None, :]  # [B, 1, 2]
        cities = instance["locs"]              # [B, N, 2]
        demand = instance["demand"][..., None]
        depot_emb = nn.Dense(self.embed_dim, use_bias=self.use_bias, name="init_embed_depot")(depot)
        node_emb = nn.Dense(self.embed_dim, use_bias=self.use_bias, name="init_embed")(
            jnp.concatenate([cities, demand], axis=-1)
        )
        return jnp.concatenate([depot_emb, node_emb], axis=-2)


class OPInitEmbedding(nn.Module):
    """Depot (xy) and customers (xy+prize) (reference `init.py:254-280`)."""

    embed_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, instance) -> jax.Array:
        depot = instance["depot"][:, None, :]
        feats = jnp.concatenate(
            [instance["locs"], instance["prize"][..., None]], axis=-1
        )
        depot_emb = nn.Dense(self.embed_dim, use_bias=self.use_bias, name="init_embed_depot")(depot)
        node_emb = nn.Dense(self.embed_dim, use_bias=self.use_bias, name="init_embed")(feats)
        return jnp.concatenate([depot_emb, node_emb], axis=-2)


class PCTSPInitEmbedding(nn.Module):
    """Depot (xy), customers (xy + expected prize + penalty)
    (reference `init.py:221-251`)."""

    embed_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, instance) -> jax.Array:
        depot = instance["depot"][:, None, :]
        feats = jnp.concatenate(
            [
                instance["locs"],
                instance["deterministic_prize"][..., None],
                instance["penalty"][..., None],
            ],
            axis=-1,
        )
        depot_emb = nn.Dense(self.embed_dim, use_bias=self.use_bias, name="init_embed_depot")(depot)
        node_emb = nn.Dense(self.embed_dim, use_bias=self.use_bias, name="init_embed")(feats)
        return jnp.concatenate([depot_emb, node_emb], axis=-2)


class VRPTWInitEmbedding(nn.Module):
    """Depot (xy); customers (xy, demand, tw start, tw end, duration)
    (reference `init.py:143-158`)."""

    embed_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, instance) -> jax.Array:
        depot = instance["depot"][:, None, :]
        feats = jnp.concatenate(
            [
                instance["locs"],
                instance["demand"][..., None],
                instance["time_windows"][..., 1:, :],
                instance["durations"][..., 1:, None],
            ],
            axis=-1,
        )
        depot_emb = nn.Dense(self.embed_dim, use_bias=self.use_bias, name="init_embed_depot")(depot)
        node_emb = nn.Dense(self.embed_dim, use_bias=self.use_bias, name="init_embed")(feats)
        return jnp.concatenate([depot_emb, node_emb], axis=-2)


class PDPInitEmbedding(nn.Module):
    """Depot; pickups embedded with their paired delivery coords; deliveries
    alone (reference `init.py:335-360`)."""

    embed_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, instance) -> jax.Array:
        depot = instance["depot"][:, None, :]
        locs = instance["locs"]
        half = locs.shape[-2] // 2
        pick_feats = jnp.concatenate([locs[:, :half], locs[:, half:]], axis=-1)
        delivery_feats = locs[:, half:]
        depot_emb = nn.Dense(self.embed_dim, use_bias=self.use_bias, name="init_embed_depot")(depot)
        pick_emb = nn.Dense(self.embed_dim, use_bias=self.use_bias, name="init_embed_pick")(pick_feats)
        delivery_emb = nn.Dense(
            self.embed_dim, use_bias=self.use_bias, name="init_embed_delivery"
        )(delivery_feats)
        return jnp.concatenate([depot_emb, pick_emb, delivery_emb], axis=-2)


class MPDPInitEmbedding(nn.Module):
    """mPDP (Equity-Transformer): A+1 depot copies with a learned per-copy
    offset (so agents' handover targets are distinguishable despite equal
    coordinates); pickups with paired delivery coords; deliveries alone.
    (The reference never registers an mpdp embedding — its `MPDPEnv` is dead
    code, SURVEY.md §2.6b; layout follows `mpdp/env.py:133-229`.)"""

    embed_dim: int
    num_agents: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, instance) -> jax.Array:
        a = self.num_agents
        depot = instance["depot"][:, None, :]                    # [B, 1, 2]
        locs = instance["locs"]
        half = locs.shape[-2] // 2
        depot_emb = nn.Dense(
            self.embed_dim, use_bias=self.use_bias, name="init_embed_depot"
        )(depot)                                                 # [B, 1, D]
        copy_offset = self.param(
            "depot_copy_offset",
            nn.initializers.normal(0.02),
            (a + 1, self.embed_dim),
        )
        depot_emb = depot_emb + copy_offset[None, :, :].astype(depot_emb.dtype)
        pick_feats = jnp.concatenate([locs[:, :half], locs[:, half:]], axis=-1)
        pick_emb = nn.Dense(
            self.embed_dim, use_bias=self.use_bias, name="init_embed_pick"
        )(pick_feats)
        delivery_emb = nn.Dense(
            self.embed_dim, use_bias=self.use_bias, name="init_embed_delivery"
        )(locs[:, half:])
        return jnp.concatenate([depot_emb, pick_emb, delivery_emb], axis=-2)


class MDCPDPInitEmbedding(nn.Module):
    """Depots; pickups (with paired delivery coords); deliveries
    (reference `init.py:404-430`)."""

    embed_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, instance) -> jax.Array:
        depots = instance["depots"]        # [B, A, 2]
        locs = instance["locs"]            # [B, N, 2]
        half = locs.shape[-2] // 2
        pick_feats = jnp.concatenate([locs[:, :half], locs[:, half:]], axis=-1)
        delivery_feats = locs[:, half:]
        depot_emb = nn.Dense(self.embed_dim, use_bias=self.use_bias, name="init_embed_depot")(depots)
        pick_emb = nn.Dense(self.embed_dim, use_bias=self.use_bias, name="init_embed_pick")(pick_feats)
        delivery_emb = nn.Dense(self.embed_dim, use_bias=self.use_bias, name="init_embed_delivery")(delivery_feats)
        return jnp.concatenate([depot_emb, pick_emb, delivery_emb], axis=-2)


class MTSPInitEmbedding(nn.Module):
    """Depot and city coordinates embedded separately (reference `init.py:363-379`)."""

    embed_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, instance) -> jax.Array:
        locs = instance["locs"]
        depot_emb = nn.Dense(self.embed_dim, use_bias=self.use_bias, name="init_embed_depot")(
            locs[..., 0:1, :]
        )
        node_emb = nn.Dense(self.embed_dim, use_bias=self.use_bias, name="init_embed")(
            locs[..., 1:, :]
        )
        return jnp.concatenate([depot_emb, node_emb], axis=-2)


class MTVRPInitEmbedding(nn.Module):
    """Depot (xy); customers (xy, linehaul, backhaul, tw start/end, service)
    (reference `init.py:525-554`). Disabled-TW inf end-times are zeroed."""

    embed_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, instance) -> jax.Array:
        depot = instance["locs"][:, :1, :]
        cities = instance["locs"][:, 1:, :]
        tw = instance["time_windows"][..., 1:, :]
        tw = jnp.where(tw > 1e17, 0.0, tw)  # [0, inf] -> [0, 0] when TW off
        feats = jnp.concatenate(
            [
                cities,
                instance["demand_linehaul"][..., 1:, None],
                instance["demand_backhaul"][..., 1:, None],
                tw,
                instance["service_time"][..., 1:, None],
            ],
            axis=-1,
        )
        depot_emb = nn.Dense(self.embed_dim, use_bias=self.use_bias, name="init_embed_depot")(depot)
        node_emb = nn.Dense(self.embed_dim, use_bias=self.use_bias, name="init_embed")(feats)
        return jnp.concatenate([depot_emb, node_emb], axis=-2)


class DPPInitEmbedding(nn.Module):
    """Grid-cell coords + distance-from-probe (reference `init.py:283-304`)."""

    embed_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, instance) -> jax.Array:
        keepout = instance["keepout"]
        n = keepout.shape[-1]
        size = int(n ** 0.5)
        xy = jnp.stack(jnp.meshgrid(jnp.arange(size), jnp.arange(size)), axis=-1)
        locs = xy.reshape(-1, 2).astype(jnp.float32) / size
        locs_b = jnp.broadcast_to(locs[None], (keepout.shape[0], n, 2))
        probe_loc = locs[instance["probe"]]  # [B, 2]
        dist = jnp.linalg.norm(locs_b - probe_loc[:, None, :], axis=-1)[..., None]
        half = self.embed_dim // 2
        node = nn.Dense(half, use_bias=self.use_bias, name="init_embed")(locs_b)
        probe = nn.Dense(self.embed_dim - half, use_bias=self.use_bias,
                         name="init_embed_probe")(dist)
        return jnp.concatenate([node, probe], axis=-1)


class MDPPInitEmbedding(nn.Module):
    """Coords + min-distance-to-any-probe (reference `init.py:307-332`)."""

    embed_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, instance) -> jax.Array:
        probe_mask = instance["probe_mask"]
        n = probe_mask.shape[-1]
        size = int(n ** 0.5)
        xy = jnp.stack(jnp.meshgrid(jnp.arange(size), jnp.arange(size)), axis=-1)
        locs = xy.reshape(-1, 2).astype(jnp.float32) / size
        dist = jnp.linalg.norm(locs[:, None] - locs[None, :], axis=-1)  # [N, N]
        dist_b = jnp.where(probe_mask[:, None, :], dist[None], jnp.inf)
        min_dist = dist_b.min(axis=-1)[..., None]  # [B, N, 1]
        locs_b = jnp.broadcast_to(locs[None], (probe_mask.shape[0], n, 2))
        node = nn.Dense(self.embed_dim, use_bias=self.use_bias, name="init_embed")(locs_b)
        probe = nn.Dense(self.embed_dim, use_bias=self.use_bias,
                         name="init_embed_probe_distance")(min_dist)
        return nn.Dense(self.embed_dim, use_bias=self.use_bias, name="project_out")(
            jnp.concatenate([node, probe], axis=-1)
        )


class SVRPInitEmbedding(nn.Module):
    """Depot (xy); customers (xy, required skill) (reference `init.py:283-310`)."""

    embed_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, instance) -> jax.Array:
        depot = instance["depot"][:, None, :]
        feats = jnp.concatenate(
            [instance["locs"], instance["skills"][..., None]], axis=-1
        )
        depot_emb = nn.Dense(self.embed_dim, use_bias=self.use_bias, name="init_embed_depot")(depot)
        node_emb = nn.Dense(self.embed_dim, use_bias=self.use_bias, name="init_embed")(feats)
        return jnp.concatenate([depot_emb, node_emb], axis=-2)


class SMTWTPInitEmbedding(nn.Module):
    """(due time, weight, process time) per job (reference `init.py:382-401`)."""

    embed_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, instance) -> jax.Array:
        feat = jnp.stack(
            [
                instance["job_due_time"],
                instance["job_weight"],
                instance["job_process_time"],
            ],
            axis=-1,
        )
        return nn.Dense(self.embed_dim, use_bias=self.use_bias, name="init_embed")(feat)


class FLPInitEmbedding(nn.Module):
    """xy projection (reference `init.py:557-564`)."""

    embed_dim: int

    @nn.compact
    def __call__(self, instance) -> jax.Array:
        return nn.Dense(self.embed_dim, name="projection")(instance["locs"])


class MCPInitEmbedding(nn.Module):
    """Per-set sum of member-item weight embeddings (reference `init.py:567-576`).

    ``membership`` holds 1-based item ids (0 = pad); padded members contribute
    zero.
    """

    embed_dim: int

    @nn.compact
    def __call__(self, instance) -> jax.Array:
        weights = instance["weights"]          # [B, n_items]
        membership = instance["membership"]    # [B, n_sets, max_size]
        item_emb = nn.Dense(self.embed_dim, name="projection_items")(weights[..., None])
        idx = jnp.clip(membership - 1, 0, weights.shape[-1] - 1)
        gathered = jax.vmap(lambda e, i: e[i])(item_emb, idx)  # [B, S, M, D]
        valid = (membership > 0)[..., None]
        return (gathered * valid).sum(axis=-2)  # [B, n_sets, D]


INIT_EMBEDDING_REGISTRY: dict[str, type] = {
    "atsp": MatNetInitEmbedding,
    "smtwtp": SMTWTPInitEmbedding,
    "svrp": SVRPInitEmbedding,
    "dpp": DPPInitEmbedding,
    "mdpp": MDPPInitEmbedding,
    "mtvrp": MTVRPInitEmbedding,
    "flp": FLPInitEmbedding,
    "mcp": MCPInitEmbedding,
    "tsp": TSPInitEmbedding,
    "shpp": TSPInitEmbedding,
    "mtsp": MTSPInitEmbedding,
    "cvrptw": VRPTWInitEmbedding,
    "pdp": PDPInitEmbedding,
    "mdcpdp": MDCPDPInitEmbedding,
    "mpdp": MPDPInitEmbedding,
    "cvrp": VRPInitEmbedding,
    "cvrpmvc": VRPInitEmbedding,
    "sdvrp": VRPInitEmbedding,
    "op": OPInitEmbedding,
    "pctsp": PCTSPInitEmbedding,
    "spctsp": PCTSPInitEmbedding,
}


def env_init_embedding(env_name: str, embed_dim: int, **kwargs) -> nn.Module:
    cls = INIT_EMBEDDING_REGISTRY.get(env_name)
    if cls is None:
        raise ValueError(
            f"No init embedding for env '{env_name}'. Available: {sorted(INIT_EMBEDDING_REGISTRY)}"
        )
    return cls(embed_dim=embed_dim, **kwargs)
