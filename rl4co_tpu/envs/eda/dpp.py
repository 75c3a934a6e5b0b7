"""Decap Placement Problem (DPP / multi-port MDPP) — EDA environments.

TPU-native re-design of `rl4co/envs/eda/dpp/env.py:17-243` (`DPPEnv`,
DevFormer) and `rl4co/envs/eda/mdpp/env.py:14-149` (`MDPPEnv`): place up to
``max_decaps`` decoupling capacitors on a ``size × size`` power-distribution
grid (minus probe + keepout cells) to maximize impedance suppression at the
probing port(s). Reward = Σ_f (|Z_initial(f)| − |Z_final(f)|)·1e9/f / 10 via
the Schur-complement decap simulation (`dpp/env.py:160-228`), fully on
device (batched `jnp.linalg.inv` over frequencies).

The reference downloads measured PDN data (`dpp/generator.py:118-137`);
this build synthesizes a physically-plausible SPD impedance model from a
fixed seed (documented deviation — zero-egress environment).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from rl4co_tpu.envs.base import Env, Instance
from rl4co_tpu.utils.ops import inverse_permutation, mark_where_in, set_at


@functools.lru_cache(maxsize=4)
def synthetic_pdn(size: int, num_freq: int, seed: int = 0):
    """Synthetic PDN impedance tensor [num_freq, size², size²] + freqs.

    SPD mesh-like model whose magnitude falls off with frequency — stands in
    for the reference's measured 10×10 chip data.
    """
    rng = np.random.default_rng(seed)
    n = size * size
    freqs = np.linspace(1e8, 2e10, num_freq).astype(np.float32)
    a = rng.normal(size=(n, n)).astype(np.float32) / np.sqrt(n)
    base = a @ a.T + 0.5 * np.eye(n, dtype=np.float32)
    # spatial coupling decays with grid distance
    xy = np.stack(np.meshgrid(np.arange(size), np.arange(size)), -1).reshape(-1, 2)
    dist = np.linalg.norm(xy[:, None] - xy[None, :], axis=-1)
    base = base * np.exp(-dist / size)
    scale = (1e9 / freqs) ** 0.5
    pdn = (base[None] * scale[:, None, None] / 50.0).astype(np.float32)
    return jnp.asarray(pdn), jnp.asarray(freqs)


@functools.lru_cache(maxsize=2)
def load_pdn_data(
    data_dir: str,
    chip_file: str = "10x10_pkg_chip.npy",
    decap_file: str = "01nF_decap.npy",
    freq_file: str = "freq_201.npy",
):
    """Load the reference's measured PDN data files if present
    (`dpp/generator.py:125-137`; the reference downloads them — this build is
    zero-egress, so the user supplies ``data_dir``). Returns
    (raw_pdn [F, n, n], freqs [F], decap [F, 1, 1]) as jnp complex64/float32.
    """
    import os

    def _load(fname):
        path = os.path.join(data_dir, fname)
        if not os.path.isfile(path):
            raise FileNotFoundError(
                f"DPP data file {path!r} not found; download the reference "
                "dataset or use the synthetic PDN (data_dir=None)."
            )
        return np.load(path)

    raw_pdn = jnp.asarray(_load(chip_file)).astype(jnp.complex64)
    decap = jnp.asarray(_load(decap_file)).astype(jnp.complex64)
    freqs = jnp.asarray(_load(freq_file)).astype(jnp.float32)
    return raw_pdn, freqs, decap


@struct.dataclass
class DPPState:
    locs: jax.Array      # [N, 2] grid coords normalized
    probe: jax.Array     # i32 (DPP) or bool[N] probe mask (MDPP uses probes)
    keepout: jax.Array   # bool [N]
    placed: jax.Array    # bool [N]
    i: jax.Array
    done: jax.Array

    @property
    def current_node(self):
        return jnp.zeros_like(self.i)


@dataclasses.dataclass(frozen=True)
class DPP(Env):
    name = "dpp"
    size: int = 10
    max_decaps: int = 20
    num_keepout_min: int = 1
    num_keepout_max: int = 50
    num_freq: int = 50
    pdn_seed: int = 0
    # Path to the reference's measured PDN data (10x10_pkg_chip.npy etc.,
    # `dpp/generator.py:48-51`). None -> synthetic PDN.
    data_dir: str | None = None

    @property
    def n(self) -> int:
        return self.size * self.size

    def _pdn(self):
        """(pdn [F, n, n], freqs [F], decap [F, 1, 1] or None)."""
        if self.data_dir is not None:
            pdn, freqs, decap = load_pdn_data(self.data_dir)
            assert pdn.shape[-1] == self.n, (
                f"PDN data is {pdn.shape[-1]} nodes; env size²={self.n}"
            )
            return pdn, freqs, decap
        pdn, freqs = synthetic_pdn(self.size, self.num_freq, self.pdn_seed)
        return pdn, freqs, None

    def _grid_locs(self) -> jax.Array:
        m = self.size
        xy = jnp.stack(jnp.meshgrid(jnp.arange(m), jnp.arange(m)), axis=-1)
        return xy.reshape(-1, 2).astype(jnp.float32) / m

    def generate(self, key: jax.Array) -> Instance:
        kp, kn, kk = jax.random.split(key, 3)
        probe = jax.random.randint(kp, (), 0, self.n)
        num_keepout = jax.random.randint(
            kn, (), self.num_keepout_min, self.num_keepout_max
        )
        scores = jax.random.uniform(kk, (self.n,))
        scores = set_at(scores, probe, -1.0)  # probe can't be keepout
        order = jnp.argsort(-scores)
        rank = inverse_permutation(order)
        keepout = rank < num_keepout
        return {"probe": probe.astype(jnp.int32), "keepout": keepout}

    def reset(self, instance: Instance) -> DPPState:
        keepout = set_at(instance["keepout"], instance["probe"], True)
        return DPPState(
            locs=self._grid_locs(),
            probe=instance["probe"],
            keepout=keepout,
            placed=jnp.zeros((self.n,), bool),
            i=jnp.int32(0),
            done=jnp.bool_(False),
        )

    def step(self, state: DPPState, action: jax.Array) -> DPPState:
        action = action.astype(jnp.int32)
        placed = set_at(state.placed, action, True)
        new = state.replace(
            placed=placed,
            i=state.i + 1,
            done=state.i >= self.max_decaps - 1,
        )
        return jax.tree_util.tree_map(
            lambda n_, o: jnp.where(state.done, o, n_), new, state
        )

    def action_mask(self, state: DPPState) -> jax.Array:
        mask = ~(state.keepout | state.placed)
        pad = jnp.zeros_like(mask).at[0].set(True)
        return jnp.where(state.done, pad, mask)

    def _decap_impedance(self, placed_idx: jax.Array, probe: jax.Array) -> jax.Array:
        """|Z_final(f)| at the probe after placing decaps (Schur complement;
        reference `dpp/env.py:160-196`)."""
        pdn, freqs, decap = self._pdn()
        k = placed_idx.shape[0]
        # order nodes: non-placed first (stable by index)
        placed_mask = mark_where_in(jnp.zeros((self.n,), bool), placed_idx, True)
        order = jnp.argsort(placed_mask, stable=True)  # non-placed first
        a_idx = order[: self.n - k]
        z1aa = pdn[:, a_idx[:, None], a_idx[None, :]]
        z1ap = pdn[:, a_idx[:, None], placed_idx[None, :]]
        z1pa = pdn[:, placed_idx[:, None], a_idx[None, :]]
        z1pp = pdn[:, placed_idx[:, None], placed_idx[None, :]]
        if decap is not None:
            # measured decap impedance (`dpp/env.py:160-178` uses the loaded
            # 01nF decap model directly)
            z2 = jnp.eye(k, dtype=decap.dtype)[None] * decap
        else:
            # synthetic: decap impedance ~ 1/(2π f C), C = 1nF
            zc = 1.0 / (2 * jnp.pi * freqs * 1e-9)
            z2 = jnp.eye(k)[None] * zc[:, None, None] / 50.0
        zout = z1aa - z1ap @ jnp.linalg.inv(z1pp + z2.astype(z1pp.dtype)) @ z1pa
        # probe position within the reduced index set
        probe_pos = (a_idx == probe).argmax()
        return jnp.abs(zout[:, probe_pos, probe_pos])

    def reward(self, state: DPPState, actions: jax.Array) -> jax.Array:
        # reference `dpp/env.py:197-228`
        pdn, freqs, _ = self._pdn()
        placed = actions[: self.max_decaps].astype(jnp.int32)
        z_init = jnp.abs(pdn[:, state.probe, state.probe])
        z_final = self._decap_impedance(placed, state.probe)
        gap = (z_init - z_final) * 1e9 / freqs
        return gap.sum() / 10.0

    @property
    def num_actions(self) -> int:
        return self.n

    @property
    def max_steps(self) -> int:
        return self.max_decaps

    def check_solution_validity(self, instance: Instance, actions) -> None:
        actions = np.asarray(actions)[: self.max_decaps]
        assert len(np.unique(actions)) == len(actions), "Duplicate decap placement"
        keepout = np.asarray(instance["keepout"])
        assert not keepout[actions].any(), "Decap placed in keepout region"
        assert int(instance["probe"]) not in actions.tolist(), "Decap at probe"


@dataclasses.dataclass(frozen=True)
class MDPP(DPP):
    """Multi-port DPP (reference `rl4co/envs/eda/mdpp/env.py:14-149`):
    2-5 probing ports; reward aggregated over ports (sum or minmax)."""

    name = "mdpp"
    num_probes_min: int = 2
    num_probes_max: int = 5
    reward_type: str = "minmax"  # minmax | meansum

    def generate(self, key: jax.Array) -> Instance:
        kp, kn, kk, kc = jax.random.split(key, 4)
        num_probes = jax.random.randint(
            kp, (), self.num_probes_min, self.num_probes_max + 1
        )
        scores = jax.random.uniform(kc, (self.n,))
        order = jnp.argsort(-scores)
        rank = inverse_permutation(order)
        probe_mask = rank < num_probes
        num_keepout = jax.random.randint(
            kn, (), self.num_keepout_min, self.num_keepout_max
        )
        kscores = jax.random.uniform(kk, (self.n,))
        kscores = jnp.where(probe_mask, -1.0, kscores)
        korder = jnp.argsort(-kscores)
        krank = inverse_permutation(korder)
        keepout = krank < num_keepout
        return {"probe_mask": probe_mask, "keepout": keepout}

    def reset(self, instance: Instance) -> DPPState:
        keepout = instance["keepout"] | instance["probe_mask"]
        # store the probe set as a padded index list via the mask; the probe
        # field keeps the first probe for DPP-compat
        first_probe = instance["probe_mask"].argmax().astype(jnp.int32)
        return DPPState(
            locs=self._grid_locs(),
            probe=first_probe,
            keepout=keepout,
            placed=jnp.zeros((self.n,), bool),
            i=jnp.int32(0),
            done=jnp.bool_(False),
        ).replace(probe=first_probe), instance["probe_mask"]

    # MDPP overrides the batched API to carry the probe mask alongside state
    def reset_batch(self, instances: Instance):
        states, probe_masks = jax.vmap(self.reset)(instances)
        return states.replace(probe=probe_masks)  # probe := bool mask [B, N]

    def action_mask_batch(self, state) -> jax.Array:
        mask = ~(state.keepout | state.placed)
        pad = jnp.zeros_like(mask).at[..., 0].set(True)
        return jnp.where(state.done[:, None], pad, mask)

    def step_batch(self, state, action):
        placed = jax.vmap(lambda p, a: set_at(p, a, True))(
            state.placed, action.astype(jnp.int32)
        )
        done = state.i >= self.max_decaps - 1
        return state.replace(
            placed=jnp.where(state.done[:, None], state.placed, placed),
            i=jnp.where(state.done, state.i, state.i + 1),
            done=state.done | done,
        )

    def reward_batch(self, state, actions) -> jax.Array:
        pdn, freqs, decap = self._pdn()

        def one(probe_mask, acts):
            placed = acts[: self.max_decaps].astype(jnp.int32)
            k = self.max_decaps
            placed_mask = mark_where_in(jnp.zeros((self.n,), bool), placed, True)
            order = jnp.argsort(placed_mask, stable=True)
            a_idx = order[: self.n - k]
            z1aa = pdn[:, a_idx[:, None], a_idx[None, :]]
            z1ap = pdn[:, a_idx[:, None], placed[None, :]]
            z1pa = pdn[:, placed[:, None], a_idx[None, :]]
            z1pp = pdn[:, placed[:, None], placed[None, :]]
            if decap is not None:
                z2 = jnp.eye(k, dtype=decap.dtype)[None] * decap
            else:
                zc = 1.0 / (2 * jnp.pi * freqs * 1e-9)
                z2 = jnp.eye(k)[None] * zc[:, None, None] / 50.0
            zout = z1aa - z1ap @ jnp.linalg.inv(z1pp + z2.astype(z1pp.dtype)) @ z1pa
            z_final_diag = jnp.abs(jnp.diagonal(zout, axis1=1, axis2=2))  # [F, N-K]
            z_init_all = jnp.abs(jnp.diagonal(pdn, axis1=1, axis2=2))     # [F, N]
            # reward per remaining node, scattered back to full index space
            gap = ((z_init_all[:, a_idx] - z_final_diag) * (1e9 / freqs)[:, None]).sum(0) / 10.0
            hit = jnp.arange(self.n)[:, None] == a_idx[None, :]  # [N, N-K]
            rewards = jnp.where(
                hit.any(axis=1), (hit * gap[None, :]).sum(axis=1), -jnp.inf
            )
            masked = jnp.where(probe_mask, rewards, jnp.inf)
            if self.reward_type == "minmax":
                return jnp.min(masked)
            return jnp.where(probe_mask, rewards, 0.0).sum() / probe_mask.sum()

        return jax.vmap(one)(state.probe, actions)
