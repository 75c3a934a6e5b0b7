"""MatNet policy for FFSP scheduling.

Reference `rl4co/models/zoo/matnet/decoder.py:49-149` (`MatNetFFSPDecoder`:
job-embedding K/V with an extra learned no-job row for the wait action) and
`rl4co/models/nn/env_embeddings/context.py:77-103` (`FFSPContext`: current
stage-machine embedding + learned stage embedding).

Each stage's job×machine duration matrix is encoded by the MatNet dual
row/col blocks; at decode time the per-instance (stage, machine) pointer
selects a job or the wait action.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from rl4co_tpu.models.nn.attention import PointerAttention
from rl4co_tpu.models.policies.constructive import ConstructivePolicy
from rl4co_tpu.models.zoo.matnet import MatNetLayer


@struct.dataclass
class FFSPCache:
    job_embs: jax.Array   # [B, S, J+1, D] (no-job row appended)
    ma_embs: jax.Array    # [B, S, M, D]
    glimpse_k: jax.Array  # [B, S, J+1, D]
    glimpse_v: jax.Array  # [B, S, J+1, D]
    logit_k: jax.Array    # [B, S, J+1, D]


class MatNetFFSPPolicy(ConstructivePolicy):
    env_name: str = "ffsp"
    num_stage: int = 2
    num_machine: int = 3
    embed_dim: int = 64
    num_heads: int = 4
    num_encoder_layers: int = 2
    feedforward_hidden: int = 128
    normalization: str = "instance"
    scaling_factor: float = 10.0
    mask_inner: bool = True

    def setup(self):
        self.matnet_layers = [
            MatNetLayer(
                self.embed_dim, self.num_heads,
                feedforward_hidden=self.feedforward_hidden,
                normalization=self.normalization,
                name=f"matnet_layer_{i}",
            )
            for i in range(self.num_encoder_layers)
        ]
        self.no_job_emb = self.param(
            "no_job_emb", nn.initializers.uniform(1.0), (self.embed_dim,)
        )
        self.stage_emb = self.param(
            "stage_emb", nn.initializers.uniform(1.0),
            (self.num_stage, self.embed_dim),
        )
        self.project_node_embeddings = nn.Dense(3 * self.embed_dim, use_bias=False)
        self.project_context = nn.Dense(self.embed_dim, use_bias=False)
        self.pointer = PointerAttention(
            self.embed_dim, self.num_heads,
            mask_inner=self.mask_inner, out_bias=True,
        )

    def encode(self, instances) -> Any:
        run_time = instances["run_time"].astype(jnp.float32)  # [B, J, M_total]
        b, j, m_total = run_time.shape
        s, m = self.num_stage, self.num_machine
        dmat = run_time.reshape(b, j, s, m).transpose(0, 2, 1, 3)  # [B, S, J, M]
        dmat = dmat.reshape(b * s, j, m) / self.scaling_factor
        row = jnp.zeros((b * s, j, self.embed_dim))
        col = jnp.broadcast_to(
            jnp.eye(m, self.embed_dim)[None], (b * s, m, self.embed_dim)
        )
        for layer in self.matnet_layers:
            row, col = layer(row, col, dmat)
        job_embs = row.reshape(b, s, j, self.embed_dim)
        ma_embs = col.reshape(b, s, m, self.embed_dim)
        no_job = jnp.broadcast_to(
            self.no_job_emb[None, None, None, :], (b, s, 1, self.embed_dim)
        )
        job_embs = jnp.concatenate([job_embs, no_job], axis=2)  # [B, S, J+1, D]
        return job_embs, ma_embs

    def precompute(self, embeddings) -> FFSPCache:
        job_embs, ma_embs = embeddings
        proj = self.project_node_embeddings(job_embs)
        gk, gv, lk = jnp.split(proj, 3, axis=-1)
        return FFSPCache(
            job_embs=job_embs, ma_embs=ma_embs,
            glimpse_k=gk, glimpse_v=gv, logit_k=lk,
        )

    def decode_step(self, cache: FFSPCache, state, mask, num_repeats: int = 1):
        assert num_repeats == 1, "FFSP grouped decode not yet supported"
        b = mask.shape[0]
        bidx = jnp.arange(b)
        stage = state.stage_idx
        ma = state.stage_machine_idx
        gk = cache.glimpse_k[bidx, stage]   # [B, J+1, D]
        gv = cache.glimpse_v[bidx, stage]
        lk = cache.logit_k[bidx, stage]
        ma_emb = cache.ma_embs[bidx, stage, ma]          # [B, D]
        stage_e = self.stage_emb[stage]                  # [B, D]
        query = self.project_context(
            jnp.concatenate([ma_emb, stage_e], axis=-1)
        )
        # env action order is [wait, job_0..job_J-1]; pointer rows are
        # [job_0..job_J-1, no_job] -> roll the mask/logits accordingly
        pointer_mask = jnp.concatenate([mask[:, 1:], mask[:, :1]], axis=-1)
        logits = self.pointer(query, gk, gv, lk, pointer_mask)
        return jnp.concatenate([logits[:, -1:], logits[:, :-1]], axis=-1)
