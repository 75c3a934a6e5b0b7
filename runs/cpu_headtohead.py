#!/usr/bin/env python
"""Same-hardware head-to-head: eager-torch AM rollout vs our jitted scan.

BASELINE.md's A100 denominator is an *estimate* (the reference's
torch-CUDA stack is absent here and it publishes no numbers). This script
adds the one measurement that needs no generational credit: both designs
on the SAME host CPU, same model shape, same protocol.

- torch side: the reference's architecture and decode pattern — Kool et
  al. 2019 AM (3-layer MHA encoder, cached K/V pointer decoder) driven by
  a per-token Python loop, exactly the structure of
  `/root/reference/rl4co/models/common/constructive/base.py:226-238`
  (while-not-done: evaluate decoder, mask, select) — in eager float32
  under `torch.no_grad`. NOTE this is a *favorable* stand-in for the real
  reference, which adds TensorDict env stepping and Lightning overhead on
  top of the same ops (it could only be slower); the measured ratio is
  therefore conservative.
- jax side: this framework's actual `rollout` (single `lax.scan`,
  grouped pointer decode) on the CPU backend, float32, greedy.

Run:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python runs/cpu_headtohead.py
Writes runs/cpu_headtohead.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

BATCH = int(os.environ.get("H2H_BATCH", 64))
NUM_LOC = int(os.environ.get("H2H_NUM_LOC", 100))
ITERS = int(os.environ.get("H2H_ITERS", 5))
EMBED, HEADS, LAYERS, FF = 128, 8, 3, 512


# ---------------- torch side (reference pattern, eager) ----------------

def bench_torch() -> float:
    import torch
    import torch.nn as nn

    torch.manual_seed(0)
    d, h = EMBED, HEADS

    class EncoderLayer(nn.Module):
        # reference MHA+FFN+BN encoder block (`nn/graph/attnnet.py`)
        def __init__(self):
            super().__init__()
            self.mha = nn.MultiheadAttention(d, h, batch_first=True)
            self.bn1 = nn.BatchNorm1d(d)
            self.ff = nn.Sequential(nn.Linear(d, FF), nn.ReLU(),
                                    nn.Linear(FF, d))
            self.bn2 = nn.BatchNorm1d(d)

        def forward(self, x):
            hx = x + self.mha(x, x, x, need_weights=False)[0]
            hx = self.bn1(hx.reshape(-1, d)).reshape(hx.shape)
            hx = hx + self.ff(hx)
            return self.bn2(hx.reshape(-1, d)).reshape(hx.shape)

    class AM(nn.Module):
        def __init__(self):
            super().__init__()
            self.init_embed = nn.Linear(2, d)
            self.layers = nn.ModuleList(EncoderLayer() for _ in range(LAYERS))
            self.project_node = nn.Linear(d, 3 * d, bias=False)
            self.project_context = nn.Linear(d, d, bias=False)
            self.project_step = nn.Linear(2 * d, d, bias=False)
            self.glimpse_out = nn.Linear(d, d, bias=False)

        def forward(self, locs):
            # encode once per instance
            x = self.init_embed(locs)
            for layer in self.layers:
                x = layer(x)
            gk, gv, lk = self.project_node(x).chunk(3, dim=-1)
            graph = self.project_context(x.mean(1))
            B, N, _ = x.shape
            visited = torch.zeros(B, N, dtype=torch.bool)
            first = cur = None
            tours = []
            dh = d // h
            for _t in range(N):  # the reference's per-token Python loop
                if cur is None:
                    step_ctx = torch.zeros(B, d)
                else:
                    step_ctx = self.project_step(
                        torch.cat([x[torch.arange(B), first],
                                   x[torch.arange(B), cur]], dim=-1))
                q = (graph + step_ctx).view(B, 1, h, dh).transpose(1, 2)
                k = gk.view(B, N, h, dh).transpose(1, 2)
                v = gv.view(B, N, h, dh).transpose(1, 2)
                logits = (q @ k.transpose(-1, -2)) / math.sqrt(dh)
                logits = logits.masked_fill(
                    visited[:, None, None, :], -torch.inf)
                glimpse = (torch.softmax(logits, -1) @ v)
                glimpse = self.glimpse_out(
                    glimpse.transpose(1, 2).reshape(B, 1, d))
                scores = (glimpse @ lk.transpose(-1, -2)).squeeze(1) \
                    / math.sqrt(d)
                scores = 10.0 * torch.tanh(scores)  # tanh clipping 10
                scores = scores.masked_fill(visited, -torch.inf)
                nxt = scores.argmax(-1)  # greedy
                tours.append(nxt)
                visited[torch.arange(B), nxt] = True
                cur = nxt
                if first is None:
                    first = nxt
            tour = torch.stack(tours, 1)
            idx = tour[..., None].expand(-1, -1, 2)
            path = locs.gather(1, idx)
            return (path.roll(-1, 1) - path).norm(dim=-1).sum(-1)

    model = AM().eval()
    locs = torch.rand(BATCH, NUM_LOC, 2)
    with torch.no_grad():
        model(locs)  # warmup
        t0 = time.perf_counter()
        for _ in range(ITERS):
            cost = model(locs)
        dt = time.perf_counter() - t0
    assert torch.isfinite(cost).all()
    return BATCH * NUM_LOC * ITERS / dt


# ---------------- jax side (this framework) ----------------

def bench_jax() -> float:
    import jax
    import numpy as np

    from rl4co_tpu.decoding import DecodeSpec
    from rl4co_tpu.envs import get_env
    from rl4co_tpu.models import AttentionModelPolicy, rollout
    from rl4co_tpu.models.policies.constructive import init_policy_params

    env = get_env("tsp", num_loc=NUM_LOC)
    policy = AttentionModelPolicy(env_name="tsp")
    params = init_policy_params(policy, env, jax.random.PRNGKey(0))
    instances = env.generate_batch(jax.random.PRNGKey(1), BATCH)
    spec = DecodeSpec(kind="greedy", tanh_clipping=10.0)  # f32, like torch

    @jax.jit
    def fwd(params, instances, key):
        return rollout(policy, params, env, instances, key, spec).reward

    key = jax.random.PRNGKey(2)
    np.asarray(fwd(params, instances, key))  # compile + warmup
    t0 = time.perf_counter()
    for i in range(ITERS):
        r = fwd(params, instances, jax.random.fold_in(key, i))
    np.asarray(r)
    dt = time.perf_counter() - t0
    return BATCH * NUM_LOC * ITERS / dt


def _fit_intercept(batches, call_times):
    """Least-squares t_call = intercept + slope * B. The intercept is the
    batch-independent per-call overhead (Python dispatch, per-op launch,
    masking bookkeeping) — the resource that binds accelerator decode
    loops, where per-op *compute* is thousands of times faster than on
    this CPU but the overhead is not."""
    n = len(batches)
    sx = sum(batches); sy = sum(call_times)
    sxx = sum(b * b for b in batches); sxy = sum(b * t for b, t in zip(batches, call_times))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return (sy - slope * sx) / n, slope


def main():
    global BATCH, ITERS
    sweep = [int(b) for b in
             os.environ.get("H2H_SWEEP", "1,4,16,64,256").split(",")]
    rows = []
    for b in sweep:
        BATCH = b
        ITERS = max(2, min(8, 512 // max(b, 1)))
        t = bench_torch()
        j = bench_jax()
        rows.append({
            "batch": b,
            "torch_env_steps_per_s": round(t, 1),
            "jax_env_steps_per_s": round(j, 1),
            "torch_ms_per_call": round(1e3 * b * NUM_LOC / t, 2),
            "jax_ms_per_call": round(1e3 * b * NUM_LOC / j, 2),
            "ratio_jax_over_torch": round(j / t, 2),
        })
        print(json.dumps(rows[-1]), flush=True)
    ti, ts = _fit_intercept([r["batch"] for r in rows],
                            [r["torch_ms_per_call"] for r in rows])
    ji, js = _fit_intercept([r["batch"] for r in rows],
                            [r["jax_ms_per_call"] for r in rows])
    out = {
        "what": ("same-host CPU head-to-head, greedy AM-128 rollout on "
                 f"TSP-{NUM_LOC}, float32, batch sweep"),
        "rows": rows,
        "fit": {
            "model": "ms_per_call = intercept + slope * batch",
            "torch_intercept_ms": round(ti, 2),
            "torch_slope_ms_per_inst": round(ts, 4),
            "jax_intercept_ms": round(ji, 2),
            "jax_slope_ms_per_inst": round(js, 4),
            "overhead_intercept_ratio_torch_over_jax":
                round(ti / ji, 1) if ji > 0 else None,
        },
        "reading": (
            "At compute-bound batches the two stacks tie (same BLAS-class "
            "FLOPs; the JAX compute path has no per-op deficit). The "
            "intercepts measure the batch-independent per-call overhead of "
            "each design — ~100 sequential Python/eager decoder iterations "
            "vs one compiled lax.scan dispatch. On an accelerator the slope "
            "term shrinks by the hardware speedup while the intercept does "
            "not: the reference's A100 throughput is intercept-bound "
            "(BASELINE.md step 2), ours is slope-bound."
        ),
        "caveats": [
            "torch side is a faithful but *minimal* Kool decode loop; the "
            "real reference adds TensorDict/Lightning overhead on the same "
            "ops, so torch overhead here is a lower bound",
            f"host has {os.cpu_count()} CPUs; absolute numbers are not "
            "comparable across machines — only the intercept/slope split",
        ],
        "cpu_count": os.cpu_count(),
    }
    print(json.dumps(out["fit"], indent=1))
    with open(os.path.join(ROOT, "runs", "cpu_headtohead.json"), "w") as f:
        json.dump(out, f, indent=2)
    print("WROTE runs/cpu_headtohead.json")


if __name__ == "__main__":
    main()
