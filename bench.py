"""Headline benchmark: env-steps/s/chip on TSP-100 AM, rollout + train step.

Two measured quantities (BASELINE.md north star is *training* throughput):

1. rollout: the reference's `multistart_greedy` evaluation protocol
   (`rl4co/tasks/eval.py:350-377`) — one batch of 256 instances decodes
   25,600 trajectories of length 100. The untiled-cache grouped decode
   shares each instance's K/V across its 100 starts (starts become the
   MXU's M dimension).
2. train: the full jitted REINFORCE train step (on-device data generation,
   sampling rollout, rollout-baseline greedy re-rollout, backward, Adam) in
   bf16-mixed — the reference recipe's per-step work. env-steps counts the
   *training* trajectories only (batch × N), matching the reference's
   samples/epoch accounting; the baseline rollout is uncounted overhead.

Robustness (round-2 postmortem — BENCH_r02.json was rc=124 with no output
because one slow remote compile blocked everything): each phase now runs in
its own subprocess under a hard wall-clock budget, a partial JSON line is
printed and flushed the moment the rollout phase finishes, and the final
combined line prints last (the driver parses the tail). A phase that blows
its budget is reported as {"skipped": "compile budget"} instead of killing
the whole benchmark. The persistent compile cache (JAX_COMPILATION_CACHE_DIR)
makes reruns fast once either phase has succeeded once.

``vs_baseline`` divides the train-step number by an A100 ESTIMATE (the
reference publishes no measured numbers and its torch/tensordict stack is
not installed here — see BASELINE.md); ``baseline_kind`` marks it as such.

Output contract (ADVICE r4 #2): lines are flushed as soon as each phase
finishes for crash robustness, so the rollout metric can appear twice
(budget-miss note first, retry success second). Consumers must key on the
``metric`` field and take the LAST line per metric; the driver's
tail-parse does exactly this.
"""

import json
import os
import subprocess
import sys
import time

# Durable in-repo compile cache (VERDICT r3 #2: /tmp was cold in the
# driver's capture window two rounds running). A priming `python bench.py`
# late in the round leaves both phases' executables here for the driver.
_REPO = os.path.dirname(os.path.abspath(__file__))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(_REPO, "runs", "jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

# ESTIMATE of the reference's A100 throughput: no measured number exists
# (BASELINE.md: "published": {}; torch stack absent here). Derivation —
# documented in BASELINE.md "A100 denominator" — anchors on Kool et al.
# 2019 (the method the reference implements): 27:32 min/epoch for TSP-100
# at 1.28M samples/epoch on a single 1080Ti = 77.5k env-steps/s; an A100
# with modern torch is credited 2x on this kernel-launch-bound Python
# decode loop (per-token kernel launches dominate, so the 10x raw-FLOPs
# gap does not materialize) -> ~150k env-steps/s.
A100_ESTIMATE_ENV_STEPS_PER_S = 150_000.0

# (overridable via RL4CO_BENCH_* for CPU smoke tests of the harness itself)
BATCH = int(os.environ.get("RL4CO_BENCH_BATCH", 256))
NUM_STARTS = int(os.environ.get("RL4CO_BENCH_STARTS", 100))
NUM_LOC = int(os.environ.get("RL4CO_BENCH_NUM_LOC", 100))
ITERS = int(os.environ.get("RL4CO_BENCH_ITERS", 10))
TRAIN_BATCH = int(os.environ.get("RL4CO_BENCH_TRAIN_BATCH", 512))
# Steps fused per dispatch (lax.scan superstep). 125 matches the production
# Trainer's in-epoch regime (steps_per_epoch=2500, log_every=200 -> largest
# divisor 125); round-3 measured 46 ms/step at chunk=10 (dispatch-bound on
# the axon tunnel) vs 19 ms/step in-epoch — the chunk, not the model, was
# the gap (VERDICT r3 weak #1).
TRAIN_CHUNK = int(os.environ.get("RL4CO_BENCH_TRAIN_CHUNK", 125))
TRAIN_DISPATCHES = int(os.environ.get("RL4CO_BENCH_TRAIN_DISPATCHES", 2))

# TPU v5e ("v5 lite") single-chip peaks, for MFU / roofline accounting
# (public spec: 197 TFLOP/s bf16, 819 GB/s HBM, 16 GB). Ridge point
# ~240 FLOP/byte: programs below it are HBM-bound at best.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_BYTES_PER_S = 819e9


def am_flops_per_env_step(phase: str, n=None, d=128, h=8, ff=512, layers=3):
    """Analytic FLOPs per counted env-step for the AM policy (2·MAC convention).

    Mirrors the actual program structure (encoder once per instance, cached
    K/V decoder per token — `models/policies/constructive.py`), so it is the
    denominator-of-record for MFU; XLA's `compiled.cost_analysis()` is
    reported alongside as a cross-check (it counts `lax.scan` bodies once,
    so it undercounts scanned programs by ~the trip count).

      encoder(N) = L·(4·N·d²·2 [QKV+out] + 2·N²·d·2 [scores+mix]
                   + 2·N·d·ff·2 [FFN]) + 2·N·2·d [coord embed]
      decode/token ≈ 3·d²·2 [amortized K/V/logit-K precompute]
                   + 4·d²·2 [context+glimpse Q/out projections]
                   + 3·N·d·2 [glimpse scores+mix, pointer logits]

    rollout phase counts B·S·N env-steps (encoder amortized over S·N);
    train phase counts B·N and runs sampling fwd + backward (≈2× fwd) +
    rollout-baseline greedy fwd ≈ 4× one fwd.
    """
    n = n if n is not None else NUM_LOC
    enc = layers * (4 * n * d * d * 2 + 2 * n * n * d * 2 + 2 * n * d * ff * 2)
    enc += 2 * n * 2 * d
    dec = 3 * d * d * 2 + 4 * d * d * 2 + 3 * n * d * 2
    if phase == "rollout":
        return enc / (NUM_STARTS * n) + dec
    if phase == "train":
        return 4.0 * (enc / n + dec)
    raise ValueError(phase)


def xla_cost_analysis(jitted, *args):
    """Best-effort XLA cost analysis of a compiled executable (flops/bytes).

    On the axon remote backend the executable may not expose cost analysis;
    degrade to the HLO-level estimate, then to None (never fail the bench).
    """
    try:
        compiled = jitted.lower(*args).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        out = {}
        if ca.get("flops"):
            out["flops"] = float(ca["flops"])
        if ca.get("bytes accessed"):
            out["bytes_accessed"] = float(ca["bytes accessed"])
        return out or None
    except Exception:
        return None


# Hard per-phase wall-clock budgets (compile + run). The driver's overall
# budget is ~10 min; keep rollout + train + overhead safely inside it.
# Phases share a deadline: a fast rollout phase donates its leftover budget
# to the train phase (the axon tunnel's compile latency varies 5-10x
# between healthy and loaded windows — round-3 measurements: 65 s to
# 280 s for the identical program). The rollout phase gets the bigger
# slice: it is the BASELINE.json headline metric and was the one eaten by
# cold compiles in rounds 2-3; a warm rerun of either phase is <30 s.
TOTAL_BUDGET_S = 560.0
PHASE_BUDGET_S = {"rollout": 420.0, "train": 420.0}


def bench_rollout():
    import jax
    import numpy as np

    from rl4co_tpu.decoding import DecodeSpec
    from rl4co_tpu.envs import get_env
    from rl4co_tpu.models import AttentionModelPolicy, rollout
    from rl4co_tpu.models.policies.constructive import init_policy_params
    from rl4co_tpu.utils.dtype import cast_floating

    env = get_env("tsp", num_loc=NUM_LOC)
    policy = AttentionModelPolicy(env_name="tsp")

    # Param init + data gen run dozens of tiny jit programs; on the axon
    # remote-compile tunnel each round-trip costs seconds (round-2/3
    # postmortem: ~60 s of wall just for init). Run them on the in-process
    # CPU backend and ship the arrays over once.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = cast_floating(init_policy_params(policy, env, jax.random.PRNGKey(0)))
        instances = env.generate_batch(jax.random.PRNGKey(1), BATCH)
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    instances = jax.device_put(instances, dev)

    spec = DecodeSpec(
        kind="greedy", multistart=True, num_starts=NUM_STARTS, tanh_clipping=10.0
    )

    @jax.jit
    def fwd(params, instances, key):
        return rollout(policy, params, env, instances, key, spec).reward

    key = jax.random.PRNGKey(2)
    # NOTE: fetch to host for timing — on the axon platform
    # block_until_ready does not actually block.
    np.asarray(fwd(params, instances, key))  # compile + warmup
    t0 = time.perf_counter()
    for i in range(ITERS):
        reward = fwd(params, instances, jax.random.fold_in(key, i))
    np.asarray(reward)
    dt = time.perf_counter() - t0
    rate = BATCH * NUM_STARTS * NUM_LOC * ITERS / dt
    extra = {
        "ms_per_call": round(1e3 * dt / ITERS, 2),
        **_mfu_fields("rollout", rate),
    }
    # flush before the best-effort cost analysis (r5 review finding #2)
    print(json.dumps({"phase": "rollout", "rate": rate, "extra": extra}),
          flush=True)
    xla = xla_cost_analysis(fwd, params, instances, key)
    if xla:
        # caveat: XLA counts the decode lax.scan body once (~N× undercount)
        extra["xla_cost_analysis_per_call"] = xla
    return rate, extra


def bench_train_step():
    import jax
    import numpy as np

    from rl4co_tpu.decoding import DecodeSpec
    from rl4co_tpu.envs import get_env
    from rl4co_tpu.models import AttentionModelPolicy
    from rl4co_tpu.rl.reinforce import REINFORCE

    env = get_env("tsp", num_loc=NUM_LOC)
    policy = AttentionModelPolicy(env_name="tsp")
    algo = REINFORCE(
        env=env, policy=policy, baseline="rollout",
        train_spec=DecodeSpec(kind="sampling", tanh_clipping=10.0,
                              compute_dtype="bfloat16"),
    )
    # Init (params + rollout-baseline greedy pass) on the CPU backend to
    # avoid dozens of slow remote-tunnel compiles; transfer the state once.
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        state = algo.init(jax.random.PRNGKey(0))
    state = jax.device_put(state, jax.devices()[0])
    # Chained dispatch (one jit call scans TRAIN_CHUNK steps — the
    # production Trainer path): amortizes the tunnel's per-dispatch round
    # trip, and the per-dispatch fetch serializes the tunnel (queued
    # donated executions deadlock it — round-3 postmortem).
    step = algo.make_train_step(TRAIN_BATCH, chunk=TRAIN_CHUNK)
    key = jax.random.PRNGKey(3)
    state, m = step(state, key)  # compile + warmup
    np.asarray(m["loss"])
    t0 = time.perf_counter()
    for i in range(TRAIN_DISPATCHES):
        state, m = step(state, key)
        np.asarray(m["loss"])
    dt = time.perf_counter() - t0
    rate = TRAIN_BATCH * NUM_LOC * TRAIN_CHUNK * TRAIN_DISPATCHES / dt
    extra = {
        "ms_per_step": round(1e3 * dt / (TRAIN_CHUNK * TRAIN_DISPATCHES), 2),
        **_mfu_fields("train", rate),
    }
    # flush the measurement NOW: the cost analysis below needs a fresh
    # non-donated compile of the chunk program, whose latency on the axon
    # tunnel varies 5-10x — it must not be able to time out an
    # already-successful measurement (r5 review finding #2)
    print(json.dumps({"phase": "train", "rate": rate, "extra": extra}),
          flush=True)
    xla = xla_cost_analysis(
        algo.make_train_step(TRAIN_BATCH, chunk=TRAIN_CHUNK, donate=False),
        state, key,
    )
    if xla:
        # caveat: XLA counts the chunk lax.scan body once (~chunk× undercount)
        extra["xla_cost_analysis_per_dispatch"] = xla
    return rate, extra


def _mfu_fields(phase: str, rate: float) -> dict:
    """Achieved TFLOP/s + MFU vs the v5e bf16 peak, from the analytic model
    (VERDICT r4 #2: make the ≥5× target falsifiable with achieved-compute
    accounting; see also runs/ROOFLINE.md)."""
    flops_per_env_step = am_flops_per_env_step(phase)
    tflops = flops_per_env_step * rate / 1e12
    return {
        "flops_per_env_step_analytic": round(flops_per_env_step, 0),
        "tflops_per_s_achieved": round(tflops, 3),
        "mfu_vs_v5e_bf16_peak": round(tflops * 1e12 / V5E_PEAK_BF16_FLOPS, 5),
    }


def _run_phase(name, deadline):
    """Run one phase in a subprocess under a wall-clock budget.

    Returns (rate, note): rate is env-steps/s or None; note explains a None.
    The subprocess shares the persistent compile cache, so even a timed-out
    phase makes progress for the next invocation if its compile finished.
    """
    budget = min(PHASE_BUDGET_S[name], deadline - time.monotonic())
    if budget < 30.0:
        return None, "skipped: no budget left", {}
    stdout = ""
    note = None
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", name],
            capture_output=True, text=True, timeout=budget,
            env=os.environ.copy(),
        )
        stdout = proc.stdout or ""
        if proc.returncode != 0:
            tail = (proc.stderr or "").strip().splitlines()[-1:] or ["no stderr"]
            note = f"error: {tail[0][:200]}"
    except subprocess.TimeoutExpired as e:
        # phases flush their rate line before any post-measurement work, so
        # a timeout can still carry a completed measurement (finding #2)
        raw = e.stdout or b""
        stdout = raw.decode(errors="replace") if isinstance(raw, bytes) else raw
        note = f"skipped: compile budget ({budget:.0f}s)"
    for line in reversed(stdout.strip().splitlines()):
        try:
            obj = json.loads(line)
            if "rate" in obj:
                return float(obj["rate"]), None, obj.get("extra", {})
        except (ValueError, KeyError):
            continue
    return None, note or "error: no rate line in phase output", {}, {}


def main():
    if "--phase" in sys.argv:
        name = sys.argv[sys.argv.index("--phase") + 1]
        rate, extra = {"rollout": bench_rollout, "train": bench_train_step}[name]()
        # the last rate line wins in _run_phase; phase fns flush a bare rate
        # line BEFORE any best-effort cost analysis so a slow post-measure
        # compile can't discard the measurement (r5 review finding #2)
        print(json.dumps({"phase": name, "rate": rate, "extra": extra}), flush=True)
        return

    deadline = time.monotonic() + TOTAL_BUDGET_S
    rollout_rate, rollout_note, rollout_extra = _run_phase("rollout", deadline)
    # Partial line, flushed immediately: if the train phase (or this process)
    # dies, the driver's tail-parse still captures the rollout number.
    partial = {
        "metric": "rollout env-steps/s/chip (TSP-100 AM multistart-greedy)",
        "value": round(rollout_rate, 1) if rollout_rate else None,
        "unit": "env-steps/s",
        "vs_baseline": round(rollout_rate / A100_ESTIMATE_ENV_STEPS_PER_S, 3)
        if rollout_rate else None,
    }
    partial.update(rollout_extra)
    if rollout_note:
        partial["note"] = rollout_note
    print(json.dumps(partial), flush=True)

    train_rate, train_note, train_extra = _run_phase("train", deadline)

    # Second chance for the headline metric: a rollout phase that lost its
    # slot to a cold compile often succeeds on retry — the timed-out
    # subprocess's compile may have finished and populated the persistent
    # cache, and the tunnel is warmer (rounds 2-3: the retry pattern was
    # manual; a warm rerun is <30 s).
    if rollout_rate is None and deadline - time.monotonic() > 60.0:
        rollout_rate, retry_note, rollout_extra = _run_phase("rollout", deadline)
        if rollout_rate is not None:
            rollout_note = None
            partial = {
                "metric": "rollout env-steps/s/chip (TSP-100 AM multistart-greedy)",
                "value": round(rollout_rate, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(rollout_rate / A100_ESTIMATE_ENV_STEPS_PER_S, 3),
                **rollout_extra,
                "note": "second attempt (first hit compile budget)",
            }
            print(json.dumps(partial), flush=True)
        else:
            rollout_note = f"{rollout_note}; retry: {retry_note}"

    out = {
        "metric": "train env-steps/s/chip (TSP-100 AM REINFORCE+rollout-bl, bf16)",
        "value": round(train_rate, 1) if train_rate else None,
        "unit": "env-steps/s",
        "vs_baseline": round(train_rate / A100_ESTIMATE_ENV_STEPS_PER_S, 3)
        if train_rate else None,
        "baseline_kind": "estimate (A100 reference unmeasured; BASELINE.md)",
        "rollout_env_steps_per_s": round(rollout_rate, 1) if rollout_rate else None,
        "rollout_vs_baseline_estimate": round(
            rollout_rate / A100_ESTIMATE_ENV_STEPS_PER_S, 3
        ) if rollout_rate else None,
        **{f"train_{k}" if not k.startswith("xla") else k: v
           for k, v in train_extra.items()},
        **({"rollout_mfu_vs_v5e_bf16_peak":
            rollout_extra["mfu_vs_v5e_bf16_peak"]}
           if "mfu_vs_v5e_bf16_peak" in rollout_extra else {}),
    }
    if "mfu_vs_v5e_bf16_peak" in train_extra:
        out["mfu"] = train_extra["mfu_vs_v5e_bf16_peak"]
    out["train_batch"] = TRAIN_BATCH  # the reference-recipe point (512)
    # Attach the measured batch-scaling rows when available (the batch-512
    # step is latency-bound, runs/ROOFLINE.md; larger batches measure chip
    # throughput headroom on the SAME program — runs/train_batch_scaling.py)
    scaling_path = os.path.join(_REPO, "runs", "train_batch_scaling.json")
    try:
        with open(scaling_path) as f:
            scaling = json.load(f)
        out["train_batch_scaling"] = [
            {k: r[k] for k in
             ("train_batch", "env_steps_per_s", "vs_baseline_estimate",
              "mfu_vs_v5e_bf16_peak") if k in r}
            for r in scaling.get("rows", [])
        ]
    except (OSError, ValueError):
        pass
    if train_note:
        out["train_note"] = train_note
    if rollout_note:
        out["rollout_note"] = rollout_note
    if train_rate is None and rollout_rate is not None:
        # Never emit value=null as the headline when we do have a number:
        # fall back to the rollout metric as the tail line.
        out = dict(partial)
        out["train_note"] = train_note
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
