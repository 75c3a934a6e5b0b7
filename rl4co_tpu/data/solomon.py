"""Solomon CVRPTW benchmark instance loader
(reference `rl4co/data/utils.py:39-70` via vrplib).

Parses the classic Solomon text format (VEHICLE / CUSTOMER sections) into
this framework's CVRPTW instance dict. ``normalize=True`` scales demands by
vehicle capacity (framework convention).
"""

from __future__ import annotations

import numpy as np


def load_solomon_instance(path: str, normalize_demand: bool = True) -> dict:
    with open(path) as f:
        lines = [ln.rstrip() for ln in f]

    capacity = None
    rows = []
    section = None
    for ln in lines:
        token = ln.strip().upper()
        if token.startswith("VEHICLE"):
            section = "vehicle"
            continue
        if token.startswith("CUSTOMER"):
            section = "customer"
            continue
        parts = ln.split()
        if section == "vehicle" and len(parts) == 2 and parts[0].isdigit():
            capacity = float(parts[1])
        elif section == "customer" and len(parts) == 7 and parts[0].isdigit():
            rows.append([float(x) for x in parts])

    assert capacity is not None and rows, f"Malformed Solomon file: {path}"
    arr = np.asarray(rows)  # cols: id, x, y, demand, ready, due, service
    depot = arr[0]
    cust = arr[1:]
    demand = cust[:, 3]
    if normalize_demand:
        demand = demand / capacity
    time_windows = np.stack(
        [np.concatenate([[depot[4]], cust[:, 4]]),
         np.concatenate([[depot[5]], cust[:, 5]])],
        axis=-1,
    )
    durations = np.concatenate([[depot[6]], cust[:, 6]])
    return {
        "locs": cust[:, 1:3].astype(np.float32),
        "depot": depot[1:3].astype(np.float32),
        "demand": demand.astype(np.float32),
        "time_windows": time_windows.astype(np.float32),
        "durations": durations.astype(np.float32),
        "capacity": np.float32(capacity),
    }


def solomon_to_env_batch(instance: dict, scale: bool = True):
    """Solomon instance dict -> (CVRPTW env, batched instance pytree of 1).

    Coordinates and times are scaled by the instance horizon (depot due
    date) to match the env's normalized convention (`cvrptw.py::generate`
    with ``scale=True``); demands are already capacity-normalized by the
    loader.
    """
    import jax.numpy as jnp

    from rl4co_tpu.envs.routing.cvrptw import CVRPTW

    horizon = float(instance["time_windows"][0, 1])
    n = instance["locs"].shape[0]
    env = CVRPTW(num_loc=n, vehicle_capacity=1.0, max_time=horizon,
                 scale=scale)
    s = horizon if scale else 1.0
    batch = {
        "locs": jnp.asarray(instance["locs"])[None] / s,
        "depot": jnp.asarray(instance["depot"])[None] / s,
        "demand": jnp.asarray(instance["demand"])[None],
        "durations": jnp.asarray(instance["durations"])[None] / s,
        "time_windows": jnp.asarray(instance["time_windows"])[None] / s,
    }
    return env, batch
