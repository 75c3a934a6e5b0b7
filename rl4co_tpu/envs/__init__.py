"""Environment registry (reference `rl4co/envs/__init__.py:36-82`)."""

from rl4co_tpu.envs.base import Env, Instance  # noqa: F401
from rl4co_tpu.envs.routing.tsp import TSP
from rl4co_tpu.envs.routing.cvrp import CVRP
from rl4co_tpu.envs.routing.op import OP
from rl4co_tpu.envs.routing.pctsp import PCTSP, SPCTSP
from rl4co_tpu.envs.routing.atsp import ATSP
from rl4co_tpu.envs.routing.sdvrp import SDVRP
from rl4co_tpu.envs.routing.mtsp import MTSP, SHPP
from rl4co_tpu.envs.routing.pdp import PDP
from rl4co_tpu.envs.routing.cvrptw import CVRPTW
from rl4co_tpu.envs.routing.mtvrp import MTVRP
from rl4co_tpu.envs.routing.svrp import SVRP
from rl4co_tpu.envs.routing.cvrpmvc import CVRPMVC
from rl4co_tpu.envs.routing.mdcpdp import MDCPDP
from rl4co_tpu.envs.routing.mpdp import MPDP
from rl4co_tpu.envs.routing.tsp import DenseRewardTSP
from rl4co_tpu.envs.graph.flp import FLP
from rl4co_tpu.envs.graph.mcp import MCP
from rl4co_tpu.envs.scheduling.smtwtp import SMTWTP
from rl4co_tpu.envs.scheduling.ffsp import FFSP
from rl4co_tpu.envs.scheduling.fjsp import FJSP, JSSP
from rl4co_tpu.envs.eda.dpp import DPP, MDPP

ENV_REGISTRY = {
    "pdp": PDP,
    "cvrptw": CVRPTW,
    "mtvrp": MTVRP,
    "svrp": SVRP,
    "cvrpmvc": CVRPMVC,
    "mdcpdp": MDCPDP,
    "mpdp": MPDP,
    "flp": FLP,
    "mcp": MCP,
    "smtwtp": SMTWTP,
    "ffsp": FFSP,
    "fjsp": FJSP,
    "jssp": JSSP,
    "dpp": DPP,
    "mdpp": MDPP,
    "tsp": TSP,
    "cvrp": CVRP,
    "op": OP,
    "pctsp": PCTSP,
    "spctsp": SPCTSP,
    "atsp": ATSP,
    "sdvrp": SDVRP,
    "mtsp": MTSP,
    "shpp": SHPP,
}


def register_env(name: str, cls) -> None:
    ENV_REGISTRY[name] = cls


def get_env(name: str, **kwargs) -> Env:
    """Instantiate an env by registry name (reference `envs/__init__.py:67-82`)."""
    cls = ENV_REGISTRY.get(name)
    if cls is None:
        raise ValueError(
            f"Unknown environment '{name}'. Available: {sorted(ENV_REGISTRY)}"
        )
    return cls(**kwargs)
