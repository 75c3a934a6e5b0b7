from rl4co_tpu.envs.routing.tsp import TSP, TSPState  # noqa: F401
from rl4co_tpu.envs.routing.cvrp import CVRP, CVRPState  # noqa: F401
