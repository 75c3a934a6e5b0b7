from rl4co_tpu.envs.scheduling.smtwtp import SMTWTP, SMTWTPState  # noqa: F401
from rl4co_tpu.envs.scheduling.ffsp import FFSP, FFSPState  # noqa: F401
from rl4co_tpu.envs.scheduling.fjsp import FJSP, JSSP, FJSPState  # noqa: F401
