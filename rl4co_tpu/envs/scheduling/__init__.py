from rl4co_tpu.envs.scheduling.smtwtp import SMTWTP, SMTWTPState  # noqa: F401
from rl4co_tpu.envs.scheduling.ffsp import FFSP, FFSPState  # noqa: F401
