from rl4co_tpu.envs.scheduling.smtwtp import SMTWTP, SMTWTPState  # noqa: F401
