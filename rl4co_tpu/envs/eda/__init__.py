from rl4co_tpu.envs.eda.dpp import DPP, MDPP, DPPState  # noqa: F401
