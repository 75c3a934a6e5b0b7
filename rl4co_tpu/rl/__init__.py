from rl4co_tpu.rl.baselines import get_reinforce_baseline, REINFORCE_BASELINES  # noqa: F401
from rl4co_tpu.rl.reinforce import REINFORCE  # noqa: F401
from rl4co_tpu.rl.critic import CriticNetwork  # noqa: F401
