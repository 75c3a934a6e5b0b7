from rl4co_tpu.models.policies import (  # noqa: F401
    ConstructivePolicy,
    PrecomputedCache,
    RolloutOutput,
    rollout,
)
from rl4co_tpu.models.zoo import AttentionModelPolicy  # noqa: F401
