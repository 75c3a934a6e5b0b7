from rl4co_tpu.models.policies.constructive import (  # noqa: F401
    ConstructivePolicy,
    PrecomputedCache,
    RolloutOutput,
    rollout,
)
