from rl4co_tpu.models.policies import (  # noqa: F401
    ConstructivePolicy,
    PrecomputedCache,
    RolloutOutput,
    rollout,
)
# NOTE: import the AM policy directly (not via models.zoo) — the zoo package
# imports RL algorithms, which import this package (circular otherwise).
from rl4co_tpu.models.zoo.am import AttentionModelPolicy  # noqa: F401
