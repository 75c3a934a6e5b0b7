from rl4co_tpu.models.policies import (  # noqa: F401
    ConstructivePolicy,
    PrecomputedCache,
    RolloutOutput,
    rollout,
)
# NOTE: import the AM policy directly (not via models.zoo) — the zoo package
# imports RL algorithms, which import this package (circular otherwise).
from rl4co_tpu.models.zoo.am import AttentionModelPolicy  # noqa: F401


def __getattr__(name):
    # Lazy re-export of the full zoo at `rl4co_tpu.models.<Name>` (mirrors
    # reference `rl4co/models/__init__.py:23-42`); lazy to avoid the
    # zoo -> rl -> models import cycle.
    from rl4co_tpu.models import zoo

    if name in zoo.__all__:
        return getattr(zoo, name)
    raise AttributeError(f"module 'rl4co_tpu.models' has no attribute {name!r}")
