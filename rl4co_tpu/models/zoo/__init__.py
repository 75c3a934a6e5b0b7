from rl4co_tpu.models.zoo.am import AttentionModelPolicy  # noqa: F401
