from rl4co_tpu.models.nn.graph.attnnet import (  # noqa: F401
    GraphAttentionNetwork,
    MultiHeadAttentionLayer,
)
