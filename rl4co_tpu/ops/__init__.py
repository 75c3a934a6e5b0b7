from rl4co_tpu.ops.pointer_kernel import fused_pointer_logits  # noqa: F401
