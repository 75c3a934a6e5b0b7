from rl4co_tpu.tasks.eval import evaluate_policy, EVAL_METHODS  # noqa: F401
