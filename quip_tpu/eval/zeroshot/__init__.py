from quip_tpu.eval.zeroshot.registry import TASK_REGISTRY, get_task_dict  # noqa: F401
from quip_tpu.eval.zeroshot.evaluator import evaluate, simple_evaluate, make_table  # noqa: F401
