from .evaluator import evaluate, simple_evaluate  # noqa: F401
from .tasks import get_task, list_tasks  # noqa: F401
