from .controller import Controller  # noqa: F401
from .worker import ModelWorker  # noqa: F401
