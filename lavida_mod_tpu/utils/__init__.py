from .checkpoint import (  # noqa: F401
    latest_checkpoint,
    restore_checkpoint,
    save_adapter_only,
    save_checkpoint,
    wait_for_saves,
)
from .logging import MetricsLogger, rank0_print  # noqa: F401
