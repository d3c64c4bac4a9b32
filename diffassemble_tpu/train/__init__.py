"""Training runtime: state, steps, metrics, checkpointing, trainer loop."""

from .train_state import TrainState, create_train_state, make_train_step  # noqa: F401
from .metrics import MeanMetrics, update_fragment_metrics, update_puzzle_metrics  # noqa: F401
from .checkpoint import CheckpointManager  # noqa: F401
from .trainer import JsonlLogger, Trainer, batch_iterator  # noqa: F401
from .schedules_lr import cosine_annealing_warmup_restarts  # noqa: F401
