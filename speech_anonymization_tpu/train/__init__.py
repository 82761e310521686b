from .schedulers import NoamScheduler, ReduceLROnPlateau
from .epoch_loop import EpochCounter
from .logger import FileTrainLogger
from .checkpoint import Checkpointer, average_checkpoints
from .experiment import create_experiment_directory
from .brain import Brain, Stage

__all__ = [
    "NoamScheduler",
    "ReduceLROnPlateau",
    "EpochCounter",
    "FileTrainLogger",
    "Checkpointer",
    "average_checkpoints",
    "create_experiment_directory",
    "Brain",
    "Stage",
]
