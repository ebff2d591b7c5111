from .callbacks import (
    Callback,
    EarlyStopping,
    ExamplesPerSecondCallback,
    ProfilerCallback,
    WandbLogger,
)
from .io import load_model, save_model
from .misc import Timing
