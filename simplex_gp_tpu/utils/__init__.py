from .data import DATASET_GROUPS, UCI_SHAPES, Dataset, load_snelson, load_uci, prepare_dataset  # noqa: F401
from .training import EarlyStopper, fit_adam  # noqa: F401
