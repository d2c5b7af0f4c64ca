from signal_tpu.data.datasets import build_dataset  # noqa: F401
from signal_tpu.data.loader import make_dataloader  # noqa: F401
