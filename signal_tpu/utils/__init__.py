from signal_tpu.utils.meter import AverageMeter  # noqa: F401
from signal_tpu.utils.logger import setup_logger  # noqa: F401
