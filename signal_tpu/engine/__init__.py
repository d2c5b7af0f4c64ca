from signal_tpu.engine.train import do_train, make_train_step, TrainState  # noqa: F401
from signal_tpu.engine.eval import do_inference, extract_features  # noqa: F401
