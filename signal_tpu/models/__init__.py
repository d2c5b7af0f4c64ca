from signal_tpu.models.signal_model import SignalModel, make_frame  # noqa: F401
