from signal_tpu.parallel.mesh import (  # noqa: F401
    create_mesh,
    batch_sharding,
    param_shardings,
    replicated,
)
from signal_tpu.parallel.pipeline import pipeline_blocks  # noqa: F401
