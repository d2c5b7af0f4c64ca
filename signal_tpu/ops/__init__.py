from signal_tpu.ops.attention import layer_norm, mha, quick_gelu  # noqa: F401
from signal_tpu.ops.volume import gram_volume3  # noqa: F401
from signal_tpu.ops.grid_sample import bilinear_grid_sample  # noqa: F401
from signal_tpu.ops.topk_mask import topk_mask, scatter_mask  # noqa: F401
from signal_tpu.ops.distmat import euclidean_distmat, euclidean_sqdist  # noqa: F401
