from hydragnn_tpu.ops.segment import (
    segment_sum,
    segment_mean,
    segment_max,
    segment_min,
    segment_std,
    segment_softmax,
    masked_segment_mean,
    gather_scatter_sum,
    gather_scatter_mean,
    degree,
)
