from gatv2_tpu.ops.segment import segment_softmax, segment_sum, segment_max

__all__ = ["segment_softmax", "segment_sum", "segment_max"]
