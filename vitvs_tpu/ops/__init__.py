from vitvs_tpu.ops.attention import mha_attention
from vitvs_tpu.ops.matcher import dual_argmax_cosine

__all__ = ["mha_attention", "dual_argmax_cosine"]
