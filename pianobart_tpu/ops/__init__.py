from .attention import dot_product_attention
from .flash import flash_attention
from .fused_ln import dropout_add_ln
from .noise import corrupt, corrupt_batch
from .ring import (psum_out, replicated_in, ring_attention,
                   ring_attention_sharded, tp_slice)
from .sampling import (DEFAULT_TEMPERATURE, DEFAULT_TOP_P, greedy_octuple,
                       nucleus_sample, sample_octuple)
