from .attention import dot_product_attention
from .flash import flash_attention
from .noise import corrupt, corrupt_batch
from .ring import ring_attention, ring_attention_sharded
from .sampling import (DEFAULT_TEMPERATURE, DEFAULT_TOP_P, greedy_octuple,
                       nucleus_sample, sample_octuple)
