from .flash_attention import flash_attention, mha_reference
from .moe import MoEConfig, MoEFeedForward, moe_reference
from .ring_attention import ring_attention, ring_attention_local
