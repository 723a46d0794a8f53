from .flash_attention import flash_attention, mha_reference
