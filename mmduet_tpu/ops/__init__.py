from .attention import flash_decode_attention, attention_available
