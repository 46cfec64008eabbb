from .attention_step import fused_attention_step, attention_step_reference

__all__ = ["fused_attention_step", "attention_step_reference"]
