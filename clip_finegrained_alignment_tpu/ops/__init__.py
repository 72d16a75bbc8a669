from .attention import flash_attention
from .sparc_kernel import fused_sparc_pooling

__all__ = ["flash_attention", "fused_sparc_pooling"]
