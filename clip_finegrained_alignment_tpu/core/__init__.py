from .precision import compute_dtype, param_dtype, resolve_dtype

__all__ = ["compute_dtype", "param_dtype", "resolve_dtype"]
