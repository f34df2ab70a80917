"""Native (C++) host kernels, built on demand with graceful numpy fallback."""
from .build import load_symptr_lib

__all__ = ["load_symptr_lib"]
