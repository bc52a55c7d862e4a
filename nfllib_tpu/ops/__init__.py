from . import modops, ntt

__all__ = ["modops", "ntt"]
