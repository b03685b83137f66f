from . import bert, params

__all__ = ["bert", "params"]
