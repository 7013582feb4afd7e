from . import eval, test, train  # noqa: F401

__all__ = ["train", "eval", "test"]
