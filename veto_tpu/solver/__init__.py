from .optim import make_optimizer, LRController  # noqa: F401
