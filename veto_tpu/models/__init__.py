from . import backbone, relation  # noqa: F401
