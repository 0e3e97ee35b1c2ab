from .veto_transformer import VetoTransformer  # noqa: F401
from .predictor_veto import VetoPredictor  # noqa: F401
from . import sampling  # noqa: F401
