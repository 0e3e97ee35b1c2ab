from .batching import make_sgg_batch, pad_to_budget  # noqa: F401
from .synthetic import SyntheticSGGDataset  # noqa: F401
