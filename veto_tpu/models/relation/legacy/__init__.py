"""Legacy relation-predictor zoo (Scene-Graph-Benchmark / PySGG lineage).

Each predictor plugs into the same relation-head interface as VETO
(SURVEY.md §2.5 "legacy predictor zoo"), consuming per-proposal 4096-d box
features + per-pair union features instead of the VETO mini 8x8 maps.
"""

from .context import PairwiseFeatureExtractor, SHAContext, TransformerContext
from .predictors import (
    IMPPredictor,
    LegacyOutput,
    MeetRelHeads,
    MotifPredictor,
    TransformerPredictor,
    TransLikePredictor,
)
from .agcn import AGRCNNPredictor
from .bgnn import BGNNPredictor, GPSNetPredictor, MSDNPredictor
from .causal import CausalPredictor
from .kern import KERNPredictor
from .naive import NaivePredictor, RelatednessTestPredictor
from .vctree import VCTreePredictor
