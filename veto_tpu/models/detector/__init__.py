"""Detection stack: anchors, RPN, box head — the Faster R-CNN cascade.

TPU re-design of pysgg/modeling/rpn/ + roi_heads/box_head/: every stage is
a fixed-budget masked tensor program (anchors → 6000 topk → 1000/level NMS
→ 1000/image → 80 detections) so the whole cascade jit-compiles once.
"""

from .anchors import generate_cell_anchors, grid_anchors
from .box_head import BoxFeatureExtractor, BoxPredictor, box_postprocess
from .rpn import RPNHead, rpn_select_proposals
