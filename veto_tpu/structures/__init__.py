from .boxes import BoxArray, pad_boxes
from .image_batch import ImageBatch

__all__ = ["BoxArray", "pad_boxes", "ImageBatch"]
